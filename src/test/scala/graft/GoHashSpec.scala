package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GoHash

/** XXH64(seed=0) parity — the reference's shard hash is cespare/xxhash
  * Sum64 == standard XXH64 seed 0 (`/root/reference/task/sharding.go:108`).
  */
class GoHashSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(2)
  import spark.implicits._

  test("known XXH64 vectors, seed 0") {
    val r = Seq(("", "a")).toDF("e", "a")
      .select(GoHash.goXxHash64($"e").as("he"), GoHash.goXxHash64($"a").as("ha"))
      .head()
    // canonical XXH64 test vector: empty input, seed 0
    assert(java.lang.Long.toHexString(r.getLong(0)) === "ef46db3751d8e999")
    // one-byte input 'a': standard xxh64 value
    assert(java.lang.Long.toHexString(r.getLong(1)) === "d24ec4f1a98c6e5b")
  }

  test("unsigned reinterpretation") {
    val r = Seq((-1L, 5L)).toDF("neg", "pos")
      .select(
        GoHash.asUnsigned($"neg").as("u"),
        GoHash.unsignedMod($"neg", 7).as("m"),
        GoHash.unsignedMod($"pos", 7).as("p"))
      .head()
    assert(r.getDecimal(0).toBigInteger.toString === "18446744073709551615")
    // 2^64-1 mod 7 = 1
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 5)
  }
}
