package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.CatalystBridge.{toColumn, toExpression}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType, IntegerType}

/** Hashing with bit-parity to the reference's sharding hash.
  *
  * The reference shards string keys with cespare/xxhash `Sum64`, i.e.
  * standard XXH64 with seed 0 over the raw UTF-8 bytes
  * (`/root/reference/task/sharding.go:108-115`). Spark's `xxhash64(...)`
  * function hard-codes seed 42, but the underlying Catalyst expression is
  * seed-parameterized and hashes String/Binary children as raw bytes with
  * standard XXH64 — so seed 0 over a single string column is exactly Go
  * parity, with whole-stage codegen for free.
  */
object GoHash {

  /** XXH64(seed=0) of the UTF-8 bytes of `c` (cast to string). */
  def goXxHash64(c: Column): Column =
    toColumn(XxHash64(Seq(toExpression(c.cast("string"))), 0L))

  private val TwoPow64 = BigDecimal(BigInt(1) << 64)

  /** Reinterpret a signed long column as unsigned, as Decimal(38,0) —
    * matches Go's `uint64(x)` wrap semantics. Kept for non-hot-path uses;
    * the sharding hot path uses the codegen'd long ops below instead.
    */
  def asUnsigned(c: Column): Column = {
    val d = c.cast(DecimalType(38, 0))
    when(c < 0, d + lit(TwoPow64.bigDecimal).cast(DecimalType(38, 0))).otherwise(d)
  }

  /** `(uint64(x) / div) % n` as pure long arithmetic
    * (java.lang.Long.divideUnsigned/remainderUnsigned) — the shuffle-key
    * math of the stripe/hash shard policies, codegen'd so the hot path
    * never touches Decimal (sharding.go:26-115 semantics).
    */
  case class UnsignedDivMod(child: Expression, div: Long, n: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "unsigned_div_mod"
    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[Long]
      java.lang.Long.remainderUnsigned(
        java.lang.Long.divideUnsigned(x, div), n.toLong).toInt
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"(int) java.lang.Long.remainderUnsigned(" +
          s"java.lang.Long.divideUnsigned($c, ${div}L), ${n}L)")
    override protected def withNewChildInternal(newChild: Expression): UnsignedDivMod =
      copy(child = newChild)
  }

  /** Go `uint64(hash) % n` on a signed-long hash column. */
  def unsignedMod(c: Column, n: Int): Column =
    toColumn(UnsignedDivMod(toExpression(c.cast("long")), 1L, n))

  /** Go `(uint64(x) / stripe) % n`. */
  def unsignedStripeMod(c: Column, stripe: Long, n: Int): Column =
    toColumn(UnsignedDivMod(toExpression(c.cast("long")), stripe, n))
}
