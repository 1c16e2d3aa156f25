package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.ChGetters
import graft.functions.ChGetters.ParseOpts

/** Reference-parity query surface (SURVEY §2), phrased over the driver's
  * parquet tables. Each entry has a DuckDB oracle in [[ParityQueries.oracle]]
  * with identical column names and ORDER BY, so the driver's hash compare
  * is deterministic. Float aggregates go through exact decimal sums and are
  * rounded on output; plain doubles are only passed through, never
  * re-associated.
  */
object ParityQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- flagship: TPC-H Q1-style pricing summary (agg + decimal sums) ---
    "q1_agg" -> { (s, dir) =>
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec(col("l_discount"))))
            .cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // --- the ingest hot path: JSON -> variant -> tolerant typed projection
    // (P2 + F2/F4/F6/F7/F8 + clamp semantics), exercised by synthesizing a
    // JSON message per event row and projecting it back out.
    "q_parse_typed" -> { (s, dir) =>
      val t = Tables(s, dir)
      val opts = ParseOpts(timeZone = "UTC", timeUnit = 1.0)
      val raw = t.events.select(
        col("event_id"),
        to_json(struct(
          col("event_id").as("id"),
          col("user_id").as("uid"),
          col("event_type").as("etype"),
          col("value").as("v"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))).as("raw"))
      val msg = ChGetters.parsed(col("raw"))
      def f(n: String) = ChGetters.field(msg, n)
      raw.select(
        col("event_id"),
        ChGetters.getSigned(f("id"), nullable = false, LongType).as("id_i64"),
        ChGetters.getUint8(f("uid"), nullable = false).cast(IntegerType).as("uid_u8"),
        ChGetters.getString(f("etype"), nullable = false).as("etype_str"),
        ChGetters.getFloat(f("v"), nullable = false, DoubleType).as("v_f64"),
        ChGetters.getDateTime(f("ts_str"), nullable = false, opts).as("ts_parsed"),
        ChGetters.getSigned(f("v"), nullable = false, LongType).as("v_as_int"),
        ChGetters.getBool(f("etype"), nullable = false).as("etype_as_bool"))
        .orderBy(col("event_id"))
    }
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // the oracle recomputes the tolerant-getter results straight from the
    // base columns: int64 passthrough, uint8 clamp, float passthrough,
    // second-precision timestamp, float-for-int rejected -> 0, string-for-
    // bool rejected -> false
    "q_parse_typed" ->
      """SELECT event_id,
        |  event_id AS id_i64,
        |  CAST(CASE WHEN user_id < 0 THEN 0 ELSE LEAST(user_id, 255) END AS INT) AS uid_u8,
        |  event_type AS etype_str,
        |  value AS v_f64,
        |  date_trunc('second', ts) AS ts_parsed,
        |  -- doubles always serialize with a fraction dot; fastjson Int64()
        |  -- and the variant integral guard both reject float syntax
        |  CAST(0 AS BIGINT) AS v_as_int,
        |  false AS etype_as_bool
        |FROM events ORDER BY event_id""".stripMargin
  )
}
