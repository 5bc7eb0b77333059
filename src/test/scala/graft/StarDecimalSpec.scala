package graft

import org.apache.spark.sql.functions._

/** The decimal(38,6) money path (q1_pricing_summary_decimal) exists for
  * sums that pass 2^63 per group — prove the mechanism does what the
  * Long path can't: an exact sum beyond Long.MaxValue.
  */
class StarDecimalSpec extends SparkSpecBase {

  test("decimal(38,0) sum is exact past 2^63 where the Long sum wraps") {
    import spark.implicits._
    // 3 × 2^62 = 1.5 × 2^63 — overflows Long, exact in decimal(38,0)
    val units = Seq.fill(3)(1L << 62).toDF("u")
    val dec = units
      .agg(sum(col("u").cast("decimal(38,0)")).as("s"))
      .select(col("s").cast("string"))
      .collect()(0)
      .getString(0)
    assert(dec == BigInt("13835058055282163712").toString)
    // the exact point-shift used by the query: ×0.000001 then (38,6)
    val shifted = units
      .agg(sum(col("u").cast("decimal(38,0)")).as("s"))
      .select(
        (col("s") * lit(new java.math.BigDecimal("0.000001")))
          .cast("decimal(38,6)")
          .cast("string")
      )
      .collect()(0)
      .getString(0)
    assert(shifted == "13835058055282.163712")
  }
}
