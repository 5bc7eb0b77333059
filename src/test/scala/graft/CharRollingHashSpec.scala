package graft

import org.apache.spark.sql.functions._

import graft.functions.{CharRollingHash, TextFeatures}

/** The native codegen expression must agree byte-for-byte with the
  * higher-order-builtin formulation it replaces (ASCII corpus contract).
  */
class CharRollingHashSpec extends SparkSpecBase {

  test("native expression equals the higher-order builtin hash") {
    CharRollingHash.register(spark)
    val diff = spark.read
      .parquet(s"$Sf0001/documents.parquet")
      .select(
        expr("char_rolling_hash(text)").as("native"),
        expr(TextFeatures.charHashSpark("text")).as("builtin")
      )
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(diff == 0)
  }

  test("null-safe and empty-string behavior") {
    CharRollingHash.register(spark)
    val session = spark
    import session.implicits._
    val out = Seq("", "a", null).toDF("s")
      .select(expr("char_rolling_hash(s)").as("h"))
      .collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).contains(0L))
    assert(out(1).contains(97L))
    assert(out(2).isEmpty)
  }
}
