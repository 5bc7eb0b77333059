package graft

import org.apache.spark.sql.functions._

import graft.functions.{SketchExpressions, TextFeatures}

/** The native fused-loop sketch expressions must agree bit-for-bit with
  * the higher-order-builtin formulations (which the DuckDB oracle mirrors).
  */
class SketchExpressionsSpec extends SparkSpecBase {

  private def shingleHashes = {
    SketchExpressions.register(spark)
    spark.read
      .parquet(s"$Sf0001/documents.parquet")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("sh", expr(s"array_distinct(${TextFeatures.shinglesSpark("ws")})"))
      .withColumn("hs", expr("transform(sh, t -> char_rolling_hash(t))"))
  }

  test("minhash_sig equals the builtin transform/array_min formulation") {
    val diff = shingleHashes
      .select(
        expr("minhash_sig(hs)").as("native"),
        expr(TextFeatures.minhashSigSpark("hs")).as("builtin")
      )
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(diff == 0)
  }

  test("simhash32 equals the builtin nested-aggregate formulation") {
    val diff = shingleHashes
      .select(
        expr("simhash32(hs)").as("native"),
        expr(TextFeatures.simhashSpark("hs")).as("builtin")
      )
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(diff == 0)
  }
}
