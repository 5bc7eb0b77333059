package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFeatures
import graft.multimodal.Media

/** Multimodal plumbing: the mapPartitions feature path must agree with
  * the pure-SQL expression path (cross-validates the imperative batch
  * loop against the codegen'd charHash), and metadata-only transforms
  * never touch payloads.
  */
class MediaSpec extends SparkSpecBase {

  test("mapPartitions checksum equals the SQL rolling hash (ASCII corpus)") {
    val fromBlobs = Media
      .extractFeatures(Media.blobs(spark, Sf0001))
      .toDF()
      .select(col("media_id"), col("checksum"))
    val fromSql = spark.read
      .parquet(s"$Sf0001/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        expr(TextFeatures.charHashSpark("text")).as("sql_checksum")
      )
    val diff = fromBlobs
      .join(fromSql, "media_id")
      .filter(col("checksum") =!= col("sql_checksum"))
      .count()
    assert(diff == 0)
  }

  test("stub decoder produces one sample per payload byte") {
    val rows = Media
      .extractFeatures(Media.blobs(spark, Sf0001))
      .toDF()
      .filter(col("feature_dim") =!= col("n_bytes"))
      .count()
    assert(rows == 0)
  }

  test("frame-sample plan is metadata-only and video-only") {
    val plan = Media.frameSamplePlan(Media.blobs(spark, Sf0001))
    val n = plan.count()
    val nVideo = Media
      .blobs(spark, Sf0001)
      .toDF()
      .filter(col("modality") === "video")
      .count()
    assert(n == nVideo)
    assert(plan.agg(min(size(col("frame_indices")))).collect()(0).getInt(0) >= 1)
  }
}
