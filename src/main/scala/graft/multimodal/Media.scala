package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition.
  *
  * The real decode step (JPEG→pixels, PCM→samples, container→frames)
  * needs native codec libraries that are NOT in this container, so
  * [[Media.StubDecoder]] is a clearly-marked deterministic fake. What IS
  * real and tested: the schema (binary + metadata struct), the
  * `Dataset[MediaBlob]` encoders, the partition-batched processing shape
  * (`mapPartitions` — the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup, no per-row JVM↔native churn),
  * and the downstream feature computations (byte histograms, checksums,
  * frame sampling), which operate on the raw bytes and are
  * oracle-checkable.
  *
  * Scale: blobs stay opaque end-to-end (no driver collect); decode
  * parallelism = partition count; metadata-only transforms (resize specs,
  * frame-sample plans) are narrow projections that never touch the bytes.
  */
object Media {

  final case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  final case class MediaBlob(
      media_id: Long,
      modality: String,
      content: Array[Byte],
      meta: MediaMeta
  )
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      checksum: Long,
      feature_dim: Int,
      top_bin: Int
  )

  /** Pluggable decoder boundary. `decode` turns the opaque payload into a
    * raw sample array; real implementations would call image/audio codecs.
    */
  trait Decoder extends Serializable {
    def decode(content: Array[Byte], meta: MediaMeta): Array[Double]
  }

  /** STUB — deterministic fake standing in for the native codec, which is
    * unavailable in this container. It maps each payload byte to [0, 1),
    * which keeps the full pipeline (batching, feature extraction,
    * checksums) executable and reproducible.
    */
  object StubDecoder extends Decoder {
    def decode(content: Array[Byte], meta: MediaMeta): Array[Double] =
      content.map(b => (b & 0xff) / 256.0)
  }

  /** Deterministic media corpus synthesized from `documents`: the text
    * bytes become the opaque payload; modality and metadata derive from
    * doc_id. (Real deployments read the binary column straight from
    * parquet — this stands in for that scan.)
    */
  def blobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val modality = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val meta = modality match {
          case "image" => MediaMeta("image/fake", 64 + (id % 64).toInt, 64, 0L)
          case "audio" => MediaMeta("audio/fake", 0, 0, 1000L + (id % 9000))
          case _       => MediaMeta("video/fake", 128, 72, 2000L + (id % 8000))
        }
        MediaBlob(id, modality, text.getBytes("UTF-8"), meta)
      }
  }

  /** Partition-batched feature extraction (the mapInPandas shape): per
    * partition, one decoder instance processes the blob iterator. The
    * 16-bin byte histogram and rolling checksum are REAL computations on
    * the payload; `decoder.decode` is where a native codec would run.
    */
  def extractFeatures(
      blobs: Dataset[MediaBlob],
      decoder: Decoder = StubDecoder
  ): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val samples = decoder.decode(b.content, b.meta)
        val bins = new Array[Int](16)
        b.content.foreach(byte => bins((byte & 0xff) / 16) += 1)
        var checksum = 0L
        b.content.foreach(byte => checksum = (checksum * 31 + (byte & 0xff)) % 1000000007L)
        val top = bins.indexOf(bins.max)
        MediaFeatures(b.media_id, b.modality, b.content.length, checksum, samples.length, top)
      }
    }
  }

  final case class PooledMedia(
      media_id: Long,
      modality: String,
      n_samples: Int,
      n_pooled: Int,
      mean_pooled: Double,
      max_pooled: Double
  )

  /** Resize/downsample: 4× box-filter pooling over the decoded sample
    * stream (the audio-downsample / image-thumbnail shape). Pooling runs
    * on integer window sums (exact, order-free) and divides once at the
    * end — the doubles are bit-identical in the DuckDB oracle. Same
    * `mapPartitions` batching as [[extractFeatures]]; a real codec slots
    * into the same decoder boundary.
    */
  def resizePool(blobs: Dataset[MediaBlob], factor: Int = 4): Dataset[PooledMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      it.map { b =>
        val windowSums = b.content
          .grouped(factor)
          .map(_.map(x => (x & 0xff).toLong).sum)
          .toArray
        val total = windowSums.sum
        val scale = factor * 256.0
        PooledMedia(
          b.media_id,
          b.modality,
          b.content.length,
          windowSums.length,
          // half-up at 6 digits (values are positive), matching DuckDB's
          // round(x, 6) — math.rint would tie-to-even and diverge
          math.floor(total.toDouble / scale / windowSums.length * 1e6 + 0.5) / 1e6,
          math.floor(windowSums.max.toDouble / scale * 1e6 + 0.5) / 1e6
        )
      }
    }
  }

  /** Frame-sampling plan for video blobs: every `stride`-th frame index up
    * to the (metadata-declared) frame count — a metadata-only transform
    * that never deserializes the payload.
    */
  def frameSamplePlan(blobs: Dataset[MediaBlob], stride: Int = 10): DataFrame = {
    val df = blobs.toDF()
    df.filter(col("modality") === "video")
      .select(
        col("media_id"),
        expr(s"sequence(0, CAST(meta.durationMs / (1000 / 24) AS INT), $stride)")
          .as("frame_indices")
      )
  }
}
