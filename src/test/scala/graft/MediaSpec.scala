package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFeatures
import graft.multimodal.Media

/** Multimodal plumbing: the image path is a REAL PNG encode→decode round
  * trip through javax.imageio, the audio path a REAL WAV encode→decode
  * round trip through javax.sound.sampled; the mapPartitions feature
  * path must agree with the pure-SQL expression path on non-image
  * modalities (cross-validates the imperative batch loop against the
  * codegen'd charHash — valid for audio because WAV is lossless over the
  * PCM bytes); and metadata-only transforms never touch payloads.
  */
class MediaSpec extends SparkSpecBase {

  test("PNG encode -> ImageIO decode round-trips the source pixels exactly") {
    val text = "The quick brown fox jumps over the lazy dog! 0123456789"
    val bytes = text.getBytes("UTF-8")
    val id = 42L // 42 % 32 = 10 -> width 42? no: width = 32 + (42 % 32) = 42
    val png = Media.synthPng(id, bytes)
    // a real PNG payload, not the raw bytes
    assert(png.take(4).sameElements(Array[Byte](0x89.toByte, 'P', 'N', 'G')))
    val d = Media.ImageIoDecoder.decode(png, Media.MediaMeta("image/png", 0, 0, 0L))
    assert(d.width == Media.imageWidth(id) && d.height == Media.ImageHeight)
    assert(d.samples.length == d.width * d.height)
    // decoded sample i re-quantizes to exactly the cyclic source byte
    d.samples.zipWithIndex.foreach { case (s, i) =>
      assert((s * 256.0).toInt == (bytes(i % bytes.length) & 0xff), s"pixel $i")
    }
  }

  test("WAV encode -> javax.sound decode round-trips the PCM bytes exactly") {
    val text = "The quick brown fox jumps over the lazy dog! 0123456789"
    val pcm = text.getBytes("UTF-8")
    val wav = Media.synthWav(pcm)
    // a real RIFF/WAVE payload, not the raw bytes
    assert(wav.take(4).sameElements("RIFF".getBytes("US-ASCII")))
    assert(wav.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII")))
    val d = Media.WavDecoder.decode(wav, Media.MediaMeta("audio/wav", 0, 0, 0L))
    assert(d.width == 0 && d.height == 0)
    assert(d.samples.length == pcm.length)
    d.samples.zipWithIndex.foreach { case (s, i) =>
      assert((s * 256.0).toInt == (pcm(i) & 0xff), s"sample $i")
    }
  }

  test("mapPartitions checksum equals the SQL rolling hash on the audio modality") {
    // audio is the one modality whose decoded stream IS the text bytes
    // verbatim (images/videos cyclically extend them), so its decoded
    // checksum must equal the pure-SQL rolling hash over the text
    val fromBlobs = Media
      .extractFeatures(Media.blobs(spark, Sf0001))
      .toDF()
      .filter(col("modality") === "audio")
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

  test("image features come from the real decode: geometry and sample count match") {
    val img = Media
      .extractFeatures(Media.blobs(spark, Sf0001))
      .toDF()
      .filter(col("modality") === "image")
    assert(img.count() > 0)
    val bad = img
      .filter(
        col("width") =!= (lit(32) + col("media_id") % 32) ||
          col("height") =!= Media.ImageHeight ||
          col("n_samples") =!= col("width") * col("height")
      )
      .count()
    assert(bad == 0)
  }

  test("audio decode produces one sample per source text byte") {
    val rows = Media
      .extractFeatures(Media.blobs(spark, Sf0001))
      .toDF()
      .filter(col("modality") === "audio")
      .join(
        spark.read
          .parquet(s"$Sf0001/documents.parquet")
          .select(col("doc_id").as("media_id"), length(col("text")).as("n_text")),
        "media_id"
      )
      .filter(col("n_samples") =!= col("n_text"))
      .count()
    assert(rows == 0)
  }

  test("video features come from real per-frame decodes: geometry and sample count match") {
    val vid = Media
      .extractFeatures(Media.blobs(spark, Sf0001))
      .toDF()
      .filter(col("modality") === "video")
    assert(vid.count() > 0)
    val bad = vid
      .filter(
        col("width") =!= Media.VideoWidth ||
          col("height") =!= Media.VideoHeight ||
          // frames × 32×18 decoded pixels, frame count varying by id
          col("n_samples") =!= (lit(4) + col("media_id") % 4) * Media.VideoWidth * Media.VideoHeight
      )
      .count()
    assert(bad == 0)
  }

  test("video frames round-trip: stbl demux + ImageIO decode continues the cyclic text stream") {
    val text = "Sphinx of black quartz, judge my vow — 0123456789"
    val bytes = text.getBytes("UTF-8")
    val id = 5L // 5 % 3 = 2 (video), 5 % 4 = 1 -> 5 frames
    val mp4 = Media.synthVideo(id, bytes, 4321L)
    val d = Media.Mp4Decoder.decode(mp4, Media.MediaMeta("video/mp4", 0, 0, 0L))
    assert(d.width == Media.VideoWidth && d.height == Media.VideoHeight)
    val expectLen = Media.videoFrameCount(id) * Media.VideoWidth * Media.VideoHeight
    assert(d.samples.length == expectLen)
    // every decoded pixel, across all frames, re-quantizes to the cyclic
    // source byte at its GLOBAL stream index — frame k starts at k*w*h
    d.samples.zipWithIndex.foreach { case (s, i) =>
      assert((s * 256.0).toInt == (bytes(i % bytes.length) & 0xff), s"sample $i")
    }
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

  test("ahash near-dup: planted perceptual variants found; binary dedup blind to them") {
    val rows = graft.queries.MediaQueries
      .queries("m_ahash_near_dup")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val nPlanted = docs.filter(col("doc_id") % 9 === 0).count()
    // a +4 shift on one recurring byte moves cell means by ≲2% of range —
    // the overwhelming majority of variants stay within hamming 3 of
    // their original (exactly the perceptual-invariance the hash is for)
    val variantPairs = rows.count { r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 3000000L
    }
    assert(variantPairs >= nPlanted / 2)
    // and the perturbed PNG BYTES always differ → md5 dedup finds none
    val corpus = Media.imageCorpusWithVariants(spark, Sf0001)
    val md5Groups = corpus.toDF()
      .filter(col("media_id") >= 3000000L || col("media_id") % 9 === 0)
      .groupBy(md5(col("content")))
      .count()
      .filter(col("count") > 1)
      .count()
    assert(md5Groups == 0L)
  }

  test("mjpeg frame stats: real lossy JPEG decode corpus-wide, means within tolerance") {
    // The rows-only contract of m_mjpeg_frame_stats, asserted here: every
    // selected video's JPEG frames demux, ImageIO-decode, and keep their
    // per-frame mean within 3 gray levels of the source stream (JPEG DCT
    // quantization preserves block averages). Geometry/count invariants
    // prove the demux read real sample tables, not metadata.
    val rows = graft.queries.MediaQueries
      .queries("m_mjpeg_frame_stats")(spark, Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(id % 12 == 2)
      val nf = r.getAs[Int]("n_frames")
      assert(nf == Media.videoFrameCount(id), s"frame count mismatch for $id")
      assert(r.getAs[Boolean]("within_tolerance"),
        s"video $id frame mean error ${r.getAs[Long]("max_mean_abs_err_e3")} > 3000 e-3 levels")
      // lossy: at least SOME error is expected somewhere; checked corpus-
      // wide below so a silently-lossless (i.e. wrong-codec) path fails
    }
    assert(rows.map(_.getAs[Long]("max_mean_abs_err_e3")).max > 0L,
      "zero error corpus-wide: the frames did not go through a lossy codec")
  }
}
