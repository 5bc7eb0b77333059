package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Media

/** Driver registrations for the multimodal tier. Image blobs are REAL
  * PNGs decoded with `javax.imageio` (pixels = the doc's text bytes
  * extended cyclically); audio blobs are REAL 8-bit PCM WAVs decoded
  * with `javax.sound.sampled` (PCM = the doc's text bytes); video blobs
  * are REAL sampled ISO BMFF MP4s — frames located via the `stbl`
  * sample table and decoded per-frame with `javax.imageio` (PNG-coded
  * intraframes whose pixels continue the cyclic text stream across
  * frames; see `Media.synthVideo`). All three are lossless, so in every
  * case the DuckDB oracle mirrors the sample-level computation with
  * portable codepoint comprehensions.
  */
object MediaQueries {
  import Q._

  /** DuckDB fragment: the decoded-and-requantized sample list per doc —
    * for images the text codepoints extended cyclically to width*height
    * (what the PNG decode returns), for video the codepoints extended
    * cyclically to frames × 32×18 (what the per-frame PNG decodes
    * concatenate to), for audio the codepoints as-is (what the WAV PCM
    * read returns). Expects a CTE `t(doc_id, text, cps)`.
    */
  private val samplesDuck: String =
    """CASE WHEN doc_id % 3 = 0
      |     THEN [cps[((i - 1) % len(cps)) + 1]
      |           for i in range(1, CAST(32 * (32 + doc_id % 32) AS INT) + 1)]
      |     WHEN doc_id % 3 = 2
      |     THEN [cps[((i - 1) % len(cps)) + 1]
      |           for i in range(1, CAST((4 + doc_id % 4) * 576 AS INT) + 1)]
      |     ELSE cps END""".stripMargin

  val queries: Map[String, Fn] = Map(
    // mapPartitions-batched decode + feature extraction over binary blobs;
    // image rows go through a REAL javax.imageio PNG decode, audio rows
    // through a REAL javax.sound.sampled WAV decode, video rows through a
    // REAL stbl demux + per-frame javax.imageio decode.
    "m_media_features" -> ((s, dir) =>
      Media
        .extractFeatures(Media.blobs(s, dir))
        .toDF()
        .orderBy("media_id")),

    // Metadata-only frame-sample plan (never touches the payload bytes):
    // output the number of sampled frames per video blob, striding the
    // notional 24 fps presentation timeline from the DECLARED duration.
    // Deliberately metadata-only even though the container now carries a
    // real sample table — planning which frames to pull at 100 TB must
    // not require deserializing payloads; m_media_features is the path
    // that actually demuxes and decodes.
    "m_frame_sample_plan" -> ((s, dir) =>
      Media
        .frameSamplePlan(Media.blobs(s, dir))
        .select(col("media_id"), size(col("frame_indices")).as("n_frames"))
        .orderBy("media_id")),

    // Resize/downsample: 4x box-filter pooling over the DECODED samples
    // (real pixels for images; audio downsample shape for the rest) —
    // integer window sums, one division at the end, half-up rounding
    // mirrored by the oracle.
    "m_resize_pool" -> ((s, dir) =>
      Media
        .resizePool(Media.blobs(s, dir))
        .toDF()
        .orderBy("media_id")),

    // Exact binary dedup: duplicate payloads (re-crawled images, mirrored
    // videos) found by content digest — at 100 TB the digest computes in
    // the scan projection and ONLY the 16-byte hash shuffles, never the
    // blob. Planted copies of every 7th payload; groups by md5 over the
    // raw bytes. Payloads here are the raw document bytes (not the PNG
    // corpus — the oracle must be able to hash the identical byte stream,
    // and DuckDB can't encode PNGs).
    "m_binary_dedup" -> ((s, dir) => {
      val b = table(s, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))
      val withCopies = b.unionAll(
        b.filter(col("media_id") % 7 === 0)
          .select((col("media_id") + 2000000L).as("media_id"), col("content"))
      )
      withCopies
        .groupBy(md5(col("content")).as("content_md5"))
        .agg(min(col("media_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .select(col("content_md5"), col("keeper"), col("n_copies"))
        .orderBy("keeper")
    }),

    // Lossy-frame video audit — the ONE registered query whose frames go
    // through the ImageIO JPEG decode path (the corpus's oracle-facing
    // videos are PNG-coded so hashes stay deterministic; Mp4Spec proves
    // the JPEG path on two frames, this runs it corpus-wide). Rows-only
    // by necessity (lossy output is codec-implementation-defined — same
    // contract class as a8_duration_sec); the tolerance contract
    // (per-frame mean error ≤ 3 gray levels) is asserted in MediaSpec.
    "m_mjpeg_frame_stats" -> ((s, dir) => graft.multimodal.Media.mjpegFrameStats(s, dir)),

    // Perceptual (average-hash) image near-dup: every image goes through
    // the REAL javax.imageio decode, hashes to 64 bits via the 8×8
    // global-mean grid (Media.aHash64 — pure integer threshold, so the
    // oracle reproduces every bit), and pairs come from a 4×16-bit band
    // join — by pigeonhole EXACT for hamming ≤ 3, identical machinery to
    // d_simhash_pairs but over decoded pixels instead of shingles. The
    // planted corpus re-renders every 9th image from slightly-perturbed
    // source text (a few pixels differ): binary dedup (m_binary_dedup)
    // can never catch these — the PNG bytes differ — which is exactly
    // the gap perceptual hashing exists to close.
    "m_ahash_near_dup" -> ((s, dir) => {
      val hashes = Media
        .aHash64(Media.imageCorpusWithVariants(s, dir))
        .toDF()
        .localCheckpoint() // both band-join sides: decode each image ONCE
      val bands = hashes
        .select(
          col("media_id"),
          col("lo"),
          col("hi"),
          explode(
            expr(
              "array(struct(0 AS band, lo & 65535L AS bkey), " +
                "struct(1 AS band, shiftright(lo, 16) & 65535L AS bkey), " +
                "struct(2 AS band, hi & 65535L AS bkey), " +
                "struct(3 AS band, shiftright(hi, 16) & 65535L AS bkey))"
            )
          ).as("bk")
        )
        .select(col("media_id"), col("lo"), col("hi"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      bands
        .select(col("band"), col("bkey"), col("media_id").as("id_a"),
          col("lo").as("lo_a"), col("hi").as("hi_a"))
        .join(
          bands.select(col("band"), col("bkey"), col("media_id").as("id_b"),
            col("lo").as("lo_b"), col("hi").as("hi_b")),
          Seq("band", "bkey")
        )
        .filter(col("id_a") < col("id_b"))
        .select(
          col("id_a"),
          col("id_b"),
          (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
            bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("int").as("hamming")
        )
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  val oracle: Map[String, String] = Map(
    "m_media_features" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  [CAST(unicode(text[i]) AS BIGINT) for i in range(1, len(text) + 1)] AS cps
         |  FROM documents),
         |s AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
         |  $samplesDuck AS q,
         |  CASE WHEN doc_id % 3 = 0 THEN CAST(32 + doc_id % 32 AS INT)
         |       WHEN doc_id % 3 = 1 THEN 0 ELSE 32 END AS width,
         |  CASE WHEN doc_id % 3 = 0 THEN 32
         |       WHEN doc_id % 3 = 1 THEN 0 ELSE 18 END AS height
         |  FROM t),
         |f AS (SELECT doc_id AS media_id, modality, len(q) AS n_samples, width, height,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), q),
         |              (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
         |  [len(list_filter(q, c -> c // 16 = b)) for b in range(0, 16)] AS bins
         |  FROM s)
         |SELECT media_id, modality, CAST(n_samples AS INT) AS n_samples,
         |  CAST(width AS INT) AS width, CAST(height AS INT) AS height, checksum,
         |  CAST(list_position(bins, list_aggregate(bins, 'max')) - 1 AS INT) AS top_bin
         |FROM f ORDER BY media_id""".stripMargin,
    "m_frame_sample_plan" ->
      """SELECT doc_id AS media_id,
        |  CAST((CAST(floor((2000 + (doc_id % 8000)) / (1000 / 24)) AS INT) // 10) + 1 AS INT) AS n_frames
        |FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id""".stripMargin,
    "m_resize_pool" ->
      s"""WITH t AS (SELECT doc_id, text,
         |  [CAST(unicode(text[i]) AS BIGINT) for i in range(1, len(text) + 1)] AS cps
         |  FROM documents),
         |s AS (SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 0 THEN 'image'
         |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
         |  $samplesDuck AS q
         |  FROM t),
         |w AS (SELECT doc_id, modality, len(q) AS n_samples,
         |  [list_sum(q[i:i+3]) for i in range(1, len(q) + 1, 4)] AS ws
         |  FROM s)
         |SELECT doc_id AS media_id, modality,
         |  CAST(n_samples AS INT) AS n_samples,
         |  CAST(len(ws) AS INT) AS n_pooled,
         |  round(CAST(list_sum(ws) AS DOUBLE) / 1024.0 / len(ws), 6) AS mean_pooled,
         |  round(CAST(list_aggregate(ws, 'max') AS DOUBLE) / 1024.0, 6) AS max_pooled
         |FROM w ORDER BY media_id""".stripMargin,
    "m_binary_dedup" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS media_id, text FROM documents
        |  WHERE doc_id % 7 = 0)
        |SELECT md5(text) AS content_md5, min(media_id) AS keeper,
        |       count(*) AS n_copies
        |FROM b GROUP BY 1 HAVING count(*) > 1 ORDER BY keeper""".stripMargin,
    // aHash mirrored pixel-for-pixel: cyclic codepoint pixels, 8×8
    // integer-boundary cells via nested list comprehensions, the same
    // cross-multiplied global-mean threshold, 32-bit halves, all-pairs
    // hamming (candidate banding is invisible to results — pigeonhole
    // makes the band join exact for hamming ≤ 3).
    "m_ahash_near_dup" ->
      """WITH imgs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id,
        |         chr(unicode(text[1]) + 4) || text[2:] AS text
        |  FROM documents WHERE doc_id % 9 = 0),
        |t AS (SELECT doc_id,
        |  [CAST(unicode(text[i]) AS BIGINT) for i in range(1, len(text) + 1)] AS cps
        |  FROM imgs),
        |g AS (SELECT doc_id, CAST(32 + doc_id % 32 AS BIGINT) AS W, CAST(32 AS BIGINT) AS H,
        |  [cps[((i - 1) % len(cps)) + 1]
        |   for i in range(1, CAST((32 + doc_id % 32) * 32 AS INT) + 1)] AS smp
        |  FROM t),
        |b AS (SELECT doc_id,
        |  [CASE WHEN list_sum([
        |     smp[(((bb // 8) * H) // 8 + k // (((bb % 8) + 1) * W // 8 - (bb % 8) * W // 8)) * W
        |         + (bb % 8) * W // 8
        |         + (k % (((bb % 8) + 1) * W // 8 - (bb % 8) * W // 8)) + 1]
        |     for k in range(0, ((((bb // 8) + 1) * H) // 8 - ((bb // 8) * H) // 8)
        |                       * (((bb % 8) + 1) * W // 8 - (bb % 8) * W // 8))])
        |     * (W * H) > list_sum(smp) * ((((bb // 8) + 1) * H) // 8 - ((bb // 8) * H) // 8)
        |                               * (((bb % 8) + 1) * W // 8 - (bb % 8) * W // 8)
        |   THEN 1 ELSE 0 END
        |   for bb in range(0, 64)] AS bits
        |  FROM g),
        |hsh AS (SELECT doc_id,
        |  CAST(list_sum([bits[i + 1] * (CAST(1 AS BIGINT) << i) for i in range(0, 32)]) AS BIGINT) AS lo,
        |  CAST(list_sum([bits[i + 33] * (CAST(1 AS BIGINT) << i) for i in range(0, 32)]) AS BIGINT) AS hi
        |  FROM b)
        |SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
        |  CAST(bit_count(xor(a.lo, b2.lo)) + bit_count(xor(a.hi, b2.hi)) AS INT) AS hamming
        |FROM hsh a JOIN hsh b2 ON a.doc_id < b2.doc_id
        |WHERE bit_count(xor(a.lo, b2.lo)) + bit_count(xor(a.hi, b2.hi)) <= 3
        |ORDER BY id_a, id_b""".stripMargin
  )
}
