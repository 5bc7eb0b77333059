package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

import graft.queries.DedupQueries

/** The daily dedup ingest AS A STREAM — the integration the store tiers
  * exist for: documents arrive as a file stream, each micro-batch is
  * probed against the persisted index (base ∪ delta-so-far) through the
  * SAME `probeVerdictsOf` code path the registered query uses, and the
  * kept ('new'-verdict) docs' features are appended to the delta before
  * the next trigger.
  *
  * Invariant proven: the streaming ingest KEEPS exactly the same doc set
  * as the one-shot batch ingest (`d_incremental_dedup`'s 'new' set) when
  * micro-batches arrive in id order. The verdict LABELS can legitimately
  * differ — a doc that batch mode calls `dup_in_batch` (dup of an
  * earlier batch doc) is `exact/near_dup_corpus` to the stream once its
  * twin has been appended — but the keep/drop decision is label-free:
  * kept = not a duplicate of anything seen before. (In general,
  * kept-set equivalence additionally needs the plant to be free of
  * dropped-intermediate near-dup chains — X~Y, Y~Z, X≁Z with Y dropped —
  * which this plant is by construction: its near relations are direct
  * copies/truncations of kept-or-base docs, never chains through a
  * dropped doc. A production pipeline must CHOOSE between
  * representative-dedup (this semantics) and pair-transitive dedup
  * (d_dup_clusters' connected components) — they differ exactly on such
  * chains.)
  */
class StreamIngestSpec extends SparkSpecBase {

  test("micro-batched probe+append ingest keeps exactly the batch probe's 'new' set") {
    import spark.implicits._
    DedupQueries.dropDixStore(spark, Sf0001)
    val (docT, bandT) = DedupQueries.dedupIndexTables(spark, Sf0001, rebuild = false)

    // one-shot batch ingest: the reference keep-set
    val batchKept = DedupQueries.queries("d_incremental_dedup")(spark, Sf0001)
      .collect()
      .collectFirst { case r if r.getString(0) == "new" =>
        (r.getLong(1), r.getLong(2))
      }
      .getOrElse((0L, 0L))

    // replay the SAME plant batch as an id-ordered file stream, 4 chunks
    val batch = DedupQueries.incBatch(spark, Sf0001)
    val w = Window.orderBy(col("doc_id"))
    val tiled = batch.withColumn("chunk", ntile(4).over(w))
    val streamDir = Files.createTempDirectory("graft-ingest")
    (1 to 4).foreach { i =>
      val tmp = Files.createTempDirectory("graft-ingest-chunk")
      tiled.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, streamDir.resolve(s"c$i.parquet"))
    }

    // delta accumulators (checkpointed per micro-batch — the in-memory
    // stand-in for the dxd delta tables; the mechanics are identical)
    var deltaDocs = spark.emptyDataFrame
    var deltaBands = spark.emptyDataFrame
    var haveDelta = false
    var keptIds = Seq.empty[Long]

    val q = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
      .writeStream
      .outputMode("append")
      .foreachBatch { (mb: DataFrame, _: Long) =>
        if (!mb.isEmpty) {
          val storeDocs =
            if (haveDelta) spark.table(docT).select("dp", "doc_id", "d1", "d2", "hs")
              .unionAll(deltaDocs)
            else spark.table(docT).select("dp", "doc_id", "d1", "d2", "hs")
          val storeBands =
            if (haveDelta) spark.table(bandT).select("bp", "band", "bkey", "doc_id")
              .unionAll(deltaBands)
            else spark.table(bandT).select("bp", "band", "bkey", "doc_id")
          val bf = DedupQueries.docFeaturesOf(spark, mb)
          val newIds = DedupQueries
            .probeVerdictsWith(spark, mb, bf, storeDocs, storeBands)
            .filter(col("verdict") === "new")
            .select(col("doc_id"))
          val kept = bf
            .join(newIds, Seq("doc_id"), "left_semi")
            .localCheckpoint()
          keptIds ++= kept.select("doc_id").as[Long].collect()
          val keptDocs = kept
            .withColumn("dp",
              pmod(col("doc_id"), lit(DedupQueries.DixParts.toLong)).cast("int"))
            .select("dp", "doc_id", "d1", "d2", "hs")
          val keptBands = DedupQueries.bandKeysOf(kept.select(col("doc_id"), col("hs")))
            .withColumn("bp",
              pmod(col("bkey"), lit(DedupQueries.DixParts.toLong)).cast("int"))
            .select("bp", "band", "bkey", "doc_id")
          deltaDocs =
            (if (haveDelta) deltaDocs.unionAll(keptDocs) else keptDocs).localCheckpoint()
          deltaBands =
            (if (haveDelta) deltaBands.unionAll(keptBands) else keptBands).localCheckpoint()
          haveDelta = true
        }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(keptIds.size == keptIds.distinct.size, "a doc was kept twice")
    assert((keptIds.size.toLong, keptIds.sum) == batchKept,
      s"streaming ingest kept (${keptIds.size}, ${keptIds.sum}) docs; " +
        s"one-shot batch ingest keeps $batchKept")
  }
}
