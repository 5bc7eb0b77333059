package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

import graft.queries.{DedupQueries, OperatorQueries}

/** Streaming dedup INGEST over the persisted dedup-index store — the
  * composition VERDICT r12 #2 asked for: the two strongest tiers in the
  * repo (the persisted dedup index, and checkpoint-recovered streaming)
  * running as ONE operator. Documents arrive as a file stream; every
  * micro-batch is probed against base ∪ committed-deltas through the
  * SAME `probeVerdictsWith` path the batch queries use, and the kept
  * ('new'-verdict) docs' features are appended to epoch-partitioned
  * delta tables before the next trigger.
  *
  * Exactly-once under replay (the property StreamRecoverySpec proves for
  * the event pipelines, here for a STATEFUL STORE): foreachBatch is
  * at-least-once, so a crash between the delta write and the offset
  * commit replays the micro-batch. Two mechanisms make the replay a
  * byte-level no-op:
  *
  *  1. EPOCH ISOLATION on the read side — a micro-batch probes only
  *     base ∪ deltas with `epoch < batchId`. A replayed batch therefore
  *     sees exactly the store view its original run saw (its own partial
  *     write is invisible to itself), so it recomputes exactly the same
  *     kept set;
  *  2. EPOCH OVERWRITE on the write side — deltas are partitioned by
  *     epoch (= batchId) and written with dynamic partition overwrite
  *     (the repo's idempotentEpochWriter discipline): the replay
  *     replaces its own epoch partition with identical content and
  *     touches nothing else.
  *
  * Scale shape: identical to the batch append — O(|micro-batch|)
  * feature pass, narrow-key probes of the partitioned store, O(kept)
  * delta files per epoch; the corpus-sized base is never read beyond
  * the probe's semi-join columns and never written. The chunk writer
  * (`prepareStreamSource`) is the TEST HARNESS simulating arrival — its
  * unpartitioned ntile orders the plant batch by id, which is the
  * arrival order a real ingest gets from its upstream queue, not an
  * operator cost.
  *
  * Kept-set semantics: with id-ordered arrival this keeps EXACTLY the
  * batch probe's 'new' set (StreamIngestSpec's invariant; see its
  * scaladoc for the chain-freeness caveat on representative-dedup).
  */
object DedupIngest {

  private[graft] val NumChunks = 4

  private def warehousePath(s: SparkSession): Path =
    Paths.get(s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally stream.close()
    }

  /** (deltaDocTable, deltaBandTable, doneMarkerTable, srcDir, ckptDir)
    * for this corpus fingerprint.
    */
  private[graft] def ingestLayout(
      s: SparkSession, dir: String): (String, String, String, Path, Path) = {
    val tag = OperatorQueries.sourceTag(s, s"$dir/documents.parquet")
    (s"graft_dsi_doc_$tag", s"graft_dsi_band_$tag", s"graft_dsi_done_$tag",
      warehousePath(s).resolve(s"graft_dsi_src_$tag"),
      warehousePath(s).resolve(s"graft_dsi_ckpt_$tag"))
  }

  /** Writes the plant batch as [[NumChunks]] id-ordered single-file
    * parquet chunks with ascending mtimes AND lexicographic names, so
    * the file source replays them oldest-first in id order on any
    * filesystem mtime granularity.
    */
  private[graft] def prepareStreamSource(
      s: SparkSession, dir: String, srcDir: Path): Unit = {
    deleteRecursively(srcDir)
    Files.createDirectories(srcDir)
    val w = Window.orderBy(col("doc_id"))
    val tiled = DedupQueries.incBatch(s, dir)
      .withColumn("chunk", ntile(NumChunks).over(w))
    val base = System.currentTimeMillis()
    (1 to NumChunks).foreach { i =>
      val tmp = Files.createTempDirectory("graft-dsi-chunk")
      tiled.filter(col("chunk") === i).drop("chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for ingest chunk $i"))
      val dst = srcDir.resolve(f"c$i%02d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(base + i * 1000L))
    }
  }

  /** One micro-batch: probe against base ∪ COMMITTED deltas
    * (epoch < batchId), then epoch-overwrite this batch's kept docs.
    */
  private[graft] def ingestMicroBatch(
      s: SparkSession, mb: DataFrame, batchId: Long,
      docT: String, bandT: String, dDocT: String, dBandT: String): Unit = {
    if (mb.isEmpty) return
    val baseDocs = s.table(docT).select("dp", "doc_id", "d1", "d2", "hs")
    val baseBands = s.table(bandT).select("bp", "band", "bkey", "doc_id")
    val storeDocs =
      if (!s.catalog.tableExists(dDocT)) baseDocs
      else baseDocs.unionByName(
        s.table(dDocT).filter(col("epoch") < batchId)
          .select("dp", "doc_id", "d1", "d2", "hs"))
    val storeBands =
      if (!s.catalog.tableExists(dBandT)) baseBands
      else baseBands.unionByName(
        s.table(dBandT).filter(col("epoch") < batchId)
          .select("bp", "band", "bkey", "doc_id"))
    val bf = DedupQueries.docFeaturesOf(s, mb)
    val newIds = DedupQueries
      .probeVerdictsWith(s, mb, bf, storeDocs, storeBands)
      .filter(col("verdict") === "new")
      .select(col("doc_id"))
    val kept = bf.join(newIds, Seq("doc_id"), "left_semi").localCheckpoint()
    val keptDocs = kept
      .withColumn("dp", pmod(col("doc_id"), lit(DedupQueries.DixParts.toLong)).cast("int"))
      .select(col("doc_id"), col("d1"), col("d2"), col("hs"), col("dp"),
        lit(batchId).as("epoch"))
    val keptBands = DedupQueries.bandKeysOf(kept.select(col("doc_id"), col("hs")))
      .withColumn("bp", pmod(col("bkey"), lit(DedupQueries.DixParts.toLong)).cast("int"))
      .select(col("doc_id"), col("band"), col("bkey"), col("bp"),
        lit(batchId).as("epoch"))
    writeEpoch(s, keptDocs, dDocT)
    writeEpoch(s, keptBands, dBandT)
    // the write runs on the micro-batch's session CLONE, whose cache
    // invalidation does not reach the OUTER session's relation cache —
    // the next micro-batch (and any later batch query) reads the delta
    // through the outer session and would see the pre-overwrite file
    // listing (FAILED_READ_FILE.FILE_NOT_EXIST after a replay)
    s.catalog.refreshTable(dDocT)
    s.catalog.refreshTable(dBandT)
  }

  /** First write creates the epoch-partitioned table; every later write
    * dynamic-overwrites ONLY the partitions receiving rows — a replayed
    * epoch replaces itself, committed epochs are untouched.
    */
  private def writeEpoch(s: SparkSession, df: DataFrame, table: String): Unit =
    if (!s.catalog.tableExists(table)) {
      df.write.partitionBy("epoch").format("parquet").saveAsTable(table)
    } else {
      // the overwrite-mode conf must be set on the DATAFRAME's session:
      // inside foreachBatch that is the streaming query's session CLONE
      // (conf snapshot taken at query start), so a set on the outer
      // session never reaches the write and the 'dynamic' silently
      // degrades to a whole-table static overwrite — each epoch erasing
      // every earlier one (caught by StreamIngestRecoverySpec's debug
      // run: only the final epoch survived)
      val ds = df.sparkSession
      val prev = ds.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      ds.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try df.write.mode("overwrite").insertInto(table)
      finally prev match {
        case Some(m) => ds.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => ds.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }

  /** Runs the ingest stream over an already-prepared source dir.
    * `stopAfterBatches = Some(n)` stops the query once n micro-batches
    * have completed their foreachBatch — possibly mid-flight in batch
    * n+1, which is exactly the crash the recovery spec simulates; a
    * later call with the SAME checkpoint resumes (and replays the
    * uncommitted batch idempotently).
    */
  private[graft] def runStreamIngest(
      s: SparkSession, srcDir: Path, ckptDir: Path,
      docT: String, bandT: String, dDocT: String, dBandT: String,
      stopAfterBatches: Option[Int]): Unit = {
    val schema = s.read.parquet(srcDir.toString).schema
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckptDir.toString)
      .foreachBatch { (mb: DataFrame, batchId: Long) =>
        ingestMicroBatch(s, mb, batchId, docT, bandT, dDocT, dBandT)
        done.incrementAndGet()
        ()
      }
      .start()
    try stopAfterBatches match {
      case None => q.processAllAvailable()
      case Some(n) =>
        // "n batches" means n COMMITTED batches: wait for the commit-log
        // entry of batch n-1, not just the foreachBatch return, so a
        // caller injecting a crash (deleting a commit entry) gets a
        // deterministic replay boundary instead of racing the commit.
        val commitN = ckptDir.resolve("commits").resolve((n - 1).toString)
        val deadline = System.currentTimeMillis() + 300000L
        while ((done.get() < n || !Files.exists(commitN)) && q.isActive &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
        require(done.get() >= n && Files.exists(commitN),
          s"ingest stream committed only ${done.get()} of $n micro-batches before timeout")
    } finally q.stop()
  }

  /** Ensures the streaming ingest ran ONCE for this corpus: base store
    * build-on-miss, chunked source replay, checkpointed stream, then the
    * done-marker table written LAST (completion marker — a crashed run
    * leaves no marker and the next call starts clean).
    */
  private[graft] def ensureStreamIngested(
      s: SparkSession, dir: String): (String, String) = {
    val (dDocT, dBandT, doneT, srcDir, ckptDir) = ingestLayout(s, dir)
    if (!s.catalog.tableExists(doneT)) {
      // the knob contaminates persisted state exactly like an append
      // under it would (see ensureDedupAppended's guard)
      require(sys.env.get("SPARK_GRAFT_DIX_BATCH_MOD").isEmpty,
        "SPARK_GRAFT_DIX_BATCH_MOD drives the read-only d_index_probe A/B only; " +
          "unset it before d_stream_ingest.")
      val (docT, bandT) = DedupQueries.dedupIndexTables(s, dir, rebuild = false)
      Seq(dDocT, dBandT, doneT).foreach(OperatorQueries.dropManagedTable(s, _))
      deleteRecursively(ckptDir)
      prepareStreamSource(s, dir, srcDir)
      runStreamIngest(s, srcDir, ckptDir, docT, bandT, dDocT, dBandT, None)
      s.range(1).select(lit(NumChunks).as("n_chunks"))
        .coalesce(1).write.mode("overwrite").saveAsTable(doneT)
      // replay scratch (source chunks + checkpoint) is not serving state
      deleteRecursively(srcDir)
      deleteRecursively(ckptDir)
    }
    (dDocT, dBandT)
  }
}
