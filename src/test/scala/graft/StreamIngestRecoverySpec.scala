package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.queries.DedupQueries
import graft.streaming.DedupIngest

/** Checkpoint recovery for the STATEFUL dedup-ingest stream (VERDICT r12
  * #2 — StreamRecoverySpec proves recovery for stateless-sink event
  * pipelines; this proves it where the sink is a persisted STORE the
  * next micro-batch reads). The crash is INJECTED deterministically:
  * after two committed micro-batches, batch 1's commit-log entry is
  * deleted — exactly the at-least-once window (sink write landed, offset
  * commit did not) — so the restart MUST replay batch 1 against a delta
  * that already contains batch 1's own rows. The run is green only if
  * epoch isolation hid those rows from the replay (else the replay would
  * judge its docs duplicates-of-themselves, keep nothing, and epoch-
  * overwrite batch 1's partition to empty) and the epoch overwrite
  * replaced the partition with identical content.
  *
  * Plant note: chunks 3 and 4 keep nothing by construction (the
  * +3000000 exact corpus copies and +4000000/+5000000 near/batch copies
  * sort to the high-id chunks and are all duplicates of something
  * already in base ∪ earlier chunks), so the full keep set lands in
  * epochs 0-1; run 2's work is the forced replay plus draining the
  * keep-nothing tail.
  */
class StreamIngestRecoverySpec extends SparkSpecBase {

  private def listing(root: Path): Map[String, (Long, Long)] = {
    if (!Files.exists(root)) return Map.empty
    val stream = Files.walk(root)
    try {
      stream.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .filterNot { p =>
          val n = p.getFileName.toString
          n.startsWith("_") || n.startsWith(".")
        }
        .map { p =>
          val crc = new java.util.zip.CRC32
          crc.update(Files.readAllBytes(p))
          (root.relativize(p).toString, (Files.size(p), crc.getValue))
        }
        .toMap
    } finally stream.close()
  }

  private def whDir(table: String): Path = {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Paths.get(wh, table.toLowerCase)
  }

  test("injected crash after an uncommitted epoch: restart replays it idempotently to the batch keep set") {
    DedupQueries.dropDixStore(spark, Sf0001)
    val (docT, bandT) = DedupQueries.dedupIndexTables(spark, Sf0001, rebuild = false)
    val (dDocT, dBandT, _, srcDir, ckptDir) = DedupIngest.ingestLayout(spark, Sf0001)
    Seq(dDocT, dBandT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    DedupIngest.deleteRecursively(ckptDir)
    DedupIngest.prepareStreamSource(spark, Sf0001, srcDir)

    // one-shot batch reference: the 'new' verdict set
    val batchNew = DedupQueries.queries("d_incremental_dedup")(spark, Sf0001)
      .collect()
      .collectFirst { case r if r.getString(0) == "new" => (r.getLong(1), r.getLong(2)) }
      .getOrElse((0L, 0L))
    assert(batchNew._1 > 0, "plant produced no 'new' docs — the spec has nothing to prove")

    // run 1: two COMMITTED micro-batches, then stop
    DedupIngest.runStreamIngest(
      spark, srcDir, ckptDir, docT, bandT, dDocT, dBandT, Some(2))
    val epochsRun1 = spark.table(dDocT).select("epoch").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(Set(0L, 1L).subsetOf(epochsRun1),
      s"first two epochs missing after run 1: $epochsRun1")
    val epoch0Before = listing(whDir(dDocT).resolve("epoch=0"))
    val epoch1RowsBefore = spark.table(dDocT).filter(col("epoch") === 1L)
      .select("doc_id", "d1", "d2").collect().map(_.toSeq).toSet
    assert(epoch0Before.nonEmpty && epoch1RowsBefore.nonEmpty,
      "epochs 0/1 kept nothing — the replay injection would be vacuous")

    // CRASH INJECTION: batch 1's sink write is on disk but its commit is
    // gone — the at-least-once window. The restart must replay batch 1.
    val commit1 = ckptDir.resolve("commits").resolve("1")
    assert(Files.exists(commit1), "commit log entry for batch 1 missing after run 1")
    Files.delete(commit1)
    val commit1Crc = ckptDir.resolve("commits").resolve(".1.crc")
    if (Files.exists(commit1Crc)) Files.delete(commit1Crc)

    // run 2: restart from the SAME checkpoint; replays batch 1, drains
    DedupIngest.runStreamIngest(
      spark, srcDir, ckptDir, docT, bandT, dDocT, dBandT, None)

    val ids = spark.table(dDocT).select("doc_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      "a doc was kept twice across the restart (replay was not idempotent)")
    assert((ids.length.toLong, ids.sum) == batchNew,
      s"recovered store keeps (${ids.length}, ${ids.sum}); batch mode keeps $batchNew")
    val epoch1RowsAfter = spark.table(dDocT).filter(col("epoch") === 1L)
      .select("doc_id", "d1", "d2").collect().map(_.toSeq).toSet
    assert(epoch1RowsAfter == epoch1RowsBefore,
      "the replayed epoch-1 content diverged from its original write")
    assert(listing(whDir(dDocT).resolve("epoch=0")) == epoch0Before,
      "the committed epoch-0 partition was rewritten on restart")
    val epochs = spark.table(dDocT).select("epoch").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(epochs.subsetOf((0L until DedupIngest.NumChunks.toLong).toSet),
      s"unexpected epochs $epochs")

    // band fan-out consistency: every kept doc contributes its bands once
    assert(spark.table(dBandT).count() ==
      ids.length.toLong * graft.functions.TextFeatures.NumBands,
      "delta band rows != kept docs × bands")

    DedupIngest.deleteRecursively(srcDir)
    DedupIngest.deleteRecursively(ckptDir)
  }
}
