package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.queries.DedupQueries

/** Persisted dedup-index contract points the DuckDB oracle cannot see
  * (VERDICT r11 #1 — the dedup twin of IndexAppendSpec):
  *
  *  - a PROBE is read-only: every base-store file survives byte-identical
  *    (the probe answers off the store; it must never rebuild or touch it);
  *  - probe verdicts ≡ the inline d_incremental_dedup verdicts on the same
  *    plant (the store is an optimization, not a semantics change);
  *  - an APPEND writes O(batch) DELTA files only — the corpus-sized base
  *    tables are never rewritten (or even copied), and the delta holds
  *    exactly the batch docs whose verdict is 'new';
  *  - ingest-once: a second append changes neither files nor results.
  */
class DedupIndexSpec extends SparkSpecBase {

  /** relative path -> (size, CRC32-of-contents) for every data file
    * under root (excludes `_SUCCESS` / `.crc` bookkeeping, rewritten per
    * commit). Content hash, not mtime (ADVICE r12): an overwrite
    * producing an identical-size file within one mtime granule would
    * falsely pass a size+mtime check — CRC over the bytes cannot.
    */
  private def listing(root: Path): Map[String, (Long, Long)] = {
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

  test("dedup index: probe is read-only, ≡ inline verdicts; append is delta-only and ingest-once") {
    // fresh base store (another suite sharing the JVM may have built it)
    DedupQueries.dropDixStore(spark, Sf0001)
    val (docT, bandT) = DedupQueries.dedupIndexTables(spark, Sf0001, rebuild = false)
    val docBefore = listing(whDir(docT))
    val bandBefore = listing(whDir(bandT))
    assert(docBefore.nonEmpty && bandBefore.nonEmpty, "base build wrote no files")

    // probe ≡ inline incremental dedup (same plant, same output contract)
    val probe = DedupQueries.queries("d_index_probe")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val inline = DedupQueries.queries("d_incremental_dedup")(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(probe == inline,
      s"store probe verdicts diverge from inline: $probe vs $inline")

    // the probe touched nothing in the store
    assert(listing(whDir(docT)) == docBefore, "probe modified the doc table")
    assert(listing(whDir(bandT)) == bandBefore, "probe modified the band table")

    // first append: delta tables appear, base untouched
    val r1 = DedupQueries.queries("d_index_append")(spark, Sf0001).collect()
    assert(r1.length == 1)
    val row = r1.head
    val nTotal = row.getAs[Long]("n_docs_total")
    val nApp = row.getAs[Long]("n_appended")
    val nBase = spark.table(docT).count()
    assert(nTotal == nBase + nApp,
      s"serving total $nTotal != base $nBase + appended $nApp")
    val nNew = inline.collectFirst { case ("new", n, _) => n }.getOrElse(0L)
    assert(nApp == nNew, s"appended $nApp docs but verdict said $nNew new")
    assert(listing(whDir(docT)) == docBefore, "append rewrote the base doc table")
    assert(listing(whDir(bandT)) == bandBefore, "append rewrote the base band table")

    // delta holds exactly the 'new' docs (ids and band fan-out)
    val (_, _, dDocT, dBandT) = DedupQueries.ensureDedupAppended(spark, Sf0001)
    val newIdSum = inline.collectFirst { case ("new", _, c) => c }.getOrElse(0L)
    val deltaIdSum = spark.table(dDocT).agg(sum(col("doc_id"))).first().getLong(0)
    assert(deltaIdSum == newIdSum, "delta doc ids != 'new'-verdict ids")
    assert(spark.table(dBandT).count() == nApp * graft.functions.TextFeatures.NumBands,
      "delta band rows != appended docs × bands")

    // ingest-once: a re-run changes neither files nor the audit row
    val dDocBefore = listing(whDir(dDocT))
    val dBandBefore = listing(whDir(dBandT))
    val r2 = DedupQueries.queries("d_index_append")(spark, Sf0001).collect()
    assert(r2.toSeq == r1.toSeq, "second append changed the audit row")
    assert(listing(whDir(dDocT)) == dDocBefore, "second append rewrote delta docs")
    assert(listing(whDir(dBandT)) == dBandBefore, "second append rewrote delta bands")
    assert(listing(whDir(docT)) == docBefore, "second append touched the base store")
  }

  test("compaction rewrites only delta-touched partitions; sources untouched; run-once") {
    DedupQueries.dropDixStore(spark, Sf0001)
    val (_, _, dDocT, dBandT) = DedupQueries.ensureDedupAppended(spark, Sf0001)

    // --- stepwise: fold a RESTRICTED delta (dp/bp < 8) so the
    // untouched-partition assertion has real teeth (the full plant delta
    // touches nearly every mod-64 partition at this SF)
    val (cDocT, cBandT) = DedupQueries.cloneCompactTables(spark, Sf0001)
    val tDocT = "graft_test_cmp_ddoc"
    val tBandT = "graft_test_cmp_dband"
    spark.table(dDocT).filter(col("dp") < 8)
      .write.mode("overwrite").partitionBy("dp").saveAsTable(tDocT)
    spark.table(dBandT).filter(col("bp") < 8)
      .write.mode("overwrite").partitionBy("bp").saveAsTable(tBandT)
    val touchedDp = spark.table(tDocT).select("dp").distinct()
      .collect().map(_.getInt(0)).toSet
    val touchedBp = spark.table(tBandT).select("bp").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(touchedDp.nonEmpty && touchedDp.size < DedupQueries.DixParts,
      s"restricted delta must touch a strict subset of partitions, got $touchedDp")
    val beforeDocs = spark.table(cDocT).select("doc_id").collect().map(_.getLong(0)).sorted
    val cloneDocBefore = listing(whDir(cDocT))
    val cloneBandBefore = listing(whDir(cBandT))

    DedupQueries.foldDeltasInto(spark, cDocT, cBandT, tDocT, tBandT).collect()

    def changedDirs(before: Map[String, (Long, Long)], root: Path): Set[String] = {
      val after = listing(root)
      ((before.keySet -- after.keySet) ++ (after.keySet -- before.keySet) ++
        before.keySet.intersect(after.keySet).filter(k => before(k) != after(k)))
        .map(_.split('/').head)
    }
    val docChanged = changedDirs(cloneDocBefore, whDir(cDocT))
    val bandChanged = changedDirs(cloneBandBefore, whDir(cBandT))
    assert(docChanged == touchedDp.map(p => s"dp=$p"),
      s"doc partitions rewritten $docChanged != delta-touched $touchedDp")
    assert(bandChanged == touchedBp.map(p => s"bp=$p"),
      s"band partitions rewritten $bandChanged != delta-touched $touchedBp")

    // folded content = clone-before ∪ restricted delta (ids)
    val deltaIds = spark.table(tDocT).select("doc_id").collect().map(_.getLong(0))
    val afterDocs = spark.table(cDocT).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(afterDocs.toSeq == (beforeDocs ++ deltaIds).sorted.toSeq,
      "folded doc ids != base ∪ delta ids")

    Seq(tDocT, tBandT).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // --- registered query: sources untouched, audit consistent, run-once
    val (docT2, bandT2, _, _) = DedupQueries.ensureDedupAppended(spark, Sf0001)
    val srcDoc = listing(whDir(docT2))
    val srcBand = listing(whDir(bandT2))
    val srcDDoc = listing(whDir(dDocT))
    val c1 = DedupQueries.queries("d_index_compact")(spark, Sf0001).collect()
    assert(c1.length == 1)
    val a = c1.head
    assert(a.getAs[Long]("n_docs_total") ==
      a.getAs[Long]("n_base") + a.getAs[Long]("n_delta_folded"),
      "post-fold total != base + folded delta")
    assert(a.getAs[Long]("delta_ratio_e6") >= DedupQueries.CompactRatioE6,
      "plant delta below the fold threshold — the compaction path was not exercised")
    assert(listing(whDir(docT2)) == srcDoc, "compaction touched the base doc table")
    assert(listing(whDir(bandT2)) == srcBand, "compaction touched the base band table")
    assert(listing(whDir(dDocT)) == srcDDoc, "compaction touched the delta tables")
    val c2 = DedupQueries.queries("d_index_compact")(spark, Sf0001).collect()
    assert(c2.toSeq == c1.toSeq, "second compaction run changed the audit row")
  }
}
