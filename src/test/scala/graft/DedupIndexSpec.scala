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

  /** relative path -> (size, mtime) for every data file under root
    * (excludes `_SUCCESS` / `.crc` bookkeeping, rewritten per commit).
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
        .map(p =>
          (root.relativize(p).toString,
            (Files.size(p), Files.getLastModifiedTime(p).toMillis)))
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
}
