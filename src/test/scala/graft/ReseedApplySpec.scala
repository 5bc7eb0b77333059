package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.queries.EmbeddingQueries

/** `e_index_reseed_apply` contract points the DuckDB oracle cannot see
  * (VERDICT r10 #2): the apply is a SURGICAL dynamic partition overwrite
  * — exactly the 5 planned cid dirs plus the new seed-B dirs carry files
  * from the rewrite job, every other partition's clone files are
  * untouched — it is apply-once, it loses no members, and the realized
  * fit read back from the store equals the plan's prediction.
  */
class ReseedApplySpec extends SparkSpecBase {

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

  /** cid-dir -> set of write-job UUIDs in its file names. The clone is
    * one Spark write job (one UUID everywhere); the dynamic overwrite is
    * a second job — so "which dirs were rewritten" is readable straight
    * off the filenames.
    */
  private def jobUuidsByDir(root: Path): Map[Long, Set[String]] = {
    val re = "part-\\d+-([0-9a-f]{8}-[0-9a-f-]{27})".r
    listing(root).keys
      .filter(_.startsWith("cid="))
      .groupBy(f => f.takeWhile(_ != '/').stripPrefix("cid=").toLong)
      .map { case (cid, files) =>
        cid -> files.flatMap(f => re.findFirstMatchIn(f).map(_.group(1))).toSet
      }
  }

  test("e_index_reseed_apply: surgical partition rewrite, apply-once, realized == planned") {
    val rows = EmbeddingQueries.queries("e_index_reseed_apply")(spark, Sf0001)
      .collect()
    assert(rows.length == 5, "apply reports one row per planned cell")

    val planned = rows.map(_.getAs[Long]("cid")).toSet
    val bCells = rows.filter(_.getAs[Long]("n_b") > 0)
      .map(_.getAs[Long]("seed_b")).toSet
    rows.foreach { r =>
      val cid = r.getAs[Long]("cid")
      // realized-from-store == planned-from-base, in the same arithmetic
      assert(
        r.getAs[Long]("realized_new_cos_e6_sum") ==
          r.getAs[Long]("planned_new_cos_e6_sum"),
        s"cell $cid: store read-back diverges from the plan")
      assert(r.getAs[Long]("gain_e6") >= 0, s"cell $cid: apply degraded the fit")
      assert(r.getAs[Long]("n_a") >= 1, s"cell $cid: kept centroid lost itself")
    }

    val (centT, postT) = EmbeddingQueries.incIndexTables(spark, Sf0001)
    val (rsdCentT, rsdPostT) = EmbeddingQueries.ensureReseedApplied(spark, Sf0001)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val rsdDir = Paths.get(wh, rsdPostT.toLowerCase)

    // exactly the planned A dirs + populated B dirs carry rewrite-job
    // files; every other dir still holds only clone-job files
    val uuids = jobUuidsByDir(rsdDir)
    val untouched = uuids.view.filterKeys(c => !planned(c) && !bCells(c)).toMap
    assert(untouched.nonEmpty, "fixture must have cells outside the plan")
    val cloneUuids = untouched.values.flatten.toSet
    val rewritten = uuids.collect {
      case (cid, us) if (us -- cloneUuids).nonEmpty => cid
    }.toSet
    assert(rewritten == planned ++ bCells,
      s"rewritten dirs $rewritten != planned A dirs $planned + B dirs $bCells")

    // no member lost or duplicated: the serving store re-partitions the
    // same vector multiset the base store holds
    assert(spark.table(rsdPostT).count() == spark.table(postT).count(),
      "apply changed the member count")
    assert(
      spark.table(rsdPostT).select("vec_id").exceptAll(
        spark.table(postT).select("vec_id")).isEmpty,
      "apply changed the member id multiset")
    // untouched cells serve exactly the base rows
    val plannedSeq = (planned ++ bCells).toSeq
    assert(
      spark.table(rsdPostT).filter(!col("cid").isin(plannedSeq: _*))
        .exceptAll(spark.table(postT).filter(!col("cid").isin(plannedSeq: _*)))
        .isEmpty,
      "a cell outside the plan changed content")
    // centroid serving table = base centroids + the populated seed-B rows
    assert(
      spark.table(rsdCentT).count() ==
        spark.table(centT).count() +
        rows.count(r => r.getAs[Long]("seed_b") != r.getAs[Long]("cid")),
      "centroid table gained the wrong number of sub-seeds")

    // apply-once: a second call must not touch a single file
    val before = listing(rsdDir)
    EmbeddingQueries.ensureReseedApplied(spark, Sf0001)
    val r2 = EmbeddingQueries.queries("e_index_reseed_apply")(spark, Sf0001)
      .collect()
    assert(listing(rsdDir) == before, "second apply modified the serving store")
    assert(r2.toSeq == rows.toSeq, "second apply changed the report")
  }
}
