package graft

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.queries.EmbeddingQueries

/** `e_index_append` contract points the DuckDB oracle cannot see
  * (VERDICT r9 #4): the batch lands as an APPEND of new files into the
  * existing cid= partition directories (no base file rewritten), the
  * ingest is once-only (a second run changes neither files nor results),
  * and the corpus is never re-assigned (postings hold exactly
  * n_base + n_batch rows after repeated runs).
  */
class IndexAppendSpec extends SparkSpecBase {

  /** relative path -> (size, mtime) for every data file under root
    * (excludes `_SUCCESS` and `.crc` bookkeeping, which Spark rewrites
    * on every commit).
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

  test("e_index_append: append-not-rewrite, ingest-once, corpus never re-assigned") {
    // base build only — no batch rows yet (force a fresh store: another
    // suite sharing the JVM, e.g. ReseedApplySpec, may already have
    // appended the batch)
    EmbeddingQueries.dropIncStore(spark, Sf0001)
    val (_, postT) = EmbeddingQueries.incIndexTables(spark, Sf0001)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val postDir = Paths.get(wh, postT.toLowerCase)
    val before = listing(postDir)
    assert(before.nonEmpty, "base build produced no postings files")
    val nBase = spark.table(postT).count()
    assert(
      spark.table(postT)
        .filter(col("vec_id") >= EmbeddingQueries.IncBatchOffset).isEmpty,
      "base build must not contain batch rows")

    // first run: appends the batch, reports drift
    val r1 = EmbeddingQueries.queries("e_index_append")(spark, Sf0001)
      .collect().toSeq
    val after1 = listing(postDir)

    // every base file survives the append byte-identical (same size and
    // mtime — the append wrote new files, it did not rewrite the corpus)
    before.foreach { case (f, meta) =>
      assert(after1.get(f).contains(meta),
        s"base postings file $f rewritten by append: $meta -> ${after1.get(f)}")
    }
    val newFiles = after1.keySet -- before.keySet
    assert(newFiles.nonEmpty, "append added no files")
    // new files land INSIDE existing cid= partition dirs — the append
    // extends partitions, it does not invent a new layout
    val basePartitions = before.keySet.map(_.takeWhile(_ != '/'))
    newFiles.foreach { f =>
      val part = f.takeWhile(_ != '/')
      assert(part.startsWith("cid="), s"appended file outside partition layout: $f")
      assert(basePartitions.contains(part),
        s"appended file $f created partition $part the base build did not have " +
          "(every cell contains its own centroid, so batch cells must pre-exist)")
    }

    // postings = base ∪ batch exactly — the corpus was never re-assigned
    val nBatch = spark.table(postT)
      .filter(col("vec_id") >= EmbeddingQueries.IncBatchOffset).count()
    assert(nBatch > 0, "no batch rows appended")
    assert(spark.table(postT).count() == nBase + nBatch,
      "postings row count != n_base + n_batch: duplicate or lost assignments")

    // second run: ingest-once — same files, same report
    val r2 = EmbeddingQueries.queries("e_index_append")(spark, Sf0001)
      .collect().toSeq
    assert(listing(postDir) == after1, "second run modified the postings files")
    assert(r2 == r1, "second run changed the drift report")
  }

  test("e_index_reseed: diameter-split plan invariants") {
    val rows = EmbeddingQueries.queries("e_index_reseed")(spark, Sf0001).collect()
    assert(rows.length == 5, "budgeted worst-first plan is always top-5 cells")
    val (_, postT) = EmbeddingQueries.incIndexTables(spark, Sf0001)
    val posts = spark.table(postT)
    rows.foreach { r =>
      val cid = r.getAs[Long]("cid")
      val nM = r.getAs[Long]("n_members")
      val nA = r.getAs[Long]("n_a")
      val nB = r.getAs[Long]("n_b")
      // the split partitions the cell exactly, and keeping the old
      // centroid as sub-seed A guarantees the fit never degrades
      assert(nA + nB == nM, s"cell $cid: split does not partition members")
      assert(nA >= 1, s"cell $cid: the kept centroid must retain itself")
      assert(
        r.getAs[Long]("new_cos_e6_sum") >= r.getAs[Long]("old_cos_e6_sum"),
        s"cell $cid: diameter split degraded the fit")
      // sub-seed B is a real member of the cell, and the member count
      // matches the persisted postings partition
      val members = posts.filter(col("cid") === cid)
      assert(members.count() == nM, s"cell $cid: n_members != postings")
      assert(
        members.filter(col("vec_id") === r.getAs[Long]("seed_b")).count() == 1,
        s"cell $cid: seed_b is not a member")
    }
  }
}
