package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** Soundness + effectiveness of the explicit bloom-filter semi-join prune
  * (`functions/BloomFunctions`, registered query `o_bloom_pruned_join`).
  *
  * Soundness: `graft_might_contain` has NO false negatives — every fact
  * row that truly joins must survive the prune (the survivor set is a
  * superset of the semi-join). Effectiveness: with a selective build side
  * the prune must actually drop rows BEFORE the join (otherwise it's dead
  * weight in the plan). Exact results are covered by the driver oracle
  * (`o_bloom_pruned_join` vs the plain join); this spec pins the two
  * properties the oracle can't see.
  */
class BloomPruneSpec extends SparkSpecBase {

  test("bloom prune keeps every true match and drops non-matching fact rows") {
    BloomFunctions.register(spark)
    val orders = spark.read.parquet(s"$Sf0001/orders.parquet")
    val lineitem = spark.read.parquet(s"$Sf0001/lineitem.parquet")

    val sel = orders
      .filter(col("o_orderdate").between("1996-03-01", "1996-03-31"))
      .select(col("o_orderkey"))
    val nSel = sel.count()
    assert(nSel > 0, "selective month must match some orders")

    sel.createOrReplaceTempView("bloomspec_sel")
    lineitem.select(col("l_orderkey")).createOrReplaceTempView("bloomspec_fact")
    // might_contain demands a constant/scalar-subquery filter operand
    val pruned = spark.sql(
      """SELECT l_orderkey FROM bloomspec_fact
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(o_orderkey), CAST(1048576 AS BIGINT))
        |   FROM bloomspec_sel),
        |  xxhash64(l_orderkey))""".stripMargin
    )

    val trueMatches = lineitem
      .join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"))

    // no false negatives: every truly-joining row survives the prune
    val lost = trueMatches.exceptAll(pruned).count()
    assert(lost == 0, s"bloom prune lost $lost true matches")

    // effectiveness: the prune dropped most of the non-matching fact
    val nFact = lineitem.count()
    val nPruned = pruned.count()
    val nTrue = trueMatches.count()
    assert(nPruned < nFact, "prune must drop some rows")
    assert(nPruned >= nTrue, "prune output is a superset of the semi-join")
    // with a 1 MB bitset over a few dozen keys the FP rate is ~0: the
    // pruned set should be within 1% of the exact semi-join
    assert(
      nPruned - nTrue <= math.max(1L, nFact / 100),
      s"unexpectedly weak prune: $nPruned survivors vs $nTrue true matches of $nFact"
    )
  }

  test("bloom aggregate merges across partitionings deterministically") {
    BloomFunctions.register(spark)
    import spark.implicits._
    val a = (1L to 1000L).toDF("k")
      .agg(expr("graft_bloom_agg(xxhash64(k), CAST(4096 AS BIGINT))").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val b = (1L to 1000L).toDF("k").repartition(7)
      .agg(expr("graft_bloom_agg(xxhash64(k), CAST(4096 AS BIGINT))").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // bit-OR merge is commutative/associative: the built filter is
    // partition-order independent — safe as a partial aggregate at scale
    assert(java.util.Arrays.equals(a, b))
  }
}
