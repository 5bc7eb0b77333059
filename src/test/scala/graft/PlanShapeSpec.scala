package graft

/** Suite-wide plan-shape invariant: no registered query may plan a
  * CartesianProduct. Every join in the engine is keyed, broadcast
  * small-side, or a crossJoin against a 1-row aggregate (which plans as a
  * one-row BroadcastNestedLoopJoin — O(n)); an actual CartesianProduct is
  * the silent n² failure mode if a join condition ever stops being
  * recognized as an equi-join (e.g. a type-mismatch cast breaking
  * predicate analysis). This runs the PLANNER over all 153 queries —
  * eager builds (localCheckpoints in the iterative queries) execute at
  * sf0.001 scale, so the sweep stays cheap.
  */
class PlanShapeSpec extends SparkSpecBase {

  import org.apache.spark.sql.execution.{ExpandExec, GenerateExec, LocalTableScanExec, SparkPlan, UnaryExecNode}
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
  import org.apache.spark.sql.execution.window.WindowExec
  import org.apache.spark.sql.catalyst.optimizer.BuildLeft

  /** Provably ≤1 output row, by plan structure: a global (no-grouping)
    * aggregate; any row-preserving/reducing unary node above one; a
    * non-full-outer join of two such subtrees (the 1-row × 1-row
    * crossJoin chains the audit queries use — a FULL outer of two
    * unmatched 1-row sides emits 2 rows, so it is excluded); a ≤1-row
    * literal scan. Row-MULTIPLYING unaries (Generate = explode, Expand =
    * grouping sets) are explicitly NOT row-preserving.
    */
  private def leOneRow(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case _: GenerateExec | _: ExpandExec => false
    case j: BaseJoinExec =>
      j.joinType != org.apache.spark.sql.catalyst.plans.FullOuter &&
        leOneRow(j.left) && leOneRow(j.right)
    case l: LocalTableScanExec => l.rows.lengthCompare(1) <= 0
    case u: UnaryExecNode => leOneRow(u.child)
    case _ => false
  }

  /** Queries allowed an UNPARTITIONED Window, each with the structural
    * reason its window input is O(buckets), not O(rows) — the silent
    * single-task bottleneck this lint exists to catch. Six vetted
    * entries, each histogram- or post-limit-bounded (the window's input
    * is O(buckets) aggregate rows, never the corpus). A new query
    * showing up here must either partition its window or argue its way
    * into this map.
    */
  private val unpartitionedWindowWhitelist: Map[String, String] = Map(
    "o_pareto_frontier" ->
      "prefix-min over exactly 32 quantile-bucket aggregate rows (the hierarchical rewrite, LakehouseQueries)",
    "t_token_budget_select" ->
      "cumulative sum over the ≤1001-row checkpointed quality-bucket histogram",
    "t_bpe_merge_step" ->
      "row_number over the 20-row post-limit top-pairs frame",
    "t_zipf_fit" ->
      "row_number over the ≤1000-row post-limit frequency frame (priced in VERDICT r9 #7)",
    "o_skew_diagnostics" ->
      "cumulative count over the group-SIZE histogram (rows = distinct size values, not keys)",
    "q_exact_median_order" ->
      "cumulative count over the $1000-wide price-bucket histogram (value-domain bounded)"
  )

  /** Queries allowed a BroadcastNestedLoopJoin whose build side is NOT
    * structurally ≤1 row, each with the reason the build is bounded
    * small (index-metadata scale, never corpus scale). Everything else
    * planning such a BNLJ fails — a keyed join regressing to BNLJ via a
    * broken equi-join condition is the next silent n² after
    * CartesianProduct.
    */
  private val bnljWhitelist: Map[String, String] = Map(
    // ANN tier: the deliberate probe×k / query×corpus cross joins. Build
    // sides are the broadcast centroid table (O(√n) rows, sized by
    // Q.cachedRowCount) or the fixed ≤10-vector query frame — the
    // documented IVF assignment pattern, not a regressed keyed join.
    "e_bruteforce_topk" -> "fixed 10-row query frame × corpus (the declared brute-force baseline)",
    "e_binary_topk" -> "fixed query frame × sign-bit corpus",
    "e_int8_quantized_topk" -> "fixed query frame × int8 corpus",
    "e_matryoshka_topk" -> "fixed query frame × prefix-sliced corpus",
    "e_hard_negatives" -> "fixed probe frame × corpus, then per-anchor top-k",
    "e_rrf_fusion" -> "fixed query frame × corpus under two rankers",
    "e_semantic_dedup" -> "O(√n) centroid broadcast for bucketed near-dup",
    "e_centroid_silhouette" -> "O(√n) centroid broadcast (a/b means per point)",
    "e_ivf_topk" -> "O(√n) centroid broadcast: nearest-cell argmax",
    "e_ivf_recall_at_k" -> "centroid broadcast + exact baseline on 10 queries",
    "e_ivf_balance_stats" -> "centroid broadcast: cell assignment audit",
    "e_kmeans_ivf_topk" -> "Lloyd-fitted O(√n) centroid broadcast",
    "e_ndcg_at_k" -> "fixed query frame × corpus + ideal ranking",
    "e_pq_recall_at_k" -> "128-row PQ codebook broadcast + 10-query exact baseline",
    "e_index_search" -> "stored O(√n) centroid table broadcast (2-probe cell routing)",
    // 1-row-by-construction builds the prover can't see through a
    // localCheckpoint (RDDScanExec has no row-count evidence):
    "o_psi_drift" -> "checkpointed 1-row bin-bounds frames (PSI clamp, LakehouseQueries)",
    "t_quality_lr_fit" -> "checkpointed 1-row weight vector per fixed-point iteration"
  )

  test("no registered query plans a CartesianProduct, an unbounded BNLJ, or an unvetted unpartitioned Window") {
    val cartesian = Seq.newBuilder[String]
    val unprovenBnlj = Seq.newBuilder[String]
    val unpartWindow = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val plan =
        try q(spark, Sf0001).queryExecution.sparkPlan
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (plan.toString.contains("CartesianProduct")) cartesian += name
      // a BNLJ whose BUILD side is not provably ≤1 row is the next
      // silent n² after CartesianProduct (a keyed join regressing to
      // BNLJ via a broken equi-join condition plans exactly this way)
      plan.foreach {
        case b: BroadcastNestedLoopJoinExec =>
          val build = if (b.buildSide == BuildLeft) b.left else b.right
          if (!leOneRow(build)) unprovenBnlj += name
        case w: WindowExec if w.partitionSpec.isEmpty => unpartWindow += name
        case _ =>
      }
    }
    assert(cartesian.result().isEmpty,
      s"queries planning CartesianProduct: ${cartesian.result()}")
    val bnljNames = unprovenBnlj.result().distinct.toSet
    val badBnlj = bnljNames -- bnljWhitelist.keySet
    assert(badBnlj.isEmpty,
      s"BroadcastNestedLoopJoin with a build side neither provably ≤1 row nor vetted bounded-small: $badBnlj")
    val windowNames = unpartWindow.result().distinct.toSet
    val badWindow = windowNames -- unpartitionedWindowWhitelist.keySet
    assert(badWindow.isEmpty,
      s"unpartitioned Window outside the vetted O(buckets) whitelist: $badWindow")
    // the whitelists must not go stale: every entry still has to NAME a
    // query that actually plans the whitelisted shape
    val staleB = bnljWhitelist.keySet -- bnljNames
    assert(staleB.isEmpty, s"BNLJ whitelist entries no longer planning one: $staleB")
    val staleW = unpartitionedWindowWhitelist.keySet -- windowNames
    assert(staleW.isEmpty, s"window whitelist entries no longer planning one: $staleW")
  }

  test("every registered query has a DuckDB oracle except the documented rows-only set") {
    // the driver records a weaker rows-only check for any `queries` key
    // missing from `oracleSql` — so a typo'd oracle key would silently
    // downgrade a query's correctness gate. Rows-only by design:
    // a8_duration_sec (wall-clock can't hash-match an oracle) and
    // m_mjpeg_frame_stats (lossy JPEG output is codec-implementation-
    // defined; its tolerance contract is asserted in MediaSpec and its
    // decode correctness is anchored by the independent scalar decoder
    // in TwoDecoderSpec).
    val rowsOnlyByDesign = Set("a8_duration_sec", "m_mjpeg_frame_stats")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(missing.isEmpty, s"queries silently downgraded to rows-only: $missing")
    // and no orphan oracle for a query that doesn't exist
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a registered query: $orphans")
  }
}
