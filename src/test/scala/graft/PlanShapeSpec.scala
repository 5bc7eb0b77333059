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

  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan =
        try q(spark, Sf0001).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"queries planning CartesianProduct: $offenders")
  }

  test("every registered query has a DuckDB oracle except the documented rows-only set") {
    // the driver records a weaker rows-only check for any `queries` key
    // missing from `oracleSql` — so a typo'd oracle key would silently
    // downgrade a query's correctness gate. Rows-only by design:
    // a8_duration_sec (wall-clock can't hash-match an oracle) and
    // m_mjpeg_frame_stats (lossy JPEG output is codec-implementation-
    // defined; its tolerance contract is asserted in MediaSpec instead).
    val rowsOnlyByDesign = Set("a8_duration_sec", "m_mjpeg_frame_stats")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyByDesign
    assert(missing.isEmpty, s"queries silently downgraded to rows-only: $missing")
    // and no orphan oracle for a query that doesn't exist
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a registered query: $orphans")
  }
}
