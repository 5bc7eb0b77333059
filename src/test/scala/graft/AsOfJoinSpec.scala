package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics (vs a naive theta-join oracle) + plan shape. */
class AsOfJoinSpec extends SparkSpecBase {

  private def mkSides() = {
    val session = spark
    import session.implicits._
    // left: 300 probes over 10 keys; right: 150 reference points, with
    // planted (key, ts) duplicates and keys that have no right rows at all.
    val left = spark
      .range(300)
      .select(
        (col("id") % 10).as("k"),
        (col("id") * 7 % 500).as("ts"),
        col("id").as("probe_id")
      )
    val right = spark
      .range(150)
      .select(
        (col("id") % 7).as("k"), // keys 7..9 never appear on the right
        (col("id") * 13 % 500).as("ts"),
        (col("id") * 3).as("v")
      )
      // planted duplicate (key, ts) rows with differing payloads
      .union(Seq((0L, 13L, 999L), (0L, 13L, 998L)).toDF("k", "ts", "v"))
    (left, right)
  }

  test("asOf matches the naive theta-join + argmax oracle (incl. no-match keys)") {
    val (left, right) = mkSides()
    val got = AsOfJoin
      .asOf(left, right, "k", "ts", "ts", Seq("v"))
      .select("probe_id", "asof_v")

    // Naive oracle: all (ts' <= ts) pairs, take payload of max (ts', v) —
    // same dup resolution (largest payload wins at equal ts') as asOf.
    val pairs = left
      .join(
        right.select(col("k"), col("ts").as("rts"), col("v")),
        left("k") === right("k") && col("rts") <= left("ts"),
        "left"
      )
      .groupBy("probe_id")
      .agg(max(struct(col("rts"), col("v"))).as("best"))
      .select(col("probe_id"), col("best.v").as("asof_v"))

    assert(got.count() == left.count()) // left semantics: every probe kept
    assert(got.except(pairs).isEmpty && pairs.except(got).isEmpty)
  }

  test("asOf plan has no cartesian/nested-loop join and at most 2 shuffles") {
    val (left, right) = mkSides()
    val plan = AsOfJoin
      .asOf(left, right, "k", "ts", "ts", Seq("v"))
      .queryExecution
      .executedPlan
      .toString
    // The union+window pattern must never degrade to a pair-exploding join:
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // one Exchange for the right-side (k, ts) pre-reduce, one for the
    // window's partitionBy(k) — anything more means a lost partitioning
    assert("Exchange".r.findAllIn(plan).size <= 2)
  }
}
