package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Bucketized overlap join: exact pair set (vs the naive theta join),
  * exactly-once emission across buckets, and plan shape.
  */
class RangeJoinSpec extends SparkSpecBase {

  private def mkIntervals(n: Int, seed: Long) = {
    // deterministic pseudo-random closed intervals over [0, 10000) with
    // lengths 1..~3000 — many span multiple 500-wide buckets
    spark
      .range(n)
      .select(
        col("id"),
        (hash(col("id") + seed).cast("long") % 10000 + 10000) % 10000 as "s"
      )
      .select(
        col("id"),
        col("s"),
        (col("s") + (hash(col("id") * 31 + seed).cast("long") % 3000 + 3000) % 3000 + 1).as("e")
      )
  }

  test("overlapJoin equals the naive theta join, each pair exactly once") {
    val l = mkIntervals(200, 1).select(col("id").as("lid"), col("s").as("ls"), col("e").as("le"))
    val r = mkIntervals(150, 2).select(col("id").as("rid"), col("s").as("rs"), col("e").as("re"))

    val got = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 500)
      .select("lid", "rid")

    val naive = l
      .join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid")

    // exactly-once: counts must match pairwise, not just as sets
    val gotCnt = got.groupBy("lid", "rid").count()
    val naiveCnt = naive.groupBy("lid", "rid").count()
    assert(gotCnt.except(naiveCnt).isEmpty && naiveCnt.except(gotCnt).isEmpty)
    assert(got.count() == naive.count())
  }

  test("extraCond filters inside the join (anti-symmetric self overlap)") {
    val base = mkIntervals(100, 3)
    val l = base.select(col("id").as("u1"), col("s").as("s1"), col("e").as("e1"))
    val r = base.select(col("id").as("u2"), col("s").as("s2"), col("e").as("e2"))
    val got = RangeJoin
      .overlapJoin(l, r, "s1", "e1", "s2", "e2", 500, Some(col("u1") < col("u2")))
      .select("u1", "u2")
    val naive = l
      .join(r, col("u1") < col("u2") && col("s1") <= col("e2") && col("s2") <= col("e1"))
      .select("u1", "u2")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    assert(got.count() == naive.count())
  }

  test("plan is an equi-join on the bucket id, not a nested loop") {
    val l = mkIntervals(50, 4).select(col("id").as("lid"), col("s").as("ls"), col("e").as("le"))
    val r = mkIntervals(50, 5).select(col("id").as("rid"), col("s").as("rs"), col("e").as("re"))
    val plan = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", 500)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("long-tail outlier intervals split into chunks and still equal the theta join exactly once") {
    // VERDICT r5 ask #3. Long-tail mix: ~90% short intervals (1..400,
    // mostly within one 100-wide bucket) and ~10% pathological outliers
    // spanning up to the full [0, 40000) line — with bucketWidth=100 and
    // chunk cap 8, an outlier covers up to 400 buckets = 50 chunks, so
    // the two-level tiling is exercised hard (every chunk-boundary
    // alignment case, last-chunk truncation, chunk count ≫ 1).
    def mkLongTail(n: Int, seed: Long) = spark
      .range(n)
      .select(
        col("id"),
        (hash(col("id") + seed).cast("long") % 40000 + 40000) % 40000 as "s",
        (hash(col("id") * 17 + seed).cast("long") % 10 + 10) % 10 as "kind",
        (hash(col("id") * 31 + seed).cast("long") % 40000 + 40000) % 40000 as "len"
      )
      .select(
        col("id"),
        col("s"),
        (col("s") + when(col("kind") === 0, col("len")).otherwise(col("len") % 400) + 1).as("e")
      )

    val l = mkLongTail(150, 11).select(col("id").as("lid"), col("s").as("ls"), col("e").as("le"))
    val r = mkLongTail(120, 12).select(col("id").as("rid"), col("s").as("rs"), col("e").as("re"))

    val got = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 100,
        extraCond = None, maxBucketsPerChunk = 8L)
      .select("lid", "rid")
    val naive = l
      .join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid")

    // exactly-once across chunk AND bucket replication: per-pair counts
    // must match, not just the distinct pair sets
    val gotCnt = got.groupBy("lid", "rid").count()
    val naiveCnt = naive.groupBy("lid", "rid").count()
    assert(gotCnt.except(naiveCnt).isEmpty && naiveCnt.except(gotCnt).isEmpty)
    assert(got.count() == naive.count())
  }

  test("intervals with negative bounds join exactly (floor bucketing, not truncation)") {
    // bounds straddle 0: truncate-toward-zero bucketing would make the
    // bucket at 0 twice as wide and double-count or miss pairs there
    val l = mkIntervals(120, 6)
      .select(col("id").as("lid"), (col("s") - 5000).as("ls"), (col("e") - 5000).as("le"))
    val r = mkIntervals(90, 7)
      .select(col("id").as("rid"), (col("s") - 5000).as("rs"), (col("e") - 5000).as("re"))
    val got = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 500)
      .select("lid", "rid")
    val naive = l
      .join(r, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid")
    assert(got.count() == naive.count())
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("tuneKnobs: auto-knob join result equals the hand-knob join exactly") {
    // VERDICT r10 #1: whatever (width, salt) the tuner picks, the pair
    // multiset must be the hand-tuned join's — knobs are performance-only
    val l = mkIntervals(200, 21).select(col("id").as("lid"), col("s").as("ls"), col("e").as("le"))
    val r = mkIntervals(150, 22).select(col("id").as("rid"), col("s").as("rs"), col("e").as("re"))
    val k = RangeJoin.tuneKnobs(l, "ls", "le")
    assert(k.bucketWidth >= 1)
    assert(k.saltFactor >= 1 && k.saltFactor <= 16)
    val auto = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re",
        bucketWidth = k.bucketWidth, saltFactor = k.saltFactor)
      .select("lid", "rid")
    val hand = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 500)
      .select("lid", "rid")
    val ac = auto.groupBy("lid", "rid").count()
    val hc = hand.groupBy("lid", "rid").count()
    assert(ac.except(hc).isEmpty && hc.except(ac).isEmpty)
    assert(auto.count() == hand.count())
  }

  test("tuneKnobs: width tracks the median interval length") {
    // constant-length intervals: the median IS the length, so the tuned
    // width must equal it exactly (approx_percentile is exact on a
    // single-valued distribution)
    val iv = spark.range(500).select(
      col("id"),
      (col("id") * 37 % 10000).as("s"),
      (col("id") * 37 % 10000 + 120).as("e"))
    assert(RangeJoin.tuneKnobs(iv, "s", "e").bucketWidth == 120L)
  }

  test("tuneKnobs: skewed fixture chooses salt > 1, uniform fixture salt == 1") {
    // skew: 90% of intervals piled into one diurnal-peak instant, the
    // rest spread wide. This is the fixture a p99-occupancy rule missed
    // (the hot bucket is <1% of buckets, so p99 sat in the empty tail);
    // the work-skew rule B·max²/Σc² must salt it
    val skewed = spark.range(1000).select(
      col("id"),
      when(col("id") % 10 =!= 0, lit(42L))
        .otherwise(col("id") * 1000).as("s"))
      .select(col("id"), col("s"), (col("s") + 100).as("e"))
    val ks = RangeJoin.tuneKnobs(skewed, "s", "e")
    assert(ks.saltFactor > 1, s"skew fixture must salt, got $ks")

    // uniform: one interval per start bucket — p99/mean == 1, salt == 1
    val uniform = spark.range(1000).select(
      col("id"),
      (col("id") * 100).as("s"),
      (col("id") * 100 + 99).as("e"))
    val ku = RangeJoin.tuneKnobs(uniform, "s", "e")
    assert(ku.saltFactor == 1, s"uniform fixture must not salt, got $ku")
  }

  test("hot-bucket salting is invisible to results: salted == unsalted, exactly once") {
    // every (left, right) pair must still meet exactly once — in the
    // canonical bucket at the LEFT row's salt group — so per-pair counts
    // match the unsalted join for a salt factor that exceeds 1 and does
    // not divide the bucket count
    val l = mkIntervals(200, 8).select(col("id").as("lid"), col("s").as("ls"), col("e").as("le"))
    val r = mkIntervals(150, 9).select(col("id").as("rid"), col("s").as("rs"), col("e").as("re"))
    val salted = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 500,
        extraCond = None, saltFactor = 3)
      .select("lid", "rid")
    val unsalted = RangeJoin
      .overlapJoin(l, r, "ls", "le", "rs", "re", bucketWidth = 500)
      .select("lid", "rid")
    val sc = salted.groupBy("lid", "rid").count()
    val uc = unsalted.groupBy("lid", "rid").count()
    assert(sc.except(uc).isEmpty && uc.except(sc).isEmpty)
    assert(salted.count() == unsalted.count())
  }
}
