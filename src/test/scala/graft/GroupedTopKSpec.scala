package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GroupedTopK

/** Custom grouped-top-k operator: result equivalence with the window
  * formulation, partial/final plan shape, and bounded shuffle.
  */
class GroupedTopKSpec extends SparkSpecBase {

  private def orders = spark.read.parquet(s"$Sf0001/orders.parquet")

  test("topK equals the row_number window formulation (total order)") {
    val got = GroupedTopK
      .topK(
        orders,
        Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3
      )
      .select("o_custkey", "o_orderkey", "o_totalprice")

    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = orders
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")

    assert(got.count() == expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("plan is partial heap -> exchange -> final heap, no window sort") {
    val df = GroupedTopK.topK(
      orders,
      Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc),
      k = 3
    )
    df.collect() // finalize the AQE plan before inspecting it
    // AQE prints Final and Initial plans; inspect the final one only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // SparkPlan.nodeName strips the Exec suffix: two GroupedTopK nodes
    // (partial + final) with the ENSURE_REQUIREMENTS exchange between
    // them, and no per-group window sort anywhere
    assert("GroupedTopK".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Exchange hashpartitioning"))
    assert(!plan.contains("Window"))
    assert(plan.indexOf("GroupedTopK") < plan.indexOf("Exchange hashpartitioning"))
  }

  test("k larger than every group returns all rows") {
    val small = orders.limit(200)
    val got = GroupedTopK
      .topK(small, Seq("o_custkey"), Seq(col("o_orderkey").asc), k = 1000)
      .count()
    assert(got == 200)
  }

  test("near-unique key under a tiny partial-key cap: flushes keep the result exact") {
    val session = spark
    import session.implicits._
    // 50K rows, ~unique keys (every key appears 1-2×), cap forced to 64:
    // the partial pass must flush its heaps hundreds of times and degrade
    // toward pass-through instead of holding O(keys·k) (VERDICT r4 #2).
    // Duplicated keys land in DIFFERENT partitions (i and i+25000 ranges
    // interleave under repartition), so the final pass still merges.
    val df = spark
      .range(50000)
      .select((col("id") % 30000).as("k"), (col("id") * 17 % 101).as("v"), col("id").as("uid"))
      .repartition(8)
    val old = spark.conf.getOption("spark.graft.topk.maxPartialKeys")
    spark.conf.set("spark.graft.topk.maxPartialKeys", "64")
    try {
      val got = GroupedTopK
        .topK(df, Seq("k"), Seq(col("v").desc, col("uid").asc), k = 2)
        .select("k", "v", "uid")
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("uid").asc)
      val expected = df
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 2)
        .select("k", "v", "uid")
      assert(got.count() == expected.count())
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxPartialKeys", v)
        case None => spark.conf.unset("spark.graft.topk.maxPartialKeys")
      }
    }
  }

  test("capFlushes metric fires when the partial-key cap forces flushes (and stays 0 otherwise)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import graft.plans.GroupedTopKExec

    def partialExecs(df: org.apache.spark.sql.DataFrame): Seq[GroupedTopKExec] = {
      df.collect()
      val finalPlan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def walk(p: SparkPlan): Seq[GroupedTopKExec] =
        p.collect {
          case q: QueryStageExec => walk(q.plan)
          case g: GroupedTopKExec if g.partial => Seq(g)
        }.flatten
      walk(finalPlan)
    }

    val df = spark
      .range(20000)
      .select((col("id") % 15000).as("k"), (col("id") * 13 % 97).as("v"), col("id").as("uid"))
      .repartition(4)
    def run() = GroupedTopK.topK(df, Seq("k"), Seq(col("v").desc, col("uid").asc), k = 2)

    val old = spark.conf.getOption("spark.graft.topk.maxPartialKeys")
    spark.conf.set("spark.graft.topk.maxPartialKeys", "32")
    try {
      val flushed = partialExecs(run()).map(_.metrics("capFlushes").value).sum
      // ~15k near-unique keys over 4 tasks at cap 32 → many forced flushes
      assert(flushed > 10, s"expected cap-forced flushes, saw $flushed")
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxPartialKeys", v)
        case None => spark.conf.unset("spark.graft.topk.maxPartialKeys")
      }
    }
    // default cap: no flush, and numOutputRows is populated
    val execs = partialExecs(run())
    assert(execs.map(_.metrics("capFlushes").value).sum == 0)
    assert(execs.map(_.metrics("numOutputRows").value).sum > 0)
  }

  test("property: equals the window formulation on random skewed data, several seeds and ks") {
    val session = spark
    import session.implicits._
    for (seed <- Seq(7L, 42L, 1234L); k <- Seq(1, 2, 5)) {
      val rnd = new scala.util.Random(seed)
      // skewed keys (hot key 0), duplicate order values to stress ties,
      // sizes around the heap capacity
      val data = (0 until 3000).map { i =>
        val key = if (rnd.nextInt(3) == 0) 0L else rnd.nextInt(40).toLong
        (key, rnd.nextInt(25).toLong, i.toLong)
      }
      val df = data.toDF("k", "v", "uid").repartition(7)
      val got = GroupedTopK
        .topK(df, Seq("k"), Seq(col("v").desc, col("uid").asc), k)
        .select("k", "v", "uid")
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("uid").asc)
      val expected = df
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .select("k", "v", "uid")
      assert(
        got.count() == expected.count() &&
          got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"mismatch at seed=$seed k=$k"
      )
    }
  }

  test("measured: heap shuffle is bounded and the plan needs no sort at all") {
    val session = spark
    import session.implicits._
    // 200K rows, 500 keys, 8 input partitions: the window form must
    // shuffle every row; the heap form at most k*keys*partitions
    val big = spark
      .range(200000)
      .select((col("id") % 500).as("k"), (col("id") * 31 % 9973).as("v"), col("id").as("uid"))
      .repartition(8)
      .localCheckpoint() // pin the input: measured plans contain ONLY their own exchange

    def shuffledRecords(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val finalPlan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // AQE prunes query-stage children — recurse into each stage's plan
      def allExchanges(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] =
        p.collect {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allExchanges(q.plan)
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
            Seq(s) ++ allExchanges(s.child)
        }.flatten
      allExchanges(finalPlan)
        .map(_.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L))
        .sum
    }

    val topkDf =
      GroupedTopK.topK(big, Seq("k"), Seq(col("v").desc, col("uid").asc), 3).select("k", "v", "uid")
    val topkShuffled = shuffledRecords(topkDf)
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("uid").asc)
    val windowDf =
      big.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3).select("k", "v", "uid")
    val windowShuffled = shuffledRecords(windowDf)

    // both plans bound the shuffle to ~k*keys*partitions — Spark 3.5+'s
    // InferWindowGroupLimit gives the window form a partial group-limit
    // too (credit where due). The operator's measured edge is the SORT:
    // the window plan full-sorts every input partition (200K rows,
    // O(n log n)) before its partial limit, then sorts again reduce-side;
    // the heap operator never sorts anything (O(n log k) heap updates).
    assert(topkShuffled <= 3L * 500 * 8, s"topk shuffled $topkShuffled")
    assert(windowShuffled <= 4L * 500 * 8, s"window shuffled $windowShuffled")
    def finalPlanString(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Sort ".r.findAllIn(finalPlanString(windowDf)).size >= 2)
    assert(!finalPlanString(topkDf).contains("Sort "))
  }
}
