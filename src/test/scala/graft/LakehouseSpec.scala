package graft

import org.apache.spark.sql.functions._

import graft.queries.LakehouseQueries

/** Invariants for the lakehouse table-management tier (optimizer stats,
  * equi-depth histogram, snapshot diff, expectations audit) and the
  * dup-graph PageRank — all on sf0.001.
  */
class LakehouseSpec extends SparkSpecBase {

  private def orders = spark.read.parquet(s"$Sf0001/orders.parquet")

  test("table stats: one row per column, consistent with a direct scan") {
    val rows = LakehouseQueries.queries("o_table_stats")(spark, Sf0001).collect()
    assert(rows.length == 5)
    val nRows = spark.read.parquet(s"$Sf0001/lineitem.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows)
      assert(r.getAs[Long]("n_nulls") == 0L) // lineitem is fully populated
      val ndv = r.getAs[Long]("ndv")
      assert(ndv >= 1L && ndv <= nRows)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
    // spot-check one column against an independent aggregation
    val q = rows.find(_.getAs[String]("column_name") == "l_quantity").get
    val direct = spark.read
      .parquet(s"$Sf0001/lineitem.parquet")
      .agg(
        count_distinct(col("l_quantity")),
        min(col("l_quantity")),
        max(col("l_quantity"))
      )
      .head()
    assert(q.getAs[Long]("ndv") == direct.getLong(0))
    assert(q.getAs[Double]("min_val") == direct.getDouble(1))
    assert(q.getAs[Double]("max_val") == direct.getDouble(2))
  }

  test("equi-depth histogram: buckets partition the value domain and the rows") {
    val rows = LakehouseQueries.queries("o_equidepth_histogram")(spark, Sf0001)
      .collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty && rows.length <= 16)
    val total = orders.count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach(r => assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents")))
    // value ranges are disjoint and ordered: each bucket starts strictly
    // after the previous one ends (assignment is monotone in the value)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"))
      case _ =>
    }
    // equi-depth: exact-quantile boundaries keep buckets near total/16
    assert(rows.map(_.getAs[Long]("n")).max <= total / 4)
  }

  test("snapshot diff: per-change-type counts match the planted mutation moduli") {
    val rows = LakehouseQueries.queries("o_snapshot_diff")(spark, Sf0001).collect()
    val byType = rows.map(r => r.getAs[String]("change_type") -> r).toMap
    assert(byType.keySet == Set("insert", "delete", "update", "unchanged"))
    val nIns = orders.filter(col("o_orderkey") % 97 === 0).count()
    val nDel = orders.filter(col("o_orderkey") % 113 === 0).count()
    val nUpd =
      orders.filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 97 =!= 0).count()
    val nAll = orders.count()
    assert(byType("insert").getAs[Long]("n") == nIns)
    assert(byType("delete").getAs[Long]("n") == nDel)
    assert(byType("update").getAs[Long]("n") == nUpd)
    assert(byType("unchanged").getAs[Long]("n") == nAll - nIns - nUpd)
    // every update was exactly a +1.00 price in the old snapshot
    assert(byType("update").getAs[Long]("delta_cents_sum") == -100L * nUpd)
    // deletes contribute only old-side cents → negative delta
    assert(byType("delete").getAs[Long]("delta_cents_sum") < 0L)
  }

  test("expectations audit: planted violation counts are recovered per check") {
    val rows = LakehouseQueries.queries("o_expectations_audit")(spark, Sf0001).collect()
    assert(rows.length == 5)
    val byCheck =
      rows.map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations")).toMap
    // recompute the planted counts independently (dups double-count their
    // mutation class; key 0 hits %101 before %331 — same CASE order)
    def keys(m: Int) = orders.filter(col("o_orderkey") % m === 0)
    val dupW = when(col("o_orderkey") % 997 === 0, 2L).otherwise(1L)
    def planted(m: Int, excl: Int = 0): Long = {
      val base = keys(m).filter(
        if (excl == 0) lit(true) else col("o_orderkey") % excl =!= 0
      )
      base.agg(sum(dupW)).head().getLong(0)
    }
    assert(byCheck("completeness_custkey") == planted(101))
    assert(byCheck("domain_orderstatus") == planted(251))
    assert(byCheck("range_totalprice_positive") == planted(503))
    assert(byCheck("uniqueness_orderkey") == keys(997).count())
    assert(byCheck("referential_custkey") == planted(331, excl = 101))
    rows.foreach(r =>
      assert(r.getAs[Boolean]("passed") == (r.getAs[Long]("n_violations") == 0L))
    )
    // the planted corruption makes every check fail — the audit must see it
    assert(rows.forall(!_.getAs[Boolean]("passed")))
  }

  test("record linkage: unchanged names match exact, corrupted names match at lev 1") {
    val rows = LakehouseQueries.queries("o_record_linkage")(spark, Sf0001).collect()
    val byLev = rows.map(r => r.getAs[Int]("match_lev") -> r).toMap
    val custs = spark.read.parquet(s"$Sf0001/customer.parquet")
    val dirtyKeys = custs.filter(col("c_custkey") % 4 === 0)
    val nExact = dirtyKeys.filter(col("c_custkey") % 3 === 2).count()
    val nTypo = dirtyKeys.filter(col("c_custkey") % 3 =!= 2).count()
    // blocking is complete by construction (exact attributes unchanged),
    // so the true master is always a candidate: no -1 rows
    assert(!byLev.contains(-1))
    // unchanged names are unique → lev 0 is exactly the untouched third,
    // and each matches its own master (identical name ⇒ same key)
    assert(byLev(0).getAs[Long]("n") == nExact)
    val exactKeySum =
      dirtyKeys.filter(col("c_custkey") % 3 === 2).agg(sum("c_custkey")).head().getLong(0)
    assert(byLev(0).getAs[Long]("master_checksum") == exactKeySum)
    assert(byLev(0).getAs[Long]("dirty_checksum") == exactKeySum + 900000L * nExact)
    // every corrupted name is lev ≥ 1 from every 18-char master (deletion
    // shortens, substitution plants a char no master ends with) and lev 1
    // from its own master → the rest of the registry lands at lev 1
    assert(byLev(1).getAs[Long]("n") == nTypo)
    assert(rows.map(_.getAs[Long]("n")).sum == nExact + nTypo)
  }

  test("ohlc bars: bounds hold and open/close agree with an independent sort") {
    val rows = LakehouseQueries.queries("o_ohlc_bars")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("low_cents"), r.getAs[Long]("high_cents"))
      assert(lo <= hi)
      assert(r.getAs[Long]("open_cents") >= lo && r.getAs[Long]("open_cents") <= hi)
      assert(r.getAs[Long]("close_cents") >= lo && r.getAs[Long]("close_cents") <= hi)
      val vol = r.getAs[Long]("volume")
      val turn = r.getAs[Long]("turnover_cents")
      assert(vol >= 1L && turn >= vol * lo && turn <= vol * hi)
    }
    // cross-check one bar against a driver-side sort of its raw events
    val sample = rows.maxBy(_.getAs[Long]("volume"))
    val ev = graft.queries.Q
      .events(spark, Sf0001)
      .filter(
        col("event_type") === sample.getAs[String]("event_type") &&
          date_trunc("DAY", col("ts")) === lit(sample.getAs[java.sql.Timestamp]("day"))
      )
      .filter(col("value").isNotNull)
      .select(col("ts"), col("event_id"), round(col("value") * 100).cast("long").as("c"))
      .collect()
      // sort at full precision: getTime is ms-truncated, getNanos carries
      // the complete fractional second
      .sortBy(r => (r.getTimestamp(0).getTime / 1000, r.getTimestamp(0).getNanos, r.getLong(1)))
    assert(ev.head.getLong(2) == sample.getAs[Long]("open_cents"))
    assert(ev.last.getLong(2) == sample.getAs[Long]("close_cents"))
    assert(ev.length == sample.getAs[Long]("volume"))
  }

  test("pareto frontier: matches a driver-side brute-force sweep exactly") {
    val rows = LakehouseQueries.queries("o_pareto_frontier")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val prices = rows.map(_.getAs[Long]("price_cents"))
    val qtys = rows.map(_.getAs[Long]("qty_cents"))
    // frontier structure: strictly increasing price, strictly decreasing qty
    assert(prices.zip(prices.tail).forall { case (a, b) => a < b })
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a > b })
    // brute force on the raw pairs (sf0.001 is small enough to collect)
    val pairs = spark.read
      .parquet(s"$Sf0001/lineitem.parquet")
      .select(
        round(col("l_extendedprice") * 100).cast("long").as("pc"),
        round(col("l_quantity") * 100).cast("long").as("qc")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val perPrice = pairs.groupBy(_._1).map { case (pc, ps) =>
      val mq = ps.map(_._2).min
      (pc, mq, ps.count(_._2 == mq).toLong)
    }.toSeq.sortBy(_._1)
    var best = Long.MaxValue
    val expected = perPrice.flatMap { case (pc, mq, n) =>
      if (mq < best) { best = mq; Some((pc, mq, n)) } else None
    }
    assert(rows.map(r =>
      (r.getAs[Long]("price_cents"), r.getAs[Long]("qty_cents"), r.getAs[Long]("n_rows"))
    ).toSeq == expected)
  }

  test("time travel: each version snapshot equals a direct filter of the log") {
    val rows = LakehouseQueries.queries("o_time_travel_log")(spark, Sf0001).collect()
    assert(rows.map(_.getAs[Long]("version")).toSeq == Seq(10L, 25L, 39L))
    Seq(10L, 25L, 39L).foreach { v =>
      val live = orders
        .select(
          col("o_orderkey").as("fid"),
          (col("o_orderkey") % 40).as("va"),
          when(
            col("o_orderkey") % 3 === 0,
            (col("o_orderkey") % 40) + (col("o_orderkey") % 7) + 1L
          ).as("vr")
        )
        .filter(col("va") <= v && (col("vr").isNull || col("vr") > v))
      val r = rows.find(_.getAs[Long]("version") == v).get
      assert(r.getAs[Long]("n_files") == live.count())
      assert(r.getAs[Long]("file_checksum") == live.agg(sum("fid")).head().getLong(0))
    }
  }

  test("cohort retention: offset-0 rows are full cohorts and cover every user") {
    val rows = LakehouseQueries.queries("o_cohort_retention")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0L)
      assert(r.getAs[Long]("n_users") >= 1L)
      assert(r.getAs[Long]("retention_e6") <= 1000000L)
    }
    val offset0 = rows.filter(_.getAs[Long]("week_offset") == 0L)
    // every user is active in their own first week → retention exactly 1
    offset0.foreach(r => assert(r.getAs[Long]("retention_e6") == 1000000L))
    val nUsers = graft.queries.Q
      .events(spark, Sf0001)
      .select(col("user_id"))
      .distinct()
      .count()
    assert(offset0.map(_.getAs[Long]("n_users")).sum == nUsers)
  }

  test("transition matrix: per-row probabilities floor-sum to one") {
    val rows = LakehouseQueries.queries("o_transition_matrix")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).values.foreach { rs =>
      val total = rs.map(_.getAs[Long]("prob_e6")).sum
      // integer floors: Σ ≤ 1e6 and loses < 1 per to-type
      assert(total <= 1000000L && total > 1000000L - rs.length)
      rs.foreach(r => assert(r.getAs[Long]("n") >= 1L))
    }
  }

  test("pagerank: descending e12 ranks, distinct parts, irregular graph separates ranks") {
    val rows = LakehouseQueries.queries("o_pagerank_copurchase")(spark, Sf0001).collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getAs[Long]("rank_e12"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("part_id")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("deg") >= 1L)
      // every rank ≥ the teleport base (0.15 · SCALE / N) > 0
      assert(r.getAs[Long]("rank_e12") > 0L)
    }
    // the co-purchase graph is degree-irregular, so centrality must
    // actually separate nodes (a regular graph would tie every rank —
    // the degenerate case this query's graph was chosen to avoid)
    assert(ranks.distinct.length > 1)
    // a top-20 hub should be far better-connected than the median part
    assert(rows.head.getAs[Long]("deg") > 1L)
  }

  test("lakehouse tier plans contain no CartesianProduct") {
    // every join in this tier is keyed (equi-join), broadcast-small-side,
    // or a crossJoin against a 1-row aggregate (which plans as a broadcast
    // nested loop over one row — O(n), fine). An actual CartesianProduct
    // is the plan-shape failure that turns any of these into n² at scale,
    // e.g. if a join condition stopped being recognized as an equi-join.
    Seq(
      "o_table_stats",
      "o_equidepth_histogram",
      "o_snapshot_diff",
      "o_expectations_audit",
      "o_pagerank_copurchase",
      "o_record_linkage",
      "o_pareto_frontier",
      "o_cohort_retention",
      "o_transition_matrix",
      "o_time_travel_log",
      "o_ohlc_bars"
    ).foreach { q =>
      val df = LakehouseQueries.queries(q)(spark, Sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(
        !plan.contains("CartesianProduct"),
        s"$q plan contains a CartesianProduct:\n$plan"
      )
    }
  }

  test("compaction plan: manifest totals and bin counts reconcile with the data") {
    val rows = LakehouseQueries.queries("o_compaction_plan")(spark, Sf0001).collect()
    val li = spark.read.parquet(s"$Sf0001/lineitem.parquet")
    assert(rows.map(_.getAs[Long]("rows_total")).sum == li.count())
    val manifest = li
      .groupBy(
        date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM-dd").as("m"),
        (col("l_orderkey") % 64).as("f")
      )
      .count()
      .collect()
      .groupBy(_.getAs[String]("m"))
    assert(rows.length == manifest.size)
    rows.foreach { r =>
      val files = manifest(r.getAs[String]("part_month"))
      val counts = files.sortBy(_.getAs[Long]("f")).map(_.getAs[Long]("count"))
      assert(r.getAs[Long]("n_input_files") == counts.length.toLong)
      assert(r.getAs[Long]("rows_total") == counts.sum)
      assert(r.getAs[Long]("n_small_files") == counts.count(_ < 2048L).toLong)
      // exact bin recompute: exclusive prefix sum div capacity
      val bins = counts.scanLeft(0L)(_ + _).init.map(_ / 4096L).distinct.length.toLong
      assert(r.getAs[Long]("n_output_files") == bins)
      assert(bins <= counts.length.toLong && bins <= counts.sum / 4096L + 1L)
    }
  }

  test("vacuum plan: three-way partition matches a driver-side replay of the live-range rule") {
    val row = LakehouseQueries.queries("o_vacuum_plan")(spark, Sf0001).collect().head
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0))
    val vRm = keys.map(k => k -> (if (k % 3 == 0) Some((k % 40) + (k % 7) + 1) else None)).toMap
    val liveHead = keys.count(k => vRm(k).forall(_ > 39)).toLong
    val vac = keys.filter(k => vRm(k).exists(_ <= 30))
    assert(row.getAs[Long]("n_files_total") == keys.length.toLong)
    assert(row.getAs[Long]("n_live_head") == liveHead)
    assert(row.getAs[Long]("n_vacuumable") == vac.length.toLong)
    assert(
      row.getAs[Long]("n_time_travel_only") ==
        keys.length.toLong - liveHead - vac.length.toLong
    )
    assert(row.getAs[Long]("reclaim_checksum") == vac.sum)
    // no vacuumable file may be visible in any retained snapshot (v >= 30):
    // live range [v_add, v_rm) must end at or before the horizon
    vac.foreach(k => assert(vRm(k).get <= 30))
  }

  test("psi drift: non-negativity, top-bin bound, and cohort totals") {
    val rows = LakehouseQueries.queries("o_psi_drift")(spark, Sf0001).collect()
    assert(rows.length == 5, "one row per pinned event type")
    // PSI = Σ (p−q)·ln(p/q) is a sum of NON-negative terms — a negative
    // psi (or a top-bin contribution exceeding the total) means the
    // smoothing, the dense bin grid, or the e9 quantization broke
    rows.foreach { r =>
      val psi = r.getAs[Long]("psi_e9")
      val top = r.getAs[Long]("top_bin_psi_e9")
      assert(psi >= 0L, s"negative PSI for ${r.getAs[String]("event_type")}")
      assert(top >= 0L && top <= psi, "top bin contribution outside [0, psi]")
      val b = r.getAs[Int]("top_bin")
      assert(b >= 0 && b <= 9)
    }
    // the two cohorts partition the events table exactly
    val nEvents = graft.queries.Q.events(spark, Sf0001).count()
    assert(rows.map(r => r.getAs[Long]("n_base") + r.getAs[Long]("n_curr")).sum == nEvents)
  }
}
