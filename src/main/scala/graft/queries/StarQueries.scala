package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema join/aggregate suite over the driver's TPC-H-style tables.
  *
  * The reference has no joins (SURVEY.md §2.4 — its only multi-collection
  * interaction is envelope composition), so this suite is the scale tier:
  * the queries a user of a real analytics engine runs over the same star
  * schema. Shapes follow the public TPC-H query patterns (pricing summary,
  * shipping priority, local-supplier volume, returned items) adapted to the
  * driver's column subset.
  *
  * Scale design notes (100 TB):
  *  - Dimension tables (region 5, nation 25, supplier sf*1K) are broadcast —
  *    no shuffle of the fact side for those joins.
  *  - customer⋈orders and orders⋈lineitem are fact-fact: left to AQE, which
  *    picks shuffled-hash/sort-merge and handles skew at runtime.
  *  - All money aggregates use exact integer-cents arithmetic (see
  *    [[Q.cents]]): associative, partial-aggregation-friendly, and
  *    bit-identical across engines and partitionings. At extreme scale the
  *    Long cents sums for the 6-decimal charge column would need
  *    decimal(38,6); noted inline.
  *  - Every query ends in a groupBy/topK whose result is small — nothing
  *    materializes the fact tables to the driver.
  */
object StarQueries {
  import Q._

  /** sum of a 2-decimal money column, in cents (exact Long). */
  private def sumCents(c: org.apache.spark.sql.Column) = sum(round(c * 100).cast("long"))

  /** per-row revenue extprice*(1-disc) in 10^-4 units (exact Long). */
  private def revUnits =
    (round(col("l_extendedprice") * 100).cast("long") *
      round((lit(1) - col("l_discount")) * 100).cast("long"))

  /** SQL mirror of [[revUnits]].
    *
    * Overflow note (ADVICE r3): DuckDB sums BIGINT into HUGEINT and
    * `CAST(... AS BIGINT)` RAISES past 2^63, while Spark's non-ANSI Long
    * sum wraps silently — so at scale factors where a charge sum nears
    * 2^63 (~9.2e18, i.e. ~9e12 dollars of e6-units — around TPC-H
    * sf ~1000 for a single group) the oracle errors out rather than
    * reporting a comparable mismatch. Fine at the sf0.1 bench scale; the
    * documented 100 TB switch is decimal(38,6) on the Spark side (see
    * q1), which matches DuckDB's HUGEINT sums exactly.
    */
  private val revUnitsSql =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round((1 - l_discount) * 100) AS BIGINT)"

  val queries: Map[String, Fn] = Map(
    // Q1-shape pricing summary: single fact scan, partial+final hash agg,
    // 6 aggregates in one pass; the filter reaches the parquet scan as a
    // pushed predicate.
    "q1_pricing_summary" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sumCents(col("l_extendedprice")).as("sum_base_price_cents"),
          sum(revUnits).as("sum_disc_price_e4"),
          // charge = extprice*(1-disc)*(1+tax): 6 decimals → 10^-6 units.
          // Long holds ~9.2e18; at 100 TB switch this column to
          // decimal(38,6) — the switch is registered and oracle-proven
          // as q1_pricing_summary_decimal below.
          sum(revUnits * round((lit(1) + col("l_tax")) * 100).cast("long"))
            .as("sum_charge_e6"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(sum(round(col("l_extendedprice") * 100).cast("long")) / count(lit(1)) / 100.0, 2)
            .as("avg_price"),
          round(avg(col("l_discount")), 2).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")),

    // The registered decimal(38,6) money path (VERDICT r5 ask #5): the
    // 100 TB overflow switch the q1 comment documents, proven against
    // DuckDB's HUGEINT-exact sums. Per-row values stay the exact integer
    // units (long-safe: ≤ ~2e11 per row); only the SUM — the one
    // aggregate that can pass 2^63 per group at extreme SF — runs on
    // decimal(38,0), then the point shifts by an exact decimal
    // multiplication (no division, no doubles: both engines' decimal
    // multiply is exact, and 10^-k point shifts are scale moves). Output
    // is the decimal(38,6) rendered as a string because the comparison
    // harnesses coerce decimals to float64 (2^53 — losing exactly the
    // precision this path exists to keep); the string IS the full
    // 38-digit value. Partial aggregation still applies (decimal sum is
    // associative); the cost vs the Long path is the wider agg buffer.
    "q1_pricing_summary_decimal" -> ((s, dir) => {
      val pointShift = (c: org.apache.spark.sql.Column, shift: String) =>
        (c * lit(new java.math.BigDecimal(shift))).cast("decimal(38,6)").cast("string")
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long").cast("decimal(38,0)")).as("bp_c"),
          sum(revUnits.cast("decimal(38,0)")).as("dp_e4"),
          sum((revUnits * round((lit(1) + col("l_tax")) * 100).cast("long")).cast("decimal(38,0)"))
            .as("ch_e6"),
          count(lit(1)).as("count_order")
        )
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          pointShift(col("bp_c"), "0.01").as("sum_base_price_dec"),
          pointShift(col("dp_e4"), "0.0001").as("sum_disc_price_dec"),
          pointShift(col("ch_e6"), "0.000001").as("sum_charge_dec"),
          col("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Q3-shape shipping priority: segment-filtered customer (broadcastable
    // at test SF; at 100 TB AQE picks shuffled-hash) ⋈ orders ⋈ lineitem,
    // top-10 revenue. Ends in TakeOrderedAndProject — no full sort.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = table(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg((sum(revUnits) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5-shape local-supplier volume: five-way join; region/nation/supplier
    // broadcast (dims), fact-fact joins left to AQE. The c_nationkey =
    // s_nationkey condition rides on the join, not a post-filter.
    "q5_local_supplier_volume" -> ((s, dir) => {
      val asia = table(s, dir, "region").filter(col("r_name") === "ASIA")
      val nat = table(s, dir, "nation")
      val sup = table(s, dir, "supplier")
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(
          table(s, dir, "lineitem").withColumnRenamed("l_orderkey", "lo_key"),
          col("o_orderkey") === col("lo_key")
        )
        .join(
          broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey")
        )
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(revUnits) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q10-shape returned items: per-customer lost revenue on returned
    // lineitems, top 20. nation broadcast; the groupBy key includes the
    // customer attributes so no second join after the agg.
    "q10_returned_items" -> ((s, dir) => {
      val nat = table(s, dir, "nation")
      table(s, dir, "customer")
        .join(
          table(s, dir, "orders")
            .filter(
              col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1999-01-01").cast("timestamp")
            ),
          col("c_custkey") === col("o_custkey")
        )
        .join(
          table(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey")
        )
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg((sum(revUnits) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Window function: top-3 orders per customer by price. One shuffle on
    // the partition key, rank inside the window, no driver materialization.
    "q_window_top_orders" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          col("o_totalprice"),
          rank().over(w).as("rnk")
        )
        .filter(col("rnk") <= 3)
        .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
    }),

    // Rollup: grouping-set aggregation over status × priority with
    // subtotal + grand-total rows (Catalyst plans one Expand + hash agg).
    "q_rollup_order_stats" -> ((s, dir) =>
      table(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sumCents(col("o_totalprice")).as("total_cents")
        )
        .orderBy(
          col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first
        )),

    // SQL set operations: customers active in BOTH 1995 and 1996
    // (INTERSECT) who then churned — no orders in 1997+ (EXCEPT).
    // Catalyst plans INTERSECT as a left-semi and EXCEPT as a left-anti
    // join over the deduplicated key sets; each branch's year predicate
    // pushes to its own scan.
    "q_setops_churned" -> ((s, dir) =>
      s.sql(
        s"""(SELECT o_custkey FROM parquet.`$dir/orders.parquet`
           | WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           |   AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
           | INTERSECT
           | SELECT o_custkey FROM parquet.`$dir/orders.parquet`
           | WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
           |EXCEPT
           |SELECT o_custkey FROM parquet.`$dir/orders.parquet`
           | WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |ORDER BY o_custkey""".stripMargin
      )),

    // GROUPING SETS — the general form behind rollup/cube: three chosen
    // aggregation levels (status × priority, priority alone, grand
    // total) in ONE pass (Spark expands the sets into a single Expand +
    // hash aggregate — one shuffle, not one job per level).
    // grouping_id() disambiguates levels whose key columns are NULL.
    "q_grouping_sets_orders" -> ((s, dir) => {
      table(s, dir, "orders").createOrReplaceTempView("gs_orders")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          |  count(*) AS n_orders,
          |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
          |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
      )
    }),

    // Q7-shape volume shipping between two nation pairs: the customer and
    // supplier nation joins are both broadcast; the pair predicate rides
    // on the joined frame; one groupBy on (nation pair, year).
    "q7_volume_shipping" -> ((s, dir) => {
      val n1 = table(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val n2 = table(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      table(s, dir, "lineitem")
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .filter(
          (col("cust_nation") === "NATION_1" && col("supp_nation") === "NATION_2") ||
            (col("cust_nation") === "NATION_2" && col("supp_nation") === "NATION_1")
        )
        .groupBy(col("cust_nation"), col("supp_nation"), year(col("l_shipdate")).as("l_year"))
        .agg((sum(revUnits) / 10000.0).as("revenue"))
        .orderBy(col("cust_nation"), col("supp_nation"), col("l_year"))
    }),

    // Q19-shape disjunctive pricing: OR-of-conjunctions across the
    // lineitem⋈part join — Catalyst extracts the common p_partkey join
    // key and pushes the brand/size disjunction to the part scan.
    "q19_disjunctive_pricing" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30))
        )
        .agg(
          (sum(revUnits) / 10000.0).as("revenue"),
          count(lit(1)).as("n_items")
        )),

    // Q14-shape promo revenue share: conditional aggregation over one
    // month of shipments joined to part; the share is an exact-integer
    // ratio (both sums in 10^-4 units) divided once at the end.
    "q14_promo_share" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1998-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-04-01").cast("timestamp")
        )
        .join(table(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", revUnits).otherwise(lit(0L)))
            .as("promo_units"),
          sum(revUnits).as("total_units")
        )
        .select(
          round(
            col("promo_units").cast("double") * 100.0 / col("total_units").cast("double"),
            6
          ).as("promo_share_pct"),
          (col("total_units").cast("double") / 10000.0).as("total_revenue")
        )),

    // CUBE over returnflag × linestatus: all four grouping-set levels in
    // one Expand + hash agg pass.
    "q_cube_lineitem_stats" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(round(col("l_quantity")).cast("long")).as("sum_qty")
        )
        .orderBy(
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first
        )),

    // Q2-shape min-cost supplier via a correlated scalar subquery. The
    // testdata has no partsupp table, so supply cost is derived from
    // lineitem: per (partkey, suppkey), the minimum unit price in exact
    // cents divided by quantity (bit-portable: cents is an exact BIGINT,
    // the single division is the same IEEE op in both engines, and min is
    // order-independent). Expressed in SQL so Catalyst's subquery
    // decorrelation runs: RewriteCorrelatedScalarSubquery turns the
    // per-part min into an aggregate + join on partkey — the plan you'd
    // hand-write, derived from the declarative form. `parquet.`path``
    // table refs keep the query self-contained (no temp-view session
    // state, VERDICT r3 #6). At 100 TB: ps is one shuffle of lineitem on
    // (partkey, suppkey); the decorrelated min-agg reuses ps; dims are
    // broadcast; the result is LIMIT-bounded.
    "q2_min_cost_supplier" -> ((s, dir) => {
      // the derived part-supplier frame feeds both the outer query and
      // the correlated scalar subquery — CTE inlining would run the
      // lineitem aggregate twice, so materialize it once (the
      // decorrelation under test is the correlated min over ps2, which
      // is untouched)
      table(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .agg(min(expr("CAST(round(l_extendedprice * 100) AS BIGINT) / l_quantity")).as("cost"))
        .localCheckpoint()
        .createOrReplaceTempView("q2_ps")
      s.sql(
        s"""SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name, ps.cost AS min_cost
           |FROM q2_ps ps
           |JOIN parquet.`$dir/part.parquet` p ON p.p_partkey = ps.partkey
           |JOIN parquet.`$dir/supplier.parquet` s ON s.s_suppkey = ps.suppkey
           |JOIN parquet.`$dir/nation.parquet` n ON n.n_nationkey = s.s_nationkey
           |JOIN parquet.`$dir/region.parquet` r ON r.r_regionkey = n.n_regionkey
           |WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
           |  AND ps.cost = (
           |    SELECT min(ps2.cost)
           |    FROM q2_ps ps2
           |    JOIN parquet.`$dir/supplier.parquet` s2 ON s2.s_suppkey = ps2.suppkey
           |    JOIN parquet.`$dir/nation.parquet` n2 ON n2.n_nationkey = s2.s_nationkey
           |    JOIN parquet.`$dir/region.parquet` r2 ON r2.r_regionkey = n2.n_regionkey
           |    WHERE ps2.partkey = ps.partkey AND r2.r_name = 'EUROPE')
           |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
           |LIMIT 100""".stripMargin
      )
    }),

    // Q4-shape order-priority check via EXISTS: declared as a correlated
    // EXISTS subquery; Catalyst's RewritePredicateSubquery plans it as a
    // LEFT SEMI join of orders against the date-shifted lineitem
    // predicate — no per-row subquery execution, and the orders date
    // filter pushes to the scan. Exercises the predicate-subquery
    // rewrite path the way q2 exercises scalar-subquery decorrelation.
    "q4_order_priority_exists" -> ((s, dir) =>
      s.sql(
        s"""SELECT o_orderpriority, count(*) AS order_count
           |FROM parquet.`$dir/orders.parquet`
           |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
           |  AND EXISTS (
           |    SELECT 1 FROM parquet.`$dir/lineitem.parquet`
           |    WHERE l_orderkey = o_orderkey
           |      AND l_shipdate > o_orderdate + INTERVAL 90 DAYS)
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin
      )),

    // Q18-shape large-volume customers: the IN subquery (orders whose
    // total quantity exceeds the threshold) rewrites to a semi join
    // against an aggregated lineitem; quantity sums are exact BIGINT
    // (round-to-long as in q1) so group totals and the HAVING edge are
    // bit-identical across engines. Top-20 bounded output.
    "q18_large_volume_customers" -> ((s, dir) => {
      val big = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("tq"))
        .filter(col("tq") > 280)
        .select(col("l_orderkey").as("big_okey"))
      table(s, dir, "customer")
        .join(table(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("big_okey"), "left_semi")
        .join(
          table(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")
        )
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Q20-shape nested semi-join chain: suppliers whose 1995 ship volume
    // of 'red%' parts exceeds a threshold. Two nested IN subqueries
    // (parts by name; supplier volume with HAVING) — Catalyst rewrites
    // both to semi joins: part names filter broadcast-semi-joins into
    // the lineitem scan, the aggregated-HAVING side semi-joins supplier.
    // Exact BIGINT quantity sums make the HAVING edge bit-portable.
    "q20_red_part_suppliers" -> ((s, dir) =>
      s.sql(
        s"""SELECT s_name, s_nationkey
           |FROM parquet.`$dir/supplier.parquet`
           |WHERE s_suppkey IN (
           |  SELECT l_suppkey FROM parquet.`$dir/lineitem.parquet`
           |  WHERE l_partkey IN (
           |      SELECT p_partkey FROM parquet.`$dir/part.parquet`
           |      WHERE p_name LIKE 'red%')
           |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
           |  GROUP BY l_suppkey
           |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 290)
           |ORDER BY s_name""".stripMargin
      )),

    // Q21-shape multi-correlated EXISTS + NOT EXISTS: suppliers who were
    // the SOLE returner in multi-supplier orders (their line has
    // returnflag 'R', another supplier shipped in the same order, and no
    // other supplier's line was returned). Catalyst decorrelates the
    // EXISTS into a left-semi and the NOT EXISTS into a left-anti join —
    // three passes over lineitem, all equi-joined on l_orderkey, no
    // per-order iteration anywhere.
    "q21_sole_return_supplier" -> ((s, dir) =>
      s.sql(
        s"""SELECT s_name, count(*) AS numwait
           |FROM parquet.`$dir/supplier.parquet`
           |JOIN parquet.`$dir/lineitem.parquet` l1 ON s_suppkey = l1.l_suppkey
           |WHERE l1.l_returnflag = 'R'
           |  AND EXISTS (
           |    SELECT 1 FROM parquet.`$dir/lineitem.parquet` l2
           |    WHERE l2.l_orderkey = l1.l_orderkey
           |      AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM parquet.`$dir/lineitem.parquet` l3
           |    WHERE l3.l_orderkey = l1.l_orderkey
           |      AND l3.l_suppkey <> l1.l_suppkey
           |      AND l3.l_returnflag = 'R')
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name
           |LIMIT 20""".stripMargin
      )),

    // Q6-shape forecast revenue change: the one pure scan-aggregate in the
    // suite — no join at all. All three predicates push to the parquet
    // scan (shipdate range, discount band, quantity cap); revenue =
    // extprice*discount in exact 10^-4 units. At 100 TB this is the
    // I/O-bound floor: one codegen'd scan + partial/final agg, and with
    // date-partitioned storage the year predicate prunes partitions.
    "q6_forecast_revenue" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24
        )
        .agg(
          (sum(
            round(col("l_extendedprice") * 100).cast("long") *
              round(col("l_discount") * 100).cast("long")
          ) / 10000.0).as("revenue"),
          count(lit(1)).as("n_items")
        )),

    // Q8-shape market share: of all AMERICA-customer revenue on ECONOMY
    // parts, the fraction supplied by NATION_1, by order year. The share
    // is a ratio of two conditional sums over the same joined frame (one
    // pass, like q14); dims broadcast, fact-fact left to AQE. Exact e4
    // units in both numerator and denominator; single division at the end.
    "q8_market_share" -> ((s, dir) => {
      val custNat = broadcast(
        table(s, dir, "nation")
          .join(
            table(s, dir, "region").filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey")
          )
          .select(col("n_nationkey").as("c_nk"))
      )
      val suppNat = broadcast(
        table(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      )
      table(s, dir, "lineitem")
        .join(
          table(s, dir, "part").filter(col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey")
        )
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(custNat, col("c_nationkey") === col("c_nk"))
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(suppNat, col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", revUnits).otherwise(lit(0L)))
            .as("nation_units"),
          sum(revUnits).as("total_units")
        )
        .select(
          col("o_year"),
          round(
            col("nation_units").cast("double") / col("total_units").cast("double"),
            6
          ).as("mkt_share")
        )
        .orderBy("o_year")
    }),

    // Q9-shape product-type profit: the testdata has no partsupp, so cost
    // is proxied by p_retailprice × quantity (documented delta). Profit
    // per line = revUnits − retail_cents·100·qty, all exact Long e4
    // units; grouped by supplier nation × order year. Part filter
    // (name LIKE) pushes to the part scan; nation broadcast.
    "q9_product_profit" -> ((s, dir) => {
      val amountE4 = revUnits -
        round(col("p_retailprice") * 100).cast("long") * lit(100L) *
        round(col("l_quantity")).cast("long")
      table(s, dir, "lineitem")
        .join(
          table(s, dir, "part").filter(col("p_name").contains("red")),
          col("l_partkey") === col("p_partkey")
        )
        .join(table(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(
          broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey")
        )
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg((sum(amountE4) / 10000.0).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11-shape important parts: per-part value (for suppliers of one
    // nation) exceeding a fixed fraction of the total — a HAVING against
    // a global scalar subquery. Declared in SQL so Catalyst plans the
    // scalar as a 1-row broadcast against the grouped frame (no second
    // scan of the grouped result; the CTE is shared). At 100 TB the
    // value frame shuffles once on partkey; the total is a partial-agg
    // rollup of the same shuffle output.
    "q11_important_parts" -> ((s, dir) =>
      s.sql(
        s"""WITH v AS (
           |  SELECT l_partkey AS partkey, CAST(sum($revUnitsSql) AS BIGINT) AS value_e4
           |  FROM parquet.`$dir/lineitem.parquet`
           |  JOIN parquet.`$dir/supplier.parquet` ON l_suppkey = s_suppkey
           |  JOIN parquet.`$dir/nation.parquet` ON s_nationkey = n_nationkey
           |  WHERE n_name = 'NATION_3'
           |  GROUP BY 1)
           |SELECT partkey, value_e4
           |FROM v
           |WHERE value_e4 > (SELECT CAST(sum(value_e4) * 0.001 AS BIGINT) FROM v)
           |ORDER BY value_e4 DESC, partkey""".stripMargin
      )),

    // Q12-shape priority shipping: the reference schema has no l_shipmode /
    // l_commitdate / l_receiptdate, so the public Q12 pattern (per-mode
    // high/low priority line counts in a receipt-year window) is adapted to
    // the driver's column subset: l_returnflag stands in for the mode
    // dimension and l_shipdate for the receipt window. The signature
    // features survive intact: a fact-fact join where only the ORDER side
    // carries the CASE column, conditional aggregation (two sums from one
    // pass), and a date filter pushed to the lineitem scan so the join
    // input is one year, not the full table. At 100 TB the l_shipdate
    // filter prunes before the shuffle and the 3-row result exits a
    // partial+final hash agg.
    "q12_priority_lines" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      table(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1999-01-01").cast("timestamp")
        )
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count")
        )
        .orderBy("l_returnflag")
    }),

    // Q13-shape customer order distribution: LEFT OUTER customer⋈orders
    // with a non-trivial predicate INSIDE the join condition (urgent
    // orders don't count, but the customer still appears with 0), then a
    // two-level aggregation: per-customer count → distribution of counts.
    // The first agg shuffles on custkey, the second on the (tiny) count
    // domain. Exercises outer-join-with-condition + count(col) null
    // semantics.
    "q13_customer_distribution" -> ((s, dir) =>
      table(s, dir, "customer")
        .join(
          table(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT",
          "left"
        )
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    // Q15-shape top supplier: quarterly revenue per supplier, return the
    // supplier(s) whose revenue equals the maximum — a scalar subquery
    // over the same aggregated CTE (shared, not recomputed). Ties are
    // all returned (per the public Q15 semantics), so no tie-break
    // nondeterminism; revenue is exact e4 → the equality is exact.
    "q15_top_supplier" -> ((s, dir) =>
      s.sql(
        s"""WITH rev AS (
           |  SELECT l_suppkey AS suppkey, CAST(sum($revUnitsSql) AS BIGINT) AS total_e4
           |  FROM parquet.`$dir/lineitem.parquet`
           |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
           |  GROUP BY 1)
           |SELECT s_suppkey, s_name, CAST(total_e4 AS DOUBLE) / 10000.0 AS total_revenue
           |FROM parquet.`$dir/supplier.parquet`
           |JOIN rev ON s_suppkey = suppkey
           |WHERE total_e4 = (SELECT max(total_e4) FROM rev)
           |ORDER BY s_suppkey""".stripMargin
      )),

    // Q16-shape supplier counts by part attribute, EXCLUDING suppliers
    // matched by a NOT IN subquery (negative account balance as the
    // "complaints" proxy — the testdata has no comment column). NOT IN
    // is the null-aware anti join (NAAJ) plan shape — distinct from
    // q_semi_anti's left-anti — though s_suppkey is non-null here so the
    // null path never fires at runtime. Distinct-supplier counts group
    // on (brand, type, size) after a lineitem⋈part join.
    "q16_supplier_part_counts" -> ((s, dir) =>
      s.sql(
        s"""SELECT p_brand, p_type, p_size,
           |  count(DISTINCT l_suppkey) AS supplier_cnt
           |FROM parquet.`$dir/lineitem.parquet`
           |JOIN parquet.`$dir/part.parquet` ON l_partkey = p_partkey
           |WHERE p_brand <> 'Brand#1'
           |  AND l_suppkey NOT IN (
           |    SELECT s_suppkey FROM parquet.`$dir/supplier.parquet`
           |    WHERE s_acctbal < 0)
           |GROUP BY p_brand, p_type, p_size
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
           |LIMIT 100""".stripMargin
      )),

    // Q17-shape small-quantity revenue: lineitems of one brand whose
    // quantity is below 20% of that part's average quantity — a
    // correlated scalar-avg subquery, decorrelated by Catalyst into an
    // aggregate + join on partkey. The avg threshold is reformulated as
    // exact integers (5·qty·cnt < sum_qty ⇔ qty < 0.2·avg since
    // quantities are integral): no double division on the comparison
    // path, so the predicate edge is bit-identical across engines.
    "q17_small_quantity_revenue" -> ((s, dir) =>
      s.sql(
        s"""WITH li AS (
           |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS q,
           |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
           |  FROM parquet.`$dir/lineitem.parquet`),
           |pq AS (
           |  SELECT l_partkey AS partkey, CAST(sum(q) AS BIGINT) AS sum_q,
           |         count(*) AS cnt
           |  FROM li GROUP BY 1)
           |SELECT round(CAST(sum(price_cents) AS DOUBLE) / 100.0 / 7.0, 4) AS avg_yearly
           |FROM li
           |JOIN parquet.`$dir/part.parquet` ON l_partkey = p_partkey
           |JOIN pq ON partkey = l_partkey
           |WHERE p_brand = 'Brand#23' AND 5 * q * cnt < sum_q""".stripMargin
      )),

    // Q22-shape wealthy-inactive customers: acctbal above the positive-
    // balance average AND no orders at all — a scalar-agg subquery in the
    // predicate plus NOT EXISTS (anti join). The average comparison is
    // exact-integer (bal_cents · n > total_cents avoids a double divide
    // on the predicate edge); declared in SQL so Catalyst plans the
    // scalar as a 1-row broadcast and the NOT EXISTS as a left-anti.
    "q22_wealthy_inactive" -> ((s, dir) =>
      s.sql(
        s"""WITH bal AS (
           |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_c,
           |         count(*) AS n
           |  FROM parquet.`$dir/customer.parquet` WHERE c_acctbal > 0)
           |SELECT n_name, count(*) AS numcust,
           |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
           |FROM parquet.`$dir/customer.parquet`
           |JOIN parquet.`$dir/nation.parquet` ON c_nationkey = n_nationkey
           |WHERE CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM bal)
           |        > (SELECT total_c FROM bal)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM parquet.`$dir/orders.parquet` WHERE o_custkey = c_custkey)
           |GROUP BY n_name
           |ORDER BY n_name""".stripMargin
      )),

    // Exact distributed median of the order value — the operator Spark
    // lacks natively (percentile_approx is approximate; `percentile` pulls
    // per-group state). Two-stage bucket-histogram formulation that stays
    // exact AND distributed:
    //   stage 1: histogram on $1000 cents-buckets (ONE shuffle on ~1e3
    //     bucket keys however big the fact table is), cumulative counts
    //     over the tiny sorted histogram (single-partition window over
    //     |buckets| rows only — bounded by the value domain, not the data),
    //     locate the global middle rank(s) → (bucket, in-bucket offset);
    //   stage 2: rank ONLY inside the 1-2 target buckets (everything else
    //     pruned by the broadcast semi join) and average the picked rows.
    // avg() of ≤2 BIGINTs is the same sum/count double op in both engines
    // → bit-identical; ties inside a bucket are value-equal so row_number
    // tie order can't change the result.
    "q_exact_median_order" -> ((s, dir) => {
      val cents = table(s, dir, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("c"))
        .withColumn("bkt", expr("c div 100000"))
      val hist = cents.groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
      val wCum = Window
        .orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = hist.agg(sum(col("cnt")).as("n"))
      val targets = hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("cum_prev", col("cum") - col("cnt"))
        .crossJoin(broadcast(total))
        .select(
          col("bkt"),
          col("cum_prev"),
          col("cum"),
          explode(expr("array((n + 1) div 2, (n + 2) div 2)")).as("k")
        )
        .filter(col("cum_prev") < col("k") && col("cum") >= col("k"))
        .select(col("bkt"), (col("k") - col("cum_prev")).as("off"))
      val wInBkt = Window.partitionBy(col("bkt")).orderBy(col("c"))
      cents
        .join(broadcast(targets.select(col("bkt")).distinct()), Seq("bkt"))
        .withColumn("rn", row_number().over(wInBkt))
        .join(broadcast(targets), Seq("bkt")) // tiny; re-join to match offsets
        .filter(col("rn") === col("off"))
        .agg(round(avg(col("c")) / 100.0, 4).as("median_price"))
    }),

    // Fixed-width value histogram — the profiling staple: $50k buckets,
    // top-capped, with per-bucket count and exact cents bounds/mass.
    // One shuffle on the bucket key; bucketing is integer division so
    // the oracle is bit-identical.
    "q_value_histogram" -> ((s, dir) =>
      table(s, dir, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("c"))
        .withColumn("bucket", least(expr("c div 5000000"), lit(9L)))
        .groupBy(col("bucket"))
        .agg(
          count(lit(1)).as("n_orders"),
          min(col("c")).as("min_cents"),
          max(col("c")).as("max_cents"),
          sum(col("c")).as("sum_cents")
        )
        .orderBy("bucket")),

    // Semi/anti in one pass: per-nation counts of customers with and
    // without orders. The distinct custkey set is aggregated before the
    // join (orders-side shrink), then left-joined; nation broadcast.
    "q_semi_anti_customers" -> ((s, dir) => {
      val withOrders =
        table(s, dir, "orders").select(col("o_custkey")).distinct()
      table(s, dir, "customer")
        .join(withOrders, col("c_custkey") === col("o_custkey"), "left")
        .join(
          broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey")
        )
        .groupBy(col("n_name"))
        .agg(
          count(col("o_custkey")).as("n_with_orders"),
          (count(lit(1)) - count(col("o_custkey"))).as("n_without_orders")
        )
        .orderBy(col("n_name"))
    })
  )

  /** Overflow safety (ADVICE r3 → fixed r5): the e4/e6-units sums — the
    * only aggregates that could near 2^63 at large SFs — go through
    * [[Q.wrapSumSql]], which wraps DuckDB's exact HUGEINT sum into Spark's
    * two's-complement Long semantics, so the oracle COMPARES (and matches)
    * at any scale factor instead of raising on `CAST(HUGEINT AS BIGINT)`.
    * Plain cents sums stay ≤ ~1e15 through sf100 and keep the direct cast.
    * At 100 TB the Spark side's switch is decimal(38,6) —
    * `q1_pricing_summary_decimal` registers exactly that path against
    * DuckDB's HUGEINT-exact sums.
    */
  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_price_cents,
         |  ${wrapSumSql(revUnitsSql)} AS sum_disc_price_e4,
         |  ${wrapSumSql(s"$revUnitsSql * CAST(round((1 + l_tax) * 100) AS BIGINT)")} AS sum_charge_e6,
         |  round(avg(l_quantity), 2) AS avg_qty,
         |  round(sum(${centsSql("l_extendedprice")}) / count(*) / 100.0, 2) AS avg_price,
         |  round(avg(l_discount), 2) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q1_pricing_summary_decimal" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(CAST(CAST(sum(${centsSql("l_extendedprice")}) AS DECIMAL(38,0)) * 0.01 AS DECIMAL(38,6)) AS VARCHAR) AS sum_base_price_dec,
         |  CAST(CAST(CAST(sum($revUnitsSql) AS DECIMAL(38,0)) * 0.0001 AS DECIMAL(38,6)) AS VARCHAR) AS sum_disc_price_dec,
         |  CAST(CAST(CAST(sum($revUnitsSql * CAST(round((1 + l_tax) * 100) AS BIGINT)) AS DECIMAL(38,0)) * 0.000001 AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge_dec,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, CAST(sum($revUnitsSql) AS DOUBLE) / 10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier_volume" ->
      s"""SELECT n_name, CAST(sum($revUnitsSql) AS DOUBLE) / 10000.0 AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name, CAST(sum($revUnitsSql) AS DOUBLE) / 10000.0 AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(rank() OVER (PARTITION BY o_custkey
        |                 ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin,
    "q_rollup_order_stats" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  count(*) AS n_orders,
         |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders
         |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_setops_churned" ->
      """(SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |   AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        | INTERSECT
        | SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |EXCEPT
        |SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,
    "q_grouping_sets_orders" ->
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
         |  count(*) AS n_orders,
         |  CAST(sum(${centsSql("o_totalprice")}) AS BIGINT) AS total_cents
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
         |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
         |  CAST(year(l_shipdate) AS INT) AS l_year,
         |  CAST(sum($revUnitsSql) AS DOUBLE) / 10000.0 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q19_disjunctive_pricing" ->
      s"""SELECT CAST(sum($revUnitsSql) AS DOUBLE) / 10000.0 AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q14_promo_share" ->
      s"""WITH j AS (
         |  SELECT CASE WHEN p_type = 'PROMO' THEN $revUnitsSql ELSE 0 END AS promo_u,
         |         $revUnitsSql AS total_u
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00')
         |SELECT round(CAST(sum(promo_u) AS DOUBLE) * CAST(100.0 AS DOUBLE) / CAST(sum(total_u) AS DOUBLE), 6) AS promo_share_pct,
         |       CAST(sum(total_u) AS DOUBLE) / 10000.0 AS total_revenue
         |FROM j""".stripMargin,
    "q_cube_lineitem_stats" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q4_order_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q18_large_volume_customers" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey
        |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 280)
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q20_red_part_suppliers" ->
      """SELECT s_name, s_nationkey
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 290)
        |ORDER BY s_name""".stripMargin,
    "q21_sole_return_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         min(CAST(round(l_extendedprice * 100) AS BIGINT) / l_quantity) AS cost
        |  FROM lineitem
        |  GROUP BY 1, 2)
        |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name, ps.cost AS min_cost
        |FROM ps
        |JOIN part p ON p.p_partkey = ps.partkey
        |JOIN supplier s ON s.s_suppkey = ps.suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
        |  AND ps.cost = (
        |    SELECT min(ps2.cost)
        |    FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.suppkey
        |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        |    WHERE ps2.partkey = ps.partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      s"""WITH j AS (
         |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |    CASE WHEN n2.n_name = 'NATION_1' THEN $revUnitsSql ELSE 0 END AS nation_u,
         |    $revUnitsSql AS total_u
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |  JOIN region ON n1.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
         |SELECT o_year,
         |  round(CAST(sum(nation_u) AS DOUBLE) / CAST(sum(total_u) AS DOUBLE), 6) AS mkt_share
         |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         |  CAST(sum($revUnitsSql
         |    - CAST(round(p_retailprice * 100) AS BIGINT) * 100
         |      * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      s"""WITH v AS (
         |  SELECT l_partkey AS partkey, ${wrapSumSql(revUnitsSql)} AS value_e4
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'
         |  GROUP BY 1)
         |SELECT partkey, value_e4
         |FROM v
         |WHERE value_e4 > (SELECT CAST(sum(value_e4) * 0.001 AS BIGINT) FROM v)
         |ORDER BY value_e4 DESC, partkey""".stripMargin,
    "q12_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_customer_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey AS suppkey, ${wrapSumSql(revUnitsSql)} AS total_e4
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(total_e4 AS DOUBLE) / 10000.0 AS total_revenue
         |FROM supplier
         |JOIN rev ON s_suppkey = suppkey
         |WHERE total_e4 = (SELECT max(total_e4) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_part_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 100""".stripMargin,
    "q17_small_quantity_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey, CAST(round(l_quantity) AS BIGINT) AS q,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem),
        |pq AS (
        |  SELECT l_partkey AS partkey, CAST(sum(q) AS BIGINT) AS sum_q,
        |         count(*) AS cnt
        |  FROM li GROUP BY 1)
        |SELECT round(CAST(sum(price_cents) AS DOUBLE) / 100.0 / 7.0, 4) AS avg_yearly
        |FROM li
        |JOIN part ON l_partkey = p_partkey
        |JOIN pq ON partkey = l_partkey
        |WHERE p_brand = 'Brand#23' AND 5 * q * cnt < sum_q""".stripMargin,
    "q22_wealthy_inactive" ->
      """WITH bal AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_c,
        |         count(*) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM bal)
        |        > (SELECT total_c FROM bal)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    // Single-pass rank formulation — semantically identical to the
    // two-stage bucket histogram (same middle ranks, same avg).
    "q_exact_median_order" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn, count(*) OVER () AS n FROM c)
        |SELECT round(avg(c) / 100.0, 4) AS median_price
        |FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)""".stripMargin,
    "q_value_histogram" ->
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders)
        |SELECT least(c // 5000000, 9) AS bucket, count(*) AS n_orders,
        |  min(c) AS min_cents, max(c) AS max_cents,
        |  CAST(sum(c) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_semi_anti_customers" ->
      """SELECT n_name,
        |  count(o_custkey) AS n_with_orders,
        |  count(*) - count(o_custkey) AS n_without_orders
        |FROM customer
        |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |  ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
  )
}
