package graft

import org.apache.spark.sql.functions._

import graft.queries.OperatorQueries

/** Invariants for the z-order layout-quality operator (`o_zorder_layout`):
  * the Morton interleave itself, and the layout ordering the metric exists
  * to demonstrate — a single-key sort bounds one dimension and leaves the
  * other spanning its whole domain; the z-order bounds both.
  */
class ZOrderSpec extends SparkSpecBase {

  test("morton spread interleaves bits: known vectors") {
    // z(x, y) places x's bits at even positions, y's at odd positions
    val rows = spark
      .sql(
        """SELECT x, y FROM VALUES (65535L, 0L), (0L, 65535L), (65535L, 65535L),
          |(1L, 0L), (0L, 1L), (2L, 1L) AS t(x, y)""".stripMargin
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def refInterleave(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    // evaluate the query's magic-mask spread through the same SQL used in
    // the operator (16-bit inputs -> 32-bit morton code)
    def spreadSql(v: String): String = {
      val a = s"(($v | shiftleft($v, 8)) & 16711935)"
      val b = s"(($a | shiftleft($a, 4)) & 252645135)"
      val d = s"(($b | shiftleft($b, 2)) & 858993459)"
      s"(($d | shiftleft($d, 1)) & 1431655765)"
    }
    rows.foreach { case (x, y) =>
      val z = spark
        .sql(s"SELECT (${spreadSql(s"${x}L")} | shiftleft(${spreadSql(s"${y}L")}, 1)) AS z")
        .head()
        .getLong(0)
      assert(z == refInterleave(x, y), s"morton($x, $y)")
    }
  }

  test("zorder layout bounds both dims where single-key sort bounds one") {
    // sf0.01, not sf0.001: the geometry needs enough 4096-row chunks for a
    // chunk to be a sub-rectangle of the curve (sf0.001 is ~2 chunks —
    // each half the whole square, so no layout can bound anything).
    val rows = OperatorQueries
      .queries("o_zorder_layout")(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r =>
        r.getAs[String]("layout") ->
          (r.getAs[Double]("avg_span_x"), r.getAs[Double]("avg_span_y")))
      .toMap
    assert(rows.keySet == Set("1_natural", "2_bykey", "3_zorder"))
    val (natX, natY) = rows("1_natural")
    val (keyX, keyY) = rows("2_bykey")
    val (zX, zY) = rows("3_zorder")
    // all spans live on the 16-bit grid
    rows.values.foreach { case (sx, sy) =>
      assert(sx >= 0 && sx <= 65535 && sy >= 0 && sy <= 65535)
    }
    // sorting by x bounds x far tighter than arrival order...
    assert(keyX < natX)
    // ...but leaves y unbounded (spans ~the full domain, like natural)
    assert(keyY > 0.9 * natY)
    // z-order pays some x-span vs the dedicated x-sort but bounds BOTH dims
    assert(zY < 0.7 * keyY, s"zorder should bound y: $zY vs $keyY")
    assert(zX < 0.7 * natX, s"zorder should bound x: $zX vs $natX")
  }

  test("production z-order write path plans a rangepartitioning exchange, no global sort") {
    // `o_zorder_layout` assigns files by explicit value-range boundaries
    // (chunk = key·m div domain) — the deterministic, hash-matchable
    // equivalent of what repartitionByRange's sampled boundaries do. The
    // production WRITE recipe its scaladoc prescribes is
    // repartitionByRange(z) + sortWithinPartitions(z): a parallel
    // per-partition sort behind a rangepartitioning exchange, never a
    // single-partition total order. Assert the recipe actually plans
    // that way on the same z column the query computes.
    val li = spark.read
      .parquet(s"$Sf0001/lineitem.parquet")
      .select(
        col("l_orderkey"),
        (col("l_partkey").cast("long") % 65536L).as("x"),
        (col("l_suppkey").cast("long") % 65536L).as("y")
      )
      .withColumn("z", expr("x * 65536 + y")) // stand-in key: any z works
    val written = li.repartitionByRange(8, col("z")).sortWithinPartitions(col("z"))
    val plan = written.queryExecution.executedPlan.toString
    assert(
      plan.toLowerCase.contains("rangepartitioning"),
      s"write path lacks a rangepartitioning exchange:\n$plan"
    )
    // sortWithinPartitions must plan as a LOCAL sort (global=false) —
    // physical Sort prints as "Sort [keys], <global>, 0"
    assert(
      plan.contains("], false, 0") && !plan.contains("], true, 0"),
      s"write path planned a global sort:\n$plan"
    )
  }
}
