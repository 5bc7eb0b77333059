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
}
