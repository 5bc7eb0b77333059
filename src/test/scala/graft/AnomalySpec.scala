package graft

import org.apache.spark.sql.functions._

import graft.queries.{OperatorQueries, Q}

/** Invariants for the daily-volume anomaly detector (`o_anomaly_daily_counts`)
  * on sf0.001: the registered output must equal a driver-side recompute of
  * the trailing-7-day exact integer z-test, row for row.
  */
class AnomalySpec extends SparkSpecBase {

  test("daily anomaly: exact match to a driver-side trailing-window recompute") {
    val rows = OperatorQueries.queries("o_anomaly_daily_counts")(spark, Sf0001).collect()
    val ev = Q
      .events(spark, Sf0001)
      .select(col("event_type"), date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = ev
      .groupBy(_._1)
      .flatMap { case (tp, rs) =>
        val days = rs.groupBy(_._2).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
        days.zipWithIndex.map { case ((d, x), i) =>
          val trail = days.slice(math.max(0, i - 7), i).map(_._2)
          val s = trail.sum
          val q = trail.map(c => BigInt(c) * c).sum
          val anomaly =
            trail.length == 7 && BigInt(7 * x - s) * (7 * x - s) > 4 * (7 * q - BigInt(s) * s)
          (tp, d) -> ((x, trail.length.toLong, s, anomaly))
        }
      }
    assert(rows.length == expected.size)
    // at least one fully-warmed window must exist, or the test proves nothing
    assert(rows.exists(_.getAs[Long]("trail_days") == 7L))
    rows.foreach { r =>
      val (x, td, ts, anomaly) = expected((r.getAs[String]("event_type"), r.getAs[String]("day")))
      assert(r.getAs[Long]("x") == x)
      assert(r.getAs[Long]("trail_days") == td)
      assert(r.getAs[Long]("trail_sum") == ts)
      assert(r.getAs[Boolean]("is_anomaly") == anomaly)
      // the flag can only fire on a fully-warmed trailing window
      if (td < 7L) assert(!r.getAs[Boolean]("is_anomaly"))
    }
  }
}
