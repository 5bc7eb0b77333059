package graft

import graft.queries.OperatorQueries

/** `o_cdc_merge_snapshot` — MERGE semantics cross-checked against a
  * driver-side reimplementation (latest-op-wins per key, delete/upsert/
  * passthrough/no-op precedence) on sf0.001.
  */
class CdcMergeSpec extends SparkSpecBase {

  test("CDC merge matches a driver-side latest-op-wins reimplementation") {
    val out = OperatorQueries
      .queries("o_cdc_merge_snapshot")(spark, Sf0001)
      .collect()
      .map(r => r.getAs[String]("action") ->
        (r.getAs[Long]("n"), r.getAs[Long]("bal_cents_sum"),
          r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))
      .toMap

    val base = spark.read
      .parquet(s"$Sf0001/customer.parquet")
      .selectExpr("c_custkey AS key", "CAST(round(c_acctbal * 100) AS BIGINT) AS bal")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val events = graft.queries.Q
      .events(spark, Sf0001)
      .selectExpr(
        "user_id + 1 + CASE WHEN event_id % 7 = 0 THEN 100000000 ELSE 0 END AS key",
        "unix_micros(ts) AS tsu", "event_id", "event_type",
        "CAST(round(value * 100) AS BIGINT) AS val")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val latest = events
      .groupBy(_._1)
      .map { case (k, es) => k -> es.maxBy(e => (e._2, e._3)) }
    val actions = (base.keySet ++ latest.keySet).toSeq.map { k =>
      (base.get(k), latest.get(k)) match {
        case (Some(b), None)                        => (k, "unchanged", Some(b))
        case (Some(_), Some(e)) if e._4 == "error"  => (k, "deleted", None)
        case (None, Some(e)) if e._4 == "error"     => (k, "noop_delete", None)
        case (None, Some(e))                        => (k, "inserted", Some(e._5))
        case (Some(_), Some(e))                     => (k, "updated", Some(e._5))
        case (None, None)                           => throw new IllegalStateException
      }
    }
    val expected = actions.groupBy(_._2).map { case (a, rs) =>
      a -> (rs.size.toLong, rs.flatMap(_._3).sum, rs.map(_._1).min, rs.map(_._1).max)
    }
    assert(out == expected)
    // the merge must account for every base row and every changelog key
    val n = (a: String) => out.get(a).map(_._1).getOrElse(0L)
    assert(n("unchanged") + n("deleted") + n("updated") == base.size.toLong)
    assert(out.contains("inserted") && out.contains("noop_delete"))
  }
  test("incremental agg merge equals the full recompute") {
    import org.apache.spark.sql.functions._
    val merged = graft.queries.OperatorQueries.queries("o_incremental_agg")(spark, Sf0001)
      .collect().map(_.toString).sorted.toSeq
    val full = graft.queries.Q.events(spark, Sf0001)
      .groupBy(
        date_format(to_date(date_trunc("day", col("ts"))), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("day"), col("event_type"), col("n_events"), col("sum_cents"))
      .collect().map(_.toString).sorted.toSeq
    assert(merged.nonEmpty && merged == full)
  }
}
