package graft

import org.apache.spark.sql.functions._

/** Scale-design evidence: pre-bucketing both fact tables on the join key
  * lets the join plan WITHOUT any shuffle exchange — the co-location
  * strategy for repeated fact-fact joins at 100 TB (bucket once, join
  * many times).
  */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.read
        .parquet(s"$Sf0001/orders.parquet")
        .write
        .mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
      spark.read
        .parquet(s"$Sf0001/lineitem.parquet")
        .write
        .mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val joined = spark
        .table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (bucket co-location);
      // only the final tiny groupBy aggregation may exchange
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(plan.contains("Bucketed: true"))

      // and it computes the right thing
      val viaBuckets = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val direct = spark.read
        .parquet(s"$Sf0001/lineitem.parquet")
        .join(
          spark.read.parquet(s"$Sf0001/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")
        )
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toMap
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
