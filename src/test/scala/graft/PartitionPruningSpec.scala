package graft

import org.apache.spark.sql.functions._

import graft.queries.OperatorQueries

/** Date-partitioned layout: a day-range query must touch only the
  * matching partition directories (file-level pruning, before any
  * parquet footer is read).
  */
class PartitionPruningSpec extends SparkSpecBase {

  test("3-day filter reads files from exactly 3 of the date partitions") {
    val pruned = OperatorQueries
      .partitionedEvents(spark, Sf0001)
      .filter(col("event_date").between("2024-01-05", "2024-01-07"))

    // which partition directories do the scanned files come from?
    val dirs = pruned
      .select(input_file_name().as("f"))
      .select(regexp_extract(col("f"), "event_date=([0-9-]+)", 1).as("d"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .sorted
    assert(dirs.toSeq == Seq("2024-01-05", "2024-01-06", "2024-01-07"))

    // and the scan node itself carries the partition filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }

  test("pruned result equals the unpartitioned filter") {
    val viaPartitions = OperatorQueries
      .queries("o_partition_pruned_agg")(spark, Sf0001)
      .collect()
    val direct = graft.queries.Q
      .events(spark, Sf0001)
      .withColumn("event_date", to_date(col("ts")))
      .filter(col("event_date").between("2024-01-05", "2024-01-07"))
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents")
      )
      .select(
        date_format(col("event_date"), "yyyy-MM-dd").as("event_date"),
        col("event_type"), col("n"), col("sum_value_cents")
      )
      .orderBy("event_date", "event_type")
      .collect()
    assert(viaPartitions.toSeq == direct.toSeq)
  }
}
