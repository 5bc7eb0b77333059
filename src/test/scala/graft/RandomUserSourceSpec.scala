package graft

import org.apache.spark.sql.functions._

import graft.etl.Normalize
import graft.sources.MockUserSource

/** The DataSource V2 connector must generate exactly the FIXTURES.md A2
  * rows (same as MockUserSource), partition-parallel.
  */
class RandomUserSourceSpec extends SparkSpecBase {

  test("format(\"randomuser\") equals MockUserSource row-for-row") {
    val dsv2 = Normalize.flattenForCsv(
      spark.read.format("randomuser").option("n", 50).load()
    )
    val builtin = Normalize.flattenForCsv(MockUserSource.users(spark, 50))
    assert(dsv2.count() == 50)
    assert(dsv2.exceptAll(builtin).isEmpty && builtin.exceptAll(dsv2).isEmpty)
  }

  test("scan splits into the requested partitions") {
    val df = spark.read
      .format("randomuser")
      .option("n", 1000)
      .option("partitions", 8)
      .load()
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    assert(df.select(count_distinct(col("id.value"))).collect()(0).getLong(0) == 1000)
  }
}
