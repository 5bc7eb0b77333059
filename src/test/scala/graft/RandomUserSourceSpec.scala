package graft

import org.apache.spark.sql.functions._

import graft.etl.Normalize
import graft.sources.MockUserSource

/** The DataSource V2 connector must generate exactly the FIXTURES.md A2
  * rows (same as MockUserSource), partition-parallel.
  */
class RandomUserSourceSpec extends SparkSpecBase {

  test("format(\"randomuser\") equals MockUserSource row-for-row") {
    // n=150 crosses the 3-digit index boundary (VERDICT r3 #4)
    val dsv2 = Normalize.flattenForCsv(
      spark.read.format("randomuser").option("n", 150).load()
    )
    val builtin = Normalize.flattenForCsv(MockUserSource.users(spark, 150))
    assert(dsv2.count() == 150)
    assert(dsv2.exceptAll(builtin).isEmpty && builtin.exceptAll(dsv2).isEmpty)
  }

  test("phone pads without truncating for index >= 100 (randomuser.js:15)") {
    // String(index).padStart(2,'0'): 5 → "05", 42 → "42", 149 → "149"
    val phones = spark.read.format("randomuser").option("n", 150).load()
      .select(col("id.value").as("id"), col("phone"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(phones("mock-id-5") == "555-0101-05")
    assert(phones("mock-id-42") == "555-0101-42")
    assert(phones("mock-id-149") == "555-0101-149")
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
