package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchApprox {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val df = spark.read.parquet(s"/root/testdata/$sf/customer.parquet")
      val r = df.agg(
        count_distinct(col("c_custkey")).as("exact"),
        approx_count_distinct(col("c_custkey"), 0.05).as("a05"),
        approx_count_distinct(col("c_custkey"), 0.01).as("a01")
      ).collect()(0)
      println(s"[approx] $sf exact=${r.getLong(0)} a05=${r.getLong(1)} a01=${r.getLong(2)}")
    }
    spark.stop()
  }
}
