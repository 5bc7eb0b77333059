package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("explain")) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("probe")) {
      // stage-by-stage timing of the dedup text pipeline (dev only)
      import org.apache.spark.sql.functions._
      graft.functions.SketchExpressions.register(spark)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))
      val stages: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "read" -> docs,
        "split" -> docs.withColumn("ws", split(col("text"), " ")).select("doc_id", "ws"),
        "shingle" -> docs.withColumn("ws", split(col("text"), " "))
          .withColumn("sh", expr(graft.functions.TextFeatures.shinglesSpark("ws")))
          .select("doc_id", "sh"),
        "shingle_distinct" -> docs.withColumn("ws", split(col("text"), " "))
          .withColumn("sh", expr(s"array_distinct(${graft.functions.TextFeatures.shinglesSpark("ws")})"))
          .select("doc_id", "sh"),
        "hash" -> docs.withColumn("ws", split(col("text"), " "))
          .withColumn("sh", expr(s"array_distinct(${graft.functions.TextFeatures.shinglesSpark("ws")})"))
          .withColumn("hs", expr("array_distinct(transform(sh, t -> char_rolling_hash(t)))"))
          .select("doc_id", "hs")
      )
      val ex = stages.last._2
        .select(col("doc_id"), size(col("hs")).as("n"), explode(col("hs")).as("s"))
      val dfq = ex.groupBy("s").agg(count(lit(1)).as("c"))
      val exd = ex.join(dfq, "s")
      val sj = exd
        .select(col("s"), col("doc_id").as("doc_a"), col("n").as("na"), col("c"))
        .join(exd.select(col("s"), col("doc_id").as("doc_b"), col("n").as("nb")), "s")
        .filter(col("doc_a") < col("doc_b"))
      val agg = sj
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("i"),
          sum(when(col("c") <= 10, 1L).otherwise(0L)).as("i_rare"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
      val joinStages = Seq("ex" -> ex, "df" -> dfq, "exd" -> exd, "selfjoin" -> sj, "agg" -> agg)
      for ((nm, df) <- stages ++ joinStages; rep <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $nm rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.stop()
      return
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("p1_p2_normalize", "a1_a4_mock_metrics")
    for (name <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(
        f"[scratch] $name rep$rep: build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f s"
      )
    }
    spark.stop()
  }
}
