package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("names")) {
      // print every registered query name (sweep batching reads this —
      // the authoritative list is SparkEntry.queries, not a source grep)
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      spark.stop()
      return
    }
    if (args.headOption.contains("explain")) {
      args.drop(1).foreach { name =>
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("explainExec")) {
      // final AQE plan (ReusedExchange visibility): execute, then print
      args.drop(1).foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        println(s"===== $name (executed) =====")
        println(df.queryExecution.executedPlan.toString.take(20000))
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("dump")) {
      // dump <outDir> <name>... — re-dump single queries into an existing
      // Verify output dir (sfDir via SPARK_GRAFT_SF_DIR), for spot re-checks
      val outDir = args(1)
      args.drop(2).foreach { name =>
        SparkEntry.queries(name)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        println(s"[scratch] dumped $name")
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("tune")) {
      // print the RangeJoin auto-knobs for the session-interval frame at
      // this SF (dev instrument for VERDICT r10 #1)
      import org.apache.spark.sql.functions._
      val iv = graft.streaming.EventPipeline
        .sessionize(graft.queries.Q.events(spark, sfDir))
        .select(
          col("user_id"),
          unix_micros(col("session_start")).as("s"),
          unix_micros(col("session_end")).as("e"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val k = graft.operators.RangeJoin.tuneKnobs(iv, "s", "e")
      println(f"[tune] ${(System.nanoTime() - t0) / 1e9}%.3f s  $k  " +
        f"(width=${k.bucketWidth / 60e6}%.2f min)")
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
        "wordhash" -> docs.withColumn("ws", split(col("text"), " "))
          .withColumn("wh", expr("transform(ws, w -> char_rolling_hash(w))"))
          .select("doc_id", "wh"),
        "hash" -> docs.withColumn("ws", split(col("text"), " "))
          .withColumn("wh", expr("transform(ws, w -> char_rolling_hash(w))"))
          .withColumn("hs", expr(s"array_distinct(${graft.functions.TextFeatures.hashedNgramsSpark("wh", 3)})"))
          .select("doc_id", "hs")
      )
      // mirror of the current d_ngram pipeline (identity-agg barrier →
      // explode → df → rare postings → self-join → distinct)
      val sets = stages.last._2.repartition(32, col("doc_id")).localCheckpoint()
      val ex = sets.select(col("doc_id"), explode(col("hs")).as("s"))
      val dfq = ex.groupBy("s").agg(count(lit(1)).as("c"))
      val rare = ex.join(dfq.filter(col("c") <= 10), "s")
      val sj = rare
        .select(col("s"), col("doc_id").as("doc_a"))
        .join(rare.select(col("s"), col("doc_id").as("doc_b")).hint("shuffle_hash"), "s")
        .filter(col("doc_a") < col("doc_b"))
      val cand = sj.select("doc_a", "doc_b").distinct()
      val a = sets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
      val b = sets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
      val ver = cand.join(a, "doc_a").join(b, "doc_b")
        .withColumn("i", size(array_intersect(col("hs_a"), col("hs_b"))))
        .select("doc_a", "doc_b", "i")
      val joinStages = Seq("sets" -> sets, "ex" -> ex, "df" -> dfq, "rare" -> rare,
        "selfjoin" -> sj, "cand" -> cand, "verify" -> ver)
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
