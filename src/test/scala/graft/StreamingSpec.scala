package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventPipeline

/** Structured-Streaming tier: the windowed aggregation replayed as a file
  * stream with a watermark must converge to the batch result over the
  * same parquet (stream/batch unification is the design contract of
  * EventPipeline's transforms).
  */
class StreamingSpec extends SparkSpecBase {

  test("streaming windowed counts converge to the batch result") {
    val file = s"$Sf0001/events.parquet"
    val batch = EventPipeline
      .windowedCountsCents(graft.queries.Q.events(spark, Sf0001))
      .orderBy("window_start", "event_type")
      .collect()

    val stream = EventPipeline.windowedCountsStream(
      EventPipeline.replayAsStream(spark, file)
    )
    val q = stream.writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("win_counts")
        .orderBy("window_start", "event_type")
        .collect()
      assert(streamed.length == batch.length)
      assert(streamed.zip(batch).forall { case (a, b) => a == b })
    } finally q.stop()
  }

  test("mapGroupsWithState running stats: batch path equals plain groupBy; stream converges") {
    val events = graft.queries.Q.events(spark, Sf0001)
    val viaState = EventPipeline
      .runningUserStats(events)
      .collect()
      .map(u => (u.user_id, (u.n_events, u.sum_value_cents)))
      .toMap
    val viaAgg = events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS LONG)")).as("c")
      )
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(viaState == viaAgg)

    val stream = EventPipeline.runningUserStats(
      EventPipeline.replayAsStream(spark, s"$Sf0001/events.parquet")
    )
    val q = stream.writeStream
      .format("memory")
      .queryName("user_stats")
      .outputMode("update")
      .start()
    try {
      q.processAllAvailable()
      // last update per user must equal the batch totals
      val streamed = spark
        .table("user_stats")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("sum_value_cents"))).as("m"))
        .select(col("user_id"), col("m.n_events"), col("m.sum_value_cents"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .toMap
      assert(streamed == viaAgg)
    } finally q.stop()
  }

  test("stream-stream interval join emits the same pairs as the batch join") {
    val ev = graft.queries.Q.events(spark, Sf0001)
    val batch = EventPipeline
      .attributedPairs(ev, ev)
      .orderBy("user_id", "c_ts", "p_ts")
      .collect()

    val joined = EventPipeline.attributedPairsStream(
      EventPipeline.replayAsStream(spark, s"$Sf0001/events.parquet"),
      EventPipeline.replayAsStream(spark, s"$Sf0001/events.parquet")
    )
    val q = joined.writeStream
      .format("memory")
      .queryName("attrib_pairs")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("attrib_pairs")
        .orderBy("user_id", "c_ts", "p_ts")
        .collect()
      assert(streamed.length == batch.length)
      assert(streamed.zip(batch).forall { case (a, b) => a == b })
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes planted re-deliveries like batch dedup") {
    val ev = graft.queries.Q.events(spark, Sf0001)
    val dupFile = {
      // replay corpus = original + every-13th event re-delivered
      val dir = java.nio.file.Files.createTempDirectory("events-dup")
      spark.read
        .parquet(s"$Sf0001/events.parquet")
        .unionAll(
          spark.read.parquet(s"$Sf0001/events.parquet").filter(col("event_id") % 13 === 0)
        )
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(dir.toString)
      dir.toString + "/" +
        new java.io.File(dir.toString).list().filter(_.endsWith(".parquet")).head
    }
    val expected = ev.count()
    val q = EventPipeline
      .dedupEventsStream(EventPipeline.replayAsStream(spark, dupFile))
      .writeStream
      .format("memory")
      .queryName("dedup_events")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("dedup_events")
      assert(streamed.count() == expected)
      assert(
        streamed.select(countDistinct(col("event_id"))).collect()(0).getLong(0) == expected
      )
    } finally q.stop()
  }

  test("sessionize: sessions are disjoint per user and cover all events") {
    val events = graft.queries.Q.events(spark, Sf0001)
    val sessions = EventPipeline.sessionize(events).cache()
    val nEvents = events.count()
    assert(sessions.agg(sum("n_events")).collect()(0).getLong(0) == nEvents)
    // no overlapping sessions within a user
    val overlaps = sessions
      .as("a")
      .join(
        sessions.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_start") < col("b.session_start") &&
          col("b.session_start") < col("a.session_end")
      )
      .count()
    assert(overlaps == 0)
  }

  test("stream-static join converges to the batch broadcast join") {
    val events = graft.queries.Q.events(spark, Sf0001)
    val dim = spark.read.parquet(s"$Sf0001/customer.parquet")
    val batch = EventPipeline
      .enrichBySegment(events, dim)
      .groupBy(col("event_type"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "c_mktsegment")
      .collect()

    val stream = EventPipeline
      .enrichBySegment(
        EventPipeline.replayAsStream(spark, s"$Sf0001/events.parquet"),
        dim
      )
      .groupBy(col("event_type"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .format("memory")
      .queryName("seg_counts")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("seg_counts")
        .orderBy("event_type", "c_mktsegment")
        .collect()
      assert(streamed.length == batch.length)
      assert(streamed.zip(batch).forall { case (a, b) => a == b })
    } finally q.stop()
  }

  test("foreachBatch epoch writer is idempotent under micro-batch replay") {
    val out = java.nio.file.Files.createTempDirectory("idem-sink").toString
    val writer = EventPipeline.idempotentEpochWriter(out)
    val batch = graft.queries.Q
      .events(spark, Sf0001)
      .limit(100)
      .select(col("event_id"), col("event_type"))

    writer(batch, 0L)
    writer(batch.limit(40), 1L)
    val afterFirst = spark.read.parquet(out).count()
    // replay epoch 1 (the failure-recovery path): same data, same epoch
    writer(batch.limit(40), 1L)
    val afterReplay = spark.read.parquet(out).count()
    assert(afterFirst == 140)
    assert(afterReplay == 140) // overwrite-by-partition: no duplicates
    // and the streaming entry wires the writer end-to-end
    val q = EventPipeline.windowedCountsToParquet(
      EventPipeline.replayAsStream(spark, s"$Sf0001/events.parquet"),
      out + "-stream"
    )
    try {
      q.processAllAvailable()
      val n = spark.read.parquet(out + "-stream").count()
      assert(n > 0)
    } finally q.stop()
  }

  test("Trigger.AvailableNow at sf0.1: multi-batch stream equals batch on windows and sessions") {
    // VERDICT r7 #6 — the streaming tier end-to-end at BENCH scale
    // (100K events), not toy input: the corpus is split into 8 files and
    // replayed 2 per micro-batch under Trigger.AvailableNow (the
    // process-everything-then-stop trigger a backfill run uses), so the
    // engine must carry real windowed/session state ACROSS micro-batches
    // and still converge to the batch answer.
    import org.apache.spark.sql.streaming.Trigger
    val ev = graft.queries.Q.events(spark, Sf01)
    // Replay as 8 TIME-RANGE files with increasing mtimes (the file
    // source orders by modification time) — a real backfill replays
    // roughly time-ordered segments. Order matters for the session
    // query: the session-merge operator drops watermark-late rows even
    // in complete mode, so a replay whose every file spans the whole
    // month would advance the watermark to ~max after batch 1 and
    // discard most subsequent input — a property of the OPERATOR's
    // late-data contract, not a convergence bug (the late-data test
    // below pins the dropping behavior explicitly).
    val rangeDir = java.nio.file.Files.createTempDirectory("sf01-ranges")
    ev.repartitionByRange(8, col("ts")).write.mode("overwrite").parquet(rangeDir.toString)
    val dir = java.nio.file.Files.createTempDirectory("sf01-replay").toString
    val parts = new java.io.File(rangeDir.toString)
      .list()
      .filter(_.endsWith(".parquet"))
      .sorted // part-00000..part-00007: range partitions are time-ordered
    val now = System.currentTimeMillis()
    parts.zipWithIndex.foreach { case (p, i) =>
      val dest = java.nio.file.Paths.get(dir, f"part-$i.parquet")
      java.nio.file.Files.copy(rangeDir.resolve(p), dest)
      dest.toFile.setLastModified(now - (parts.length - i) * 60000L)
    }
    val schema = spark.read.parquet(dir).schema
    def stream = graft.queries.Q.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(dir)
    )

    val batchWin = EventPipeline
      .windowedCountsCents(ev)
      .orderBy("window_start", "event_type")
      .collect()
    val qw = EventPipeline
      .windowedCountsStream(stream)
      .writeStream
      .format("memory")
      .queryName("sf01_win")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(qw.awaitTermination(300000), "windowed-counts stream did not finish")
      // prove this exercised MULTI-batch state, not one big batch
      assert(qw.recentProgress.count(_.numInputRows > 0) >= 2)
      val streamed = spark
        .table("sf01_win")
        .orderBy("window_start", "event_type")
        .collect()
      assert(streamed.length == batchWin.length)
      assert(streamed.zip(batchWin).forall { case (a, b) => a == b })
    } finally qw.stop()

    val batchSess = EventPipeline
      .sessionize(ev)
      .orderBy("user_id", "session_start")
      .collect()
    val qs = EventPipeline
      .sessionizeStream(stream)
      .writeStream
      .format("memory")
      .queryName("sf01_sess")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      assert(qs.awaitTermination(300000), "sessionize stream did not finish")
      val streamed = spark
        .table("sf01_sess")
        .orderBy("user_id", "session_start")
        .collect()
      assert(streamed.length == batchSess.length)
      assert(streamed.zip(batchSess).forall { case (a, b) => a == b })
    } finally qs.stop()
  }

  test("late data beyond the watermark is dropped from already-finalized windows") {
    val ev = graft.queries.Q.events(spark, Sf0001)
    // phase A: the full month of events; phase B: day-1 replays arriving
    // AFTER the watermark has advanced to day 30 — weeks late
    val bounds = ev.agg(min(col("ts")), max(col("ts"))).collect()(0)
    val (minTs, maxTs) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    val late = ev
      .filter(col("ts") < lit(new java.sql.Timestamp(minTs.getTime + 24L * 3600 * 1000)))
      .withColumn("event_id", col("event_id") + 10000000L)
    assert(late.count() > 0)

    val streamDir = java.nio.file.Files.createTempDirectory("late-replay")
    def writeAs(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("late-part")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files
        .list(tmp)
        .filter(f => f.toString.endsWith(".parquet"))
        .findFirst()
        .get()
      val dest = streamDir.resolve(name)
      java.nio.file.Files.copy(part, dest)
      dest.toFile.setLastModified(mtime)
    }
    // phase order matters: the mid file runs a batch under the advanced
    // watermark so the day-1 windows FINALIZE (emit + state eviction)
    // before the late replays arrive in phase 3
    val mid = ev
      .filter(col("ts") >= lit(new java.sql.Timestamp(maxTs.getTime - 3600 * 1000)))
      .withColumn("event_id", col("event_id") + 20000000L)
    val now = System.currentTimeMillis()
    writeAs(ev, "part-0.parquet", now - 120000)
    writeAs(mid, "part-1.parquet", now - 60000)
    writeAs(late, "part-2.parquet", now)

    val schema = spark.read.parquet(s"$streamDir/part-0.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir.toString)
    // APPEND mode: a window is emitted exactly once, when the watermark
    // passes its end — later arrivals for it are dropped, which is the
    // contract under test (update mode would re-open still-held state)
    val q = EventPipeline
      .windowedCountsStream(stream)
      .writeStream
      .format("memory")
      .queryName("late_counts")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("late_counts")
        .select("window_start", "event_type", "n_events", "sum_value_cents")
        .orderBy("window_start", "event_type")
        .collect()
      // expected: the WITHOUT-late batch result, restricted to windows
      // the final watermark (maxTs - 30min) has finalized
      val wm = new java.sql.Timestamp(maxTs.getTime - 30 * 60 * 1000)
      // mid-phase rows touch only the last hour — never a finalized
      // window — so the finalized set must match the plain batch over ev
      val withoutLate = EventPipeline
        .windowedCountsCents(ev)
        .filter(col("window_end") <= lit(wm))
        .select("window_start", "event_type", "n_events", "sum_value_cents")
        .orderBy("window_start", "event_type")
        .collect()
      assert(streamed.nonEmpty)
      // append-once: no (window, type) may be emitted twice — a late row
      // recreating evicted state would re-emit its window as a duplicate
      val keys = streamed.map(r => (r.getTimestamp(0), r.getString(1)))
      assert(keys.distinct.length == keys.length)
      assert(streamed.toSeq == withoutLate.toSeq)
      // sanity: had the late rows been accepted, day-1 windows would differ
      assert(
        EventPipeline
          .windowedCountsCents(ev.unionByName(late))
          .except(EventPipeline.windowedCountsCents(ev))
          .count() > 0
      )
    } finally q.stop()
  }
  test("lateness audit: per-type counts match a driver-side replay of the watermark rule") {
    val rows = graft.queries.StreamQueries.queries("s_lateness_audit")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // replay: arrival order = event_id per user; watermark = running max - 10 min
    val ev = graft.queries.Q.events(spark, Sf0001)
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("ts").getTime * 1000L))
    val byUser = ev.groupBy(_._2)
    val late = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val total = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    byUser.values.foreach { es =>
      var seenMax = Long.MinValue
      es.sortBy(_._1).foreach { case (_, _, typ, tsUs) =>
        total(typ) += 1
        if (seenMax != Long.MinValue && tsUs < seenMax - 600000000L) late(typ) += 1
        seenMax = math.max(seenMax, tsUs)
      }
    }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_events") == total(t))
      assert(r.getAs[Long]("n_late") == late(t))
      assert(r.getAs[Long]("late_frac_e6") == late(t) * 1000000L / total(t))
    }
  }
}
