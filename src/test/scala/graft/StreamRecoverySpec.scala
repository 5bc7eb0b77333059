package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import graft.streaming.EventPipeline

/** Checkpoint RECOVERY proof (VERDICT r11 #2): StreamingSpec shows each
  * transform converges to the batch result when replayed in one run —
  * this suite shows the property that makes Structured Streaming
  * trustworthy on a real cluster: stop the query mid-stream, restart it
  * from the same checkpoint directory, and the final sink still equals
  * the batch result EXACTLY — no lost windows (state recovered), no
  * duplicated emissions (offsets + idempotent epoch sink).
  *
  * Harness: the events corpus is split into time-ordered chunk files
  * (ascending ts, so nothing is watermark-late at a chunk boundary) and
  * replayed with maxFilesPerTrigger=1. Run 1 sees only the first half of
  * the chunks, processes them, and STOPS. The remaining chunks (plus,
  * for the watermarked append-mode queries, a far-future sentinel row
  * that pushes the watermark past every real window so the tail state
  * flushes) land in the directory, and run 2 restarts from the SAME
  * checkpoint. The sink is the repo's own exactly-once pattern
  * ([[EventPipeline.idempotentEpochWriter]]): epoch-partitioned parquet,
  * each epoch overwriting itself on replay.
  */
class StreamRecoverySpec extends SparkSpecBase {

  private def events: DataFrame = graft.queries.Q.events(spark, Sf0001)

  /** Write `df` as a single parquet file named `name` inside `dir`. */
  private def writeChunk(df: DataFrame, dir: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-chunk")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written for chunk $name"))
    Files.move(part, dir.resolve(name))
  }

  /** Split events into `n` time-ordered chunks (chunk i holds the i-th
    * ntile by (ts, event_id) — ascending time, deterministic).
    */
  private def chunks(n: Int): IndexedSeq[DataFrame] = {
    val w = Window.orderBy(col("ts"), col("event_id"))
    val tiled = events.withColumn("chunk", ntile(n).over(w))
    (1 to n).map(i => tiled.filter(col("chunk") === i).drop("chunk"))
  }

  /** One far-future sentinel event (user_id = -1, event_type =
    * 'zz_sentinel'): advances the watermark past every real window so
    * append-mode tail state flushes; filtered out of every comparison.
    */
  private def sentinel: DataFrame = {
    val maxTs = events.agg(max(col("ts"))).first().getTimestamp(0)
    events.limit(1).select(
      lit(-1L).as("event_id"),
      lit(new java.sql.Timestamp(maxTs.getTime + 86400L * 1000)).as("ts"),
      lit(-1L).as("user_id"),
      lit("zz_sentinel").as("event_type"),
      lit(0.0).as("value"),
      lit("").as("props"))
  }

  /** Run the stop/restart harness: `transform` maps the replayed stream
    * to the query; returns the sink directory's rows after run 2.
    */
  private def runWithRestart(
      transform: DataFrame => DataFrame,
      outputMode: String,
      withSentinel: Boolean): DataFrame = {
    val streamDir = Files.createTempDirectory("graft-replay")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outDir = Files.createTempDirectory("graft-sink").toString
    val cs = chunks(6)
    val schema = events.schema

    def start() = transform(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString))
      .writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .foreachBatch(EventPipeline.idempotentEpochWriter(outDir))
      .start()

    // run 1: first half of the stream, then STOP mid-stream
    (0 until 3).foreach(i => writeChunk(cs(i), streamDir, s"c$i.parquet"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // rest of the stream (+ sentinel to flush watermarked tail state)
    (3 until 6).foreach(i => writeChunk(cs(i), streamDir, s"c$i.parquet"))
    if (withSentinel) writeChunk(sentinel, streamDir, "c9.parquet")

    // run 2: restart from the SAME checkpoint
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    spark.read.parquet(outDir)
  }

  test("windowed counts survive a mid-stream restart: no lost windows, no dupes") {
    val out = runWithRestart(
      EventPipeline.windowedCountsStream, "append", withSentinel = true)
      .filter(col("event_type") =!= "zz_sentinel")
      .select("window_start", "window_end", "event_type", "n_events", "sum_value_cents")
    // exactly-once: each (window, type) emitted in exactly one epoch
    assert(out.count() ==
      out.select("window_start", "event_type").distinct().count(),
      "a window was emitted in more than one epoch (duplicate emission)")
    val streamed = out.collect().map(_.toSeq).toSet
    val batch = EventPipeline.windowedCountsCents(events)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"restarted stream diverges from batch: missing ${batch -- streamed}, extra ${streamed -- batch}")
  }

  test("session windows survive a mid-stream restart") {
    val out = runWithRestart(
      EventPipeline.sessionizeStream, "append", withSentinel = true)
      .filter(col("user_id") >= 0)
      .select("user_id", "session_start", "session_end", "n_events")
    assert(out.count() ==
      out.select("user_id", "session_start").distinct().count(),
      "a session was emitted in more than one epoch (duplicate emission)")
    val streamed = out.collect().map(_.toSeq).toSet
    val batch = EventPipeline.sessionize(events).collect().map(_.toSeq).toSet
    assert(streamed == batch,
      s"restarted sessionization diverges from batch: missing ${batch -- streamed}, extra ${streamed -- batch}")
  }

  test("mapGroupsWithState running stats continue from recovered state after restart") {
    val out = runWithRestart(
      ev => EventPipeline.runningUserStats(ev).toDF(),
      "update", withSentinel = false)
    // counts are monotone per user, so the max struct is the final state;
    // it equals the batch totals ONLY if run 2 resumed from run 1's state
    // (a fresh state store would end at the second half's counts alone)
    val finalStats = out
      .groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("sum_value_cents"))).as("m"))
      .select(col("user_id"), col("m.n_events"), col("m.sum_value_cents"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS LONG)")).as("c"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(finalStats == batch,
      "state was not recovered across the restart (final counts != batch totals)")
  }
}
