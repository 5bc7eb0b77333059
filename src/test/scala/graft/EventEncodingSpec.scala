package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.queries.Q
import graft.streaming.EventPipeline

/** The driver has regenerated `events.parquet` with a different `ts`
  * encoding twice now (round 3: TIMESTAMP(NANOS) → LONG-nanos under the
  * legacy conf; round 6: plain timestamp[us] = TIMESTAMP_NTZ). This spec
  * pins the contract those regenerations have been asking for: the SAME
  * logical events written under all three encodings must flow through
  * [[Q.normalizeEventTs]] to byte-identical query results.
  *
  * The nanos fixture is written as a plain INT64 column — under
  * `spark.sql.legacy.parquet.nanosAsLong=true` a real TIMESTAMP(NANOS)
  * column ALSO surfaces as LongType, so both hit the identical LongType
  * dispatch arm; Spark cannot author the NANOS annotation itself.
  */
class EventEncodingSpec extends SparkSpecBase {

  /** Logical fixture: micros timestamps with deliberately non-round
    * sub-second parts; the nanos encoding adds +437 ns of sub-micro
    * noise that truncation (ts div 1000) must discard.
    */
  private lazy val encodedDirs: Map[String, String] = {
    import spark.implicits._
    val base = 1735689600000000L // 2025-01-01T00:00:00Z in micros
    val rows = (0 until 200).map { i =>
      (i.toLong, base + i * 1234567L, (i % 7).toLong,
        Seq("view", "click", "purchase")(i % 3), (i % 50) / 4.0, s"""{"i":$i}""")
    }
    val logical = rows
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")

    def writeAs(name: String, ts: org.apache.spark.sql.Column): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"enc-$name").toString
      logical
        .withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(s"$dir/events.parquet")
      dir
    }

    Map(
      "nanos" -> writeAs("nanos", col("us") * 1000L + 437L),
      "ntz" -> writeAs("ntz", timestamp_micros(col("us")).cast("timestamp_ntz")),
      "ltz" -> writeAs("ltz", timestamp_micros(col("us")))
    )
  }

  private def normalized(dir: String): DataFrame = Q.events(spark, dir)

  test("all three encodings normalize to TIMESTAMP with identical micros") {
    val collected = encodedDirs.map { case (name, dir) =>
      val df = normalized(dir)
      assert(
        df.schema("ts").dataType == TimestampType,
        s"$name: expected TimestampType, got ${df.schema("ts").dataType}"
      )
      name -> df
        .select(col("event_id"), unix_micros(col("ts")))
        .orderBy("event_id")
        .collect()
        .toSeq
    }
    val Seq(a, b, c) = collected.values.toSeq
    assert(a == b && b == c, "micros values differ across encodings")
    // and the truncation arm really truncated: first row back at base micros
    assert(collected("nanos").head.getLong(1) == 1735689600000000L)
  }

  test("a windowed aggregate is byte-identical across encodings") {
    def run(dir: String): Seq[Row] =
      EventPipeline
        .windowedCountsCents(normalized(dir))
        .orderBy("window_start", "event_type")
        .collect()
        .toSeq
    val results = encodedDirs.view.mapValues(run).toMap
    assert(results("nanos").nonEmpty)
    assert(results("nanos") == results("ntz"))
    assert(results("ntz") == results("ltz"))
  }

  test("replayAsStream normalizes like the batch reader for every encoding") {
    encodedDirs.foreach { case (name, dir) =>
      val stream =
        EventPipeline.replayAsStream(spark, s"$dir/events.parquet/" +
          new java.io.File(s"$dir/events.parquet")
            .list()
            .filter(_.endsWith(".parquet"))
            .head)
      assert(
        stream.schema("ts").dataType == TimestampType,
        s"$name: stream ts is ${stream.schema("ts").dataType}"
      )
    }
  }

  test("the shipped testdata encoding flows through Q.events as TIMESTAMP") {
    val df = Q.events(spark, Sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    // unix_micros was the round-6 casualty — assert it analyzes and runs
    assert(df.select(unix_micros(col("ts"))).limit(1).collect().nonEmpty)
  }
}
