package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.etl.{Normalize, Sinks}
import graft.sources.MockUserSource

/** K1/P5 — CSV sink byte-level semantics (quoteAll + RFC-4180 quote
  * doubling, reference pages/index.js:446-450).
  */
class SinksSpec extends SparkSpecBase {

  test("CSV export: header, quoteAll, quote-doubling") {
    val dir = Files.createTempDirectory("csvtest").toString
    val users = MockUserSource
      .users(spark, 3)
      .withColumn(
        "name",
        struct(
          concat(lit("He said \""), col("name.first"), lit("\"")).as("first"),
          col("name.last").as("last")
        )
      )
    Sinks.writeCsv(users, dir)
    val part = Files
      .list(Paths.get(dir))
      .iterator()
      .asScala
      .find(_.toString.endsWith(".csv"))
      .get
    val lines = Files.readAllLines(part).asScala
    assert(lines.head == Sinks.CsvHeader.map("\"" + _ + "\"").mkString(","))
    // every field double-quoted; embedded quote doubled
    assert(lines.tail.forall(_.startsWith("\"mock-id-")))
    assert(lines.tail.head.contains("\"He said \"\"John0\"\"\""))
  }

  test("csvLine column renders the same bytes as the writer rules (P5)") {
    val flat = Normalize
      .flattenForCsv(MockUserSource.users(spark, 2))
      .withColumn("email", concat(col("email"), lit("\"x\"")))
    val lines = flat
      .select(Sinks.csvLine(Sinks.CsvHeader.map(col)).as("line"))
      .collect()
      .map(_.getString(0))
    assert(lines.forall(l => l.count(_ == ',') >= 7))
    assert(lines.forall(_.contains("\"\"x\"\"")))
  }

  test("K2 scaled envelope carries identical content to the collect-based envelope") {
    val users = Normalize.flattenForCsv(MockUserSource.users(spark, 50))
    val metrics = spark
      .range(1)
      .select(lit(50L).as("totalUsers"), lit(7L).as("countries"))
    val fetchedAt = "2026-01-01T00:00:00Z"
    val srcUrl = "https://example.invalid/api"

    // collect-based envelope (the parity path), parsed back
    val env = Sinks.jsonEnvelope(users, metrics, fallbackUsed = true, srcUrl, fetchedAt)
    val envDir = Files.createTempDirectory("k2-parity")
    Files.write(envDir.resolve("envelope.json"), env.getBytes("UTF-8"))
    val parsed = spark.read.option("multiLine", "true").json(envDir.toString)

    // scaled envelope (partitioned users + 1-row header)
    val outDir = Files.createTempDirectory("k2-scaled").toString
    Sinks.writeJsonEnvelopeScaled(users, metrics, fallbackUsed = true, srcUrl, fetchedAt, outDir)

    // users: same row set, column-for-column
    val cols = users.columns.sorted.map(col).toSeq
    val parityUsers = parsed
      .select(explode(col("users")).as("u")).select(col("u.*"))
      .select(cols: _*).collect().map(_.toSeq).toSet
    val scaledUsers = spark.read.json(s"$outDir/users")
      .select(cols: _*).collect().map(_.toSeq).toSet
    assert(scaledUsers == parityUsers,
      "scaled users dataset diverges from the collect-based envelope's array")

    // header: same metrics + scalar fields
    val header = spark.read.json(s"$outDir/envelope").collect().head
    val parityRow = parsed.collect().head
    assert(header.getAs[org.apache.spark.sql.Row]("metrics") ==
      parityRow.getAs[org.apache.spark.sql.Row]("metrics"))
    assert(header.getAs[Boolean]("fallbackUsed") ==
      parityRow.getAs[Boolean]("fallbackUsed"))
    assert(header.getAs[String]("sourceUrl") == parityRow.getAs[String]("sourceUrl"))
    assert(header.getAs[String]("fetchedAt") == parityRow.getAs[String]("fetchedAt"))
    // the users dataset really is partitioned files, not a driver blob
    assert(Files.list(Paths.get(outDir, "users")).iterator().asScala
      .exists(_.toString.endsWith(".json")))
  }
}
