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
}
