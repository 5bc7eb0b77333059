package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.etl.{Clean, Metrics, Normalize, Pipeline}
import graft.sources.{HttpUserSource, MockUserSource}

/** Golden tests for the parity tier on the deterministic 50-row mock
  * (FIXTURES.md A2: closed-form expectations).
  */
class PipelineSpec extends SparkSpecBase {

  test("A1-A4 metrics on the mock source match closed form") {
    val row = Metrics.buildMetrics(MockUserSource.users(spark)).collect()(0)
    assert(row.getAs[Long]("totalUsers") == 50)
    assert(row.getAs[Long]("uniqueCountries") == 3)
    assert(row.getAs[Long]("uniqueCities") == 2)
    // dates: index 0 = 2026-01-01 (year 2026), indices 1..49 all 2025
    val y = LocalDate.now(java.time.ZoneOffset.UTC).getYear
    val expected = BigDecimal(((y - 2026) + 49.0 * (y - 2025)) / 50.0)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(row.getAs[Double]("avgRegistrationYears") == expected)
  }

  test("lastUser is the most recently registered (John0 Doe0)") {
    val row = Metrics.compute(MockUserSource.users(spark)).collect()(0)
    assert(row.getAs[String]("lastUser") == "John0 Doe0")
  }

  test("normalize coalesces id.value with login.uuid (P2)") {
    val out = Normalize(MockUserSource.rawUsers(spark))
      .select(col("id.value"))
      .collect()
      .map(_.getString(0))
    assert(out.forall(_ != null))
    assert(out.count(_.startsWith("uuid-")) == 10) // every 5th raw id null
  }

  test("clean removes invalid-date rows; dedup identity holds (F2/F4/A6)") {
    val raw = Normalize(MockUserSource.rawUsers(spark))
    val metricsRow = Metrics.compute(raw).collect()(0)
    val in = metricsRow.getAs[Long]("rows_in")
    val out = metricsRow.getAs[Long]("rows_out")
    val removed = metricsRow.getAs[Long]("dedup_removed")
    assert(in == 50)
    assert(out == 45) // every 10th row has an unparseable date
    assert(out + removed == in)
    assert(Clean(raw).count() == out) // agg and operator paths agree
  }

  test("pipeline run produces envelope + measured duration (A8/K2)") {
    val r = Pipeline.run(spark)
    assert(r.durationSec > 0)
    assert(r.fallbackUsed)
    assert(r.logs.map(_.stage) == Seq("Extract", "Transform", "Load"))
    assert(r.logs.forall(_.toString.split(" \\| ").length == 3)) // K4 shape
  }

  test("HTTP source falls back silently on unreachable endpoint (S1/F1)") {
    val r = HttpUserSource.load(spark, Some("http://127.0.0.1:9/nope"))
    assert(r.fallbackUsed)
    assert(r.users.count() == 50)
  }
}
