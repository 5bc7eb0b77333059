package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the registered query suite. */
object Q {

  /** A registered query: (session, sf-dir) → result. */
  type Fn = (SparkSession, String) => DataFrame

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The `events` table stores TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses by default; the session mains/test base set
    * `spark.sql.legacy.parquet.nanosAsLong=true` at startup (set once
    * there, not here — a query constructor mutating shared session state is
    * order-dependent for later parquet reads, VERDICT r3 #6). Read nanos as
    * Long and truncate to microseconds with integer division (`div` —
    * double division would lose precision at ~1.7e18 ns). DuckDB's ns→us
    * cast truncates identically.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Exact money arithmetic, portable across engines.
    *
    * The testdata money/rate columns are doubles with ≤2 decimal digits.
    * Naive `sum(double)` is order-dependent, so a Spark result and a DuckDB
    * oracle can differ in the last ulp and fail a hash compare. We instead
    * scale to integer cents (`round(x*100)` is exact for 2-decimal values),
    * aggregate in Long (exact, associative — also partial-agg friendly at
    * 100 TB), and divide back to double only at the very end: the final
    * double is bit-identical no matter the partitioning or engine.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** SQL fragment mirroring [[cents]] for the DuckDB oracle. */
  def centsSql(col: String): String = s"CAST(round($col * 100) AS BIGINT)"

  /** The shared DuckDB CTE reproducing the deterministic mock-user source
    * (FIXTURES.md A2) via `generate_series` — lets DuckDB oracle-check the
    * parity-tier queries without any parquet input.
    */
  def mockUsersCte(n: Int): String =
    s"""WITH u AS (
       |  SELECT i,
       |    CASE WHEN i % 2 = 0 THEN concat('John', i) ELSE concat('Jane', i) END AS first,
       |    concat('Doe', i) AS last,
       |    ['USA','Canada','Mexico'][CAST(i % 3 AS INT) + 1] AS country,
       |    CASE WHEN i % 2 = 0 THEN 'New York' ELSE 'Los Angeles' END AS city,
       |    TIMESTAMP '2026-01-01 00:00:00' - i * INTERVAL '1 day' AS reg
       |  FROM generate_series(0, ${n - 1}) t(i)
       |)""".stripMargin

  val MockUsersCte: String = mockUsersCte(50)

  /** DuckDB mirror of `String(i).padStart(2, '0')` — pad WITHOUT truncating
    * (DuckDB's `lpad`, like Spark's, truncates "150" to "15").
    */
  def padIndexSql(col: String): String =
    s"CASE WHEN $col < 10 THEN concat('0', CAST($col AS VARCHAR)) ELSE CAST($col AS VARCHAR) END"
}
