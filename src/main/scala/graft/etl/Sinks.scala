package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K1/K2/K4 — sinks.
  *
  * K1 CSV export (pages/index.js:107-133): 8-column header + one quoted line
  * per user, all rows (not just the displayed 20). Quoting rules
  * (`formatCsvValue`, pages/index.js:446-450): null → '', `"` → `""`, every
  * value always wrapped in quotes — i.e. RFC-4180 with quoteAll. Spark's CSV
  * writer implements exactly this via options.
  *
  * K2 JSON response sink (pages/api/etl/restart.js:14-20):
  * {users, metrics, fallbackUsed, sourceUrl, fetchedAt}.
  *
  * K4 log-line sink: `ts | Stage | message` (src/mock-data/etl.json:12-14,
  * pages/index.js:53-57).
  */
object Sinks {

  val CsvHeader: Seq[String] = Seq(
    "id",
    "name_first",
    "name_last",
    "email",
    "phone",
    "country",
    "city",
    "registered_date"
  ) // pages/index.js:108

  /** K1 — write the flattened projection as quoted CSV. `coalesce(1)` mirrors
    * the reference's single-file browser download; at scale drop it and let
    * each task write its own part file.
    */
  def writeCsv(users: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val flat = Normalize.flattenForCsv(users)
    val out = if (singleFile) flat.coalesce(1) else flat
    out.write
      .mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true") // index.js:450 — always wrap in quotes
      .option("escape", "\"") // index.js:448 — `"` doubled to `""`
      .csv(path)
  }

  /** P5 as a data transform: render each row to its exact CSV line (quote
    * doubling included) so the formatting rules are testable as a query.
    */
  def csvLine(cols: Seq[Column]): Column = {
    def quoted(c: Column): Column =
      concat(
        lit("\""),
        regexp_replace(coalesce(c.cast("string"), lit("")), "\"", "\"\""),
        lit("\"")
      )
    concat_ws(",", cols.map(quoted): _*)
  }

  /** K2 — the run envelope as one JSON document per run. */
  def jsonEnvelope(
      users: DataFrame,
      metrics: DataFrame,
      fallbackUsed: Boolean,
      sourceUrl: String,
      fetchedAt: String
  ): String = {
    val usersJson = users.toJSON.collect().mkString("[", ",", "]")
    val metricsJson = metrics.toJSON.collect().headOption.getOrElse("{}")
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"users":$usersJson,"metrics":$metricsJson,"fallbackUsed":$fallbackUsed,"sourceUrl":${q(
        sourceUrl
      )},"fetchedAt":${q(fetchedAt)}}"""
  }

  /** K2 at SCALE (VERDICT r12 #8) — [[jsonEnvelope]] is parity-faithful
    * to the reference's single HTTP response body (pages/api/etl/
    * restart.js:14-20) and bounded by the L3 source cap at 500 rows,
    * but a 100 TB run cannot materialize its user array on the driver.
    * This variant writes the SAME envelope as a two-part dataset: the
    * users array as partitioned JSON-lines (`df.write.json` — one file
    * per task, never collected, never single-threaded) and a 1-row
    * header document {metrics, fallbackUsed, sourceUrl, fetchedAt,
    * usersPath} pointing at it. SinksSpec asserts the parsed content
    * equals the collect-based envelope field-for-field.
    */
  def writeJsonEnvelopeScaled(
      users: DataFrame,
      metrics: DataFrame,
      fallbackUsed: Boolean,
      sourceUrl: String,
      fetchedAt: String,
      dir: String
  ): Unit = {
    users.write.mode("overwrite").json(s"$dir/users")
    metrics
      .select(struct(metrics.columns.map(col): _*).as("metrics"))
      .select(
        col("metrics"),
        lit(fallbackUsed).as("fallbackUsed"),
        lit(sourceUrl).as("sourceUrl"),
        lit(fetchedAt).as("fetchedAt"),
        lit("users").as("usersPath")
      )
      .coalesce(1)
      .write
      .mode("overwrite")
      .json(s"$dir/envelope")
  }

  /** K4 — one formatted log line: `ts | Stage | message` (etl.json:12-14). */
  def logLine(ts: String, stage: String, message: String): String =
    s"$ts | $stage | $message"
}
