package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F2/F4/A6 — the cleaning stage: validity filter + exact deduplication.
  *
  * The reference *declares* this stage ("Rows out (valid)", "Removed
  * (invalid)", `dedup_removed` — pages/index.js:180-181,
  * src/mock-data/etl.json:4-6) but never implements it; per SURVEY.md §0.1.2
  * we implement it for real so `dedup_removed = rows_in − rows_out` is
  * actually computed.
  *
  * Validity (F2/F4): row key non-null, email non-null, and a parseable
  * `registered.date` — `try_to_timestamp` returns null on malformed input,
  * reproducing the reference's `isNaN(new Date(...))` gate
  * (src/lib/randomuser.js:105-111) without tripping ANSI mode.
  *
  * Dedup (A6): `dropDuplicates` on the coalesced id key — a hash
  * shuffle-and-first per key. At scale this is one exchange on the key; no
  * driver materialization.
  */
object Clean {

  val keyCol = "id.value"

  def validity(df: DataFrame): DataFrame =
    df.filter(
      col(keyCol).isNotNull &&
        col("email").isNotNull &&
        try_to_timestamp(col("registered.date")).isNotNull
    )

  /** Validity filter + exact dedup on the row key. */
  def apply(df: DataFrame): DataFrame = {
    // dropDuplicates needs a top-level column; derive, dedup, drop.
    validity(df)
      .withColumn("__key", col(keyCol))
      .dropDuplicates("__key")
      .drop("__key")
  }
}
