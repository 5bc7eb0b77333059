package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** P1/P2 — the "Transform" stage: shape-normalizing projection.
  *
  * Reference: src/lib/randomuser.js:49-57 — per-row map from the raw API
  * schema to the fixed 7-field nested schema, dropping all other fields
  * (column pruning by construction); the row key is
  * `user.id.value ?? user.login.uuid` (:50 — P2, a null-coalesce).
  *
  * In Spark this is a single declarative `select` of nested structs:
  * Catalyst's ColumnPruning pushes the implied pruning into the scan, and
  * the whole projection stays inside one WholeStageCodegen span.
  */
object Normalize {

  def apply(raw: DataFrame): DataFrame =
    raw.select(
      // P2 — coalesce key derivation (randomuser.js:50)
      struct(coalesce(col("id.value"), col("login.uuid")).as("value"))
        .as("id"),
      struct(col("name.first").as("first"), col("name.last").as("last"))
        .as("name"),
      col("email"),
      col("phone"),
      struct(
        col("location.country").as("country"),
        col("location.city").as("city")
      ).as("location"),
      struct(col("registered.date").as("date")).as("registered"),
      struct(col("picture.thumbnail").as("thumbnail")).as("picture")
    )

  /** P3/P4 — flattening projection for the CSV sink: 8 columns from nested
    * paths with `''` defaults for missing values (pages/index.js:108,
    * :111-120), timestamps re-serialized to ISO-8601 (:119).
    *
    * The reference's `new Date(x).toISOString()` throws→'' on invalid input;
    * `try_to_timestamp` yields null → coalesced to '' — same semantics,
    * ANSI-safe.
    */
  def flattenForCsv(users: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = coalesce(c, lit(""))
    users.select(
      d(col("id.value")).as("id"),
      d(col("name.first")).as("name_first"),
      d(col("name.last")).as("name_last"),
      d(col("email")).as("email"),
      d(col("phone")).as("phone"),
      d(col("location.country")).as("country"),
      d(col("location.city")).as("city"),
      d(
        date_format(
          try_to_timestamp(col("registered.date")),
          "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        )
      ).as("registered_date")
    )
  }
}
