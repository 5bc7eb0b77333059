package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 — deterministic mock user source (the reference's fallback generator).
  *
  * Reference: src/lib/randomuser.js:3-28 (`generateMockUser`/`fallbackUsers`):
  * 50 users; gender alternates by `index % 2` (:4); first name John/Jane+index,
  * last name Doe+index (:13); lowercase synthesized email (:14); zero-padded
  * phone (:15); country cycles USA/Canada/Mexico by `index % 3` (:7); city by
  * parity (:8); `registered.date = now − index·86400000 ms` (:9).
  *
  * Three intentional deltas for determinism (SURVEY.md §7.3 "hard parts"):
  * the `Math.random()` id suffix (:12) becomes `mock-id-<index>`; `now` is
  * pinned to T0 = 2026-01-01T00:00:00Z (FIXTURES.md A2) so golden tests
  * have closed-form expectations (rows=50, countries=3, cities=2,
  * lastUser="John0 Doe0"); and the picture URL
  * (`randomuser.me/api/portraits/${gender}/${index}.jpg` with gender
  * men/women by index parity, src/lib/randomuser.js:16-18) becomes the
  * neutral `example.com/thumb/<index>.jpg` — the reference's URL points at
  * a live third-party image host that this engine never fetches; nothing
  * downstream reads the URL's structure, only its presence (the thumbnail
  * column is carried verbatim, pages/index.js:300).
  *
  * Scale note: generated via `spark.range(n)` — a parallel, partitioned
  * source with no driver-side materialization; n=50 for parity but the same
  * plan generates 10^9 rows across a cluster unchanged.
  */
object MockUserSource {

  /** Pinned generation instant (replaces the reference's `Date.now()`). */
  val T0 = "2026-01-01 00:00:00"

  val DefaultCount = 50 // src/lib/randomuser.js:24

  /** ISO-8601 format matching JS `Date.toISOString()` (pages/index.js:119). */
  val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  /** `String(index).padStart(2, '0')` (src/lib/randomuser.js:15): pad to
    * two digits WITHOUT truncating — index 5 → "05", index 150 → "150".
    * Spark's `lpad` truncates ("150" → "15"), wrong for index ≥ 100
    * (VERDICT r3 #4), so pad conditionally.
    */
  def padIndex(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(i < 10, concat(lit("0"), i.cast("string"))).otherwise(i.cast("string"))

  /** Normalized users in the FIXTURES.md A1 nested shape. */
  def users(spark: SparkSession, n: Int = DefaultCount): DataFrame = {
    val i = col("i")
    val first =
      when(i % 2 === 0, concat(lit("John"), i)).otherwise(concat(lit("Jane"), i))
    val last = concat(lit("Doe"), i)
    val country = element_at(
      array(lit("USA"), lit("Canada"), lit("Mexico")),
      (i % 3 + 1).cast("int")
    )
    val city = when(i % 2 === 0, lit("New York")).otherwise(lit("Los Angeles"))
    val registered = date_format(
      expr(s"timestampadd(DAY, -CAST(i AS INT), TIMESTAMP'$T0')"),
      IsoFmt
    )
    spark
      .range(n)
      .toDF("i")
      .select(
        struct(concat(lit("mock-id-"), i).as("value")).as("id"),
        struct(first.as("first"), last.as("last")).as("name"),
        lower(concat(first, lit("."), last, lit("@example.com"))).as("email"),
        concat(lit("555-0101-"), padIndex(i)).as("phone"),
        struct(country.as("country"), city.as("city")).as("location"),
        struct(registered.as("date")).as("registered"),
        struct(
          concat(lit("https://example.com/thumb/"), i, lit(".jpg"))
            .as("thumbnail")
        ).as("picture")
      )
  }

  /** Raw API-envelope-shaped rows (FIXTURES.md A3) for exercising the
    * Normalize projection: carries `login.uuid` alongside `id.value`, with
    * `id.value` null for every 5th row (exercises the coalesce at
    * src/lib/randomuser.js:50) and an invalid `registered.date` for every
    * 10th row (exercises the isNaN gate at :107).
    */
  def rawUsers(spark: SparkSession, n: Int = DefaultCount): DataFrame = {
    val i = col("i")
    val first =
      when(i % 2 === 0, concat(lit("John"), i)).otherwise(concat(lit("Jane"), i))
    val last = concat(lit("Doe"), i)
    val country = element_at(
      array(lit("USA"), lit("Canada"), lit("Mexico")),
      (i % 3 + 1).cast("int")
    )
    val city = when(i % 2 === 0, lit("New York")).otherwise(lit("Los Angeles"))
    val goodDate = date_format(
      expr(s"timestampadd(DAY, -CAST(i AS INT), TIMESTAMP'$T0')"),
      IsoFmt
    )
    val registered =
      when(i % 10 === 0, lit("not-a-date")).otherwise(goodDate)
    spark
      .range(n)
      .toDF("i")
      .select(
        struct(
          when(i % 5 === 0, lit(null: String))
            .otherwise(concat(lit("id-"), i))
            .as("value")
        ).as("id"),
        struct(concat(lit("uuid-"), i).as("uuid")).as("login"),
        struct(first.as("first"), last.as("last")).as("name"),
        lower(concat(first, lit("."), last, lit("@example.com"))).as("email"),
        concat(lit("555-0101-"), padIndex(i)).as("phone"),
        struct(country.as("country"), city.as("city")).as("location"),
        struct(registered.as("date")).as("registered"),
        struct(
          concat(lit("https://example.com/thumb/"), i, lit(".jpg"))
            .as("thumbnail")
        ).as("picture")
      )
  }
}
