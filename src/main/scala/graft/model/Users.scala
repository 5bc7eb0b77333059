package graft.model

import org.apache.spark.sql.types._

/** Data model for the user-ETL parity tier.
  *
  * The reference normalizes every source row to a fixed 7-field nested shape
  * (reference: src/lib/randomuser.js:49-57; mock generator :11-19). We mirror
  * that shape 1:1 as a Scala case-class tree (usable as a `Dataset[User]`
  * encoder) and as an explicit `StructType` for schema-on-read.
  */
final case class UserId(value: String)
final case class UserName(first: String, last: String)
final case class UserLocation(country: String, city: String)
final case class UserRegistered(date: String) // ISO-8601; parsed downstream
final case class UserPicture(thumbnail: String)

final case class User(
    id: UserId,
    name: UserName,
    email: String,
    phone: String,
    location: UserLocation,
    registered: UserRegistered,
    picture: UserPicture
)

object Schemas {

  /** Normalized user schema (FIXTURES.md A1). All leaves nullable — the
    * reference accesses every field defensively (pages/index.js:112-119).
    */
  val user: StructType = StructType(
    Seq(
      StructField("id", StructType(Seq(StructField("value", StringType)))),
      StructField(
        "name",
        StructType(
          Seq(StructField("first", StringType), StructField("last", StringType))
        )
      ),
      StructField("email", StringType),
      StructField("phone", StringType),
      StructField(
        "location",
        StructType(
          Seq(StructField("country", StringType), StructField("city", StringType))
        )
      ),
      StructField("registered", StructType(Seq(StructField("date", StringType)))),
      StructField(
        "picture",
        StructType(Seq(StructField("thumbnail", StringType)))
      )
    )
  )

  /** Raw source envelope schema — the subset of the Random User API payload
    * that the Transform projection reads (reference: src/lib/randomuser.js:49-57
    * reads id.value, login.uuid, name.*, email, phone, location.*,
    * registered.date, picture.thumbnail; everything else is dropped).
    * `spark.read.schema(raw).json(...)` prunes the rest at parse time.
    */
  val raw: StructType = StructType(
    Seq(
      StructField("id", StructType(Seq(StructField("value", StringType)))),
      StructField("login", StructType(Seq(StructField("uuid", StringType)))),
      StructField(
        "name",
        StructType(
          Seq(StructField("first", StringType), StructField("last", StringType))
        )
      ),
      StructField("email", StringType),
      StructField("phone", StringType),
      StructField(
        "location",
        StructType(
          Seq(StructField("country", StringType), StructField("city", StringType))
        )
      ),
      StructField("registered", StructType(Seq(StructField("date", StringType)))),
      StructField(
        "picture",
        StructType(Seq(StructField("thumbnail", StringType)))
      )
    )
  )
}

/** Unified run-metrics contract (SURVEY.md §2.9): the union of the metric set
  * the reference *computes* (src/lib/randomuser.js:117-122) and the set it
  * *declares* but only ever fakes with static constants
  * (src/mock-data/etl.json:3-10) — here all computed for real.
  */
final case class RunMetrics(
    rows_in: Long,
    rows_out: Long,
    dedup_removed: Long,
    countries: Long,
    uniqueCities: Long,
    totalUsers: Long,
    avgRegistrationYears: Double,
    lastUser: String,
    duration_sec: Double
)

/** Run envelope (reference: src/lib/randomuser.js:64-67 returns
  * {users, fallbackUsed, sourceUrl, fetchedAt}).
  */
final case class RunEnvelope(
    fallbackUsed: Boolean,
    sourceUrl: String,
    fetchedAt: String
)
