package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{Duration, Instant}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.types.ArrayType

import graft.model.Schemas
import graft.etl.Normalize

/** S1 — HTTP JSON source with fallback-never-fail semantics.
  *
  * Reference: src/lib/randomuser.js:30-68 — fetch `?results=500` users
  * (:1, :37), URL overridable via `RANDOMUSER_API_URL` (:31), HTTP status
  * check (:40-42), envelope validation `Array.isArray(data.results)`
  * (:45-47, our F1), and on ANY failure a silent switch to the deterministic
  * mock source with `fallbackUsed = true` (:59-62) — the pipeline never
  * fails at the source.
  *
  * Spark-first design: the single-payload fetch happens driver-side (one
  * small HTTP body is not distributable work); parsing + projection happen
  * in Spark (`spark.read.schema(raw).json(...)`) so schema pruning and the
  * Normalize projection stay in the distributed plan. At scale, many URLs
  * would arrive as a DataFrame of endpoints processed by a partitioned
  * fetch; for the reference's one-endpoint semantics a driver fetch is the
  * honest shape.
  */
object HttpUserSource {

  /** reference: src/lib/randomuser.js:1 */
  val DefaultUrl = "https://randomuser.me/api/?results=500"

  final case class Result(
      users: DataFrame,
      fallbackUsed: Boolean,
      sourceUrl: String,
      fetchedAt: String
  )

  /** Load users; never throws (reference :59-62). `fetch` is injectable for
    * tests (and because this environment has zero egress, the real fetch
    * path exercises the fallback branch deterministically).
    */
  def load(
      spark: SparkSession,
      url: Option[String] = None,
      fetch: String => String = httpGet
  ): Result = {
    val target = url
      .orElse(sys.env.get("RANDOMUSER_API_URL")) // randomuser.js:31
      .getOrElse(DefaultUrl)
    val fetchedAt = Instant.now().toString
    try {
      val body = fetch(target)
      import spark.implicits._
      val envelope = spark.read
        .schema(
          s"results ${ArrayType(Schemas.raw).sql.toLowerCase}"
        )
        .json(spark.createDataset(Seq(body)))
      // F1 — envelope validation (randomuser.js:45-47): `results` must be a
      // non-null array; a scalar/missing field parses to null and is rejected.
      val rows = envelope.filter(col("results").isNotNull)
      if (rows.isEmpty) throw new IllegalArgumentException("bad envelope")
      val raw = rows.select(explode(col("results")).as("u")).select(col("u.*"))
      Result(Normalize(raw), fallbackUsed = false, target, fetchedAt)
    } catch {
      case NonFatal(_) =>
        // randomuser.js:59-62 — silent fallback, flag set
        Result(
          MockUserSource.users(spark),
          fallbackUsed = true,
          target,
          fetchedAt
        )
    }
  }

  private def httpGet(url: String): String = {
    val client =
      HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()
    val req = HttpRequest
      .newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(10))
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) // randomuser.js:40-42
      throw new IllegalStateException(s"HTTP ${resp.statusCode()}")
    resp.body()
  }
}
