package graft.queries

import org.apache.spark.sql.functions._

import graft.etl.{Clean, Metrics, Normalize, Pipeline, Sinks}
import graft.sources.{HttpUserSource, MockUserSource}

/** Registered queries for the reference-parity tier (SURVEY.md §2), each
  * with a DuckDB oracle. Mock-user queries oracle against the shared
  * `generate_series` CTE (no parquet needed); the rest run over the
  * driver's testdata tables.
  */
object ParityQueries {
  import Q._

  private val iso = "%Y-%m-%dT%H:%M:%S.%g"

  val queries: Map[String, Fn] = Map(
    // S2 + P1 + P3/P4 — the deterministic mock source through the
    // flattening CSV projection (randomuser.js:3-28 → index.js:111-120).
    "s2_mock_users" -> ((s, _) =>
      Normalize.flattenForCsv(MockUserSource.users(s)).orderBy("id")),

    // P1/P2 — normalize raw API-shaped rows; coalesced key (randomuser.js:49-57, :50).
    "p1_p2_normalize" -> ((s, _) =>
      Normalize(MockUserSource.rawUsers(s))
        .select(
          col("id.value").as("key"),
          col("name.first").as("name_first"),
          col("email"),
          col("registered.date").as("registered_raw")
        )
        .orderBy("key")),

    // F2 — per-row timestamp-validity predicate (randomuser.js:105-111).
    "f2_timestamp_validity" -> ((s, _) =>
      MockUserSource
        .rawUsers(s)
        .select(
          coalesce(col("id.value"), col("login.uuid")).as("key"),
          try_to_timestamp(col("registered.date")).isNotNull.as("is_valid")
        )
        .orderBy("key")),

    // F4/A6 — validity filter + exact dedup counts in one pass
    // (declared at etl.json:4-6 / index.js:180-181; computed for real).
    // Normalize first so the row key is the P2 coalesce (randomuser.js:50).
    "a6_clean_dedup_counts" -> ((s, _) =>
      Metrics
        .compute(Normalize(MockUserSource.rawUsers(s)))
        .select(col("rows_in"), col("rows_out"), col("dedup_removed"))),

    // A1–A4 — the reference's computed metric set in one agg
    // (randomuser.js:98-122).
    "a1_a4_mock_metrics" -> ((s, _) =>
      Metrics.buildMetrics(MockUserSource.users(s))),

    // A7 — lastUser = most recently registered (etl.json:9).
    "a7_last_user" -> ((s, _) =>
      Metrics.compute(MockUserSource.users(s)).select(col("lastUser"))),

    // §2.9 unified metrics + K2 envelope fields, via the pipeline runner.
    "k2_run_envelope" -> ((s, _) => {
      val r = Pipeline.run(s)
      s.range(1)
        .select(
          lit(r.metrics.getAs[Long]("rows_in")).as("rows_in"),
          lit(r.metrics.getAs[Long]("rows_out")).as("rows_out"),
          lit(r.metrics.getAs[Long]("dedup_removed")).as("dedup_removed"),
          lit(r.metrics.getAs[Long]("countries")).as("countries"),
          lit(r.metrics.getAs[Long]("uniqueCities")).as("uniqueCities"),
          lit(r.metrics.getAs[Long]("totalUsers")).as("totalUsers"),
          lit(r.metrics.getAs[Double]("avgRegistrationYears"))
            .as("avgRegistrationYears"),
          lit(r.metrics.getAs[String]("lastUser")).as("lastUser"),
          lit(r.fallbackUsed).as("fallbackUsed"),
          lit(r.sourceUrl).as("sourceUrl")
        )
    }),

    // K2 round-trip: the run envelope the engine WRITES must re-Extract —
    // serialize via Sinks.jsonEnvelope, re-read with spark.read.json
    // (schema-on-read over the nested users array), explode the users and
    // project identity fields beside the envelope metrics. Oracle = the
    // mock source the run is built from.
    "k2_json_roundtrip" -> ((s, _) => {
      val r = Pipeline.run(s)
      val metricsDf = s
        .range(1)
        .select(
          lit(r.metrics.getAs[Long]("totalUsers")).as("totalUsers"),
          lit(r.metrics.getAs[Long]("countries")).as("countries")
        )
      val env = Sinks.jsonEnvelope(
        Normalize.flattenForCsv(r.users),
        metricsDf,
        r.fallbackUsed,
        r.sourceUrl,
        "2026-01-01T00:00:00Z" // pinned: wall-clock is not oracle-able
      )
      val dir = java.nio.file.Files.createTempDirectory("k2-roundtrip")
      java.nio.file.Files.write(dir.resolve("envelope.json"), env.getBytes("UTF-8"))
      s.read
        .option("multiLine", "true")
        .json(dir.toString)
        .select(
          explode(col("users")).as("u"),
          col("metrics.totalUsers").as("totalUsers"),
          col("metrics.countries").as("countries"),
          col("fallbackUsed")
        )
        .select(
          col("u.id").as("id"),
          col("u.email").as("email"),
          col("u.registered_date").as("registered_date"),
          col("totalUsers"),
          col("countries"),
          col("fallbackUsed")
        )
        .orderBy("id")
    }),

    // A8 — measured pipeline duration (etl.json:8 faked it; we measure).
    // Not SQL-expressible → rows-only check (no oracle entry).
    "a8_duration_sec" -> ((s, _) => {
      val r = Pipeline.run(s)
      s.range(1).select(lit(r.durationSec).as("duration_sec"))
    }),

    // S1/F1 — HTTP source fallback-never-fail semantics (randomuser.js:59-62):
    // unreachable endpoint → deterministic mock with the flag set.
    "f1_envelope_fallback" -> ((s, _) => {
      val r = HttpUserSource.load(s, Some("http://127.0.0.1:9/api"))
      r.users.agg(count(lit(1)).as("n_users"))
        .select(col("n_users"), lit(r.fallbackUsed).as("fallback_used"))
    }),

    // P5/K1 — CSV line rendering incl. quote-doubling (index.js:446-450),
    // with an injected `"` to exercise the escape path.
    "p5_k1_csv_lines" -> ((s, _) => {
      val flat = Normalize
        .flattenForCsv(MockUserSource.users(s))
        .withColumn(
          "name_first",
          concat(lit("He said \""), col("name_first"), lit("\""))
        )
      flat
        .select(
          col("id"),
          Sinks.csvLine(Sinks.CsvHeader.map(col)).as("line")
        )
        .orderBy("id")
    }),

    // K1 round-trip: the CSV the engine WRITES must re-Extract losslessly —
    // write the flattened mock users through the real sink (quoteAll +
    // quote-doubling, incl. an injected `"` field) and read the files
    // back with spark.read.csv; every field must survive byte-for-byte.
    // Oracle = the mock CTE directly: a user of the reference can Load
    // with this engine and re-ingest the artifact with either engine.
    "k1_csv_roundtrip" -> ((s, _) => {
      val users = graft.sources.MockUserSource
        .users(s)
      val tagged = Normalize
        .flattenForCsv(users)
        .withColumn(
          "name_first",
          concat(lit("He said \""), col("name_first"), lit("\""))
        )
      val dir = java.nio.file.Files.createTempDirectory("k1-roundtrip").toString
      val out = tagged.coalesce(1)
      out.write
        .mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", "\"")
        .csv(dir)
      s.read
        .option("header", "true")
        .option("escape", "\"")
        .csv(dir)
        .select(Sinks.CsvHeader.map(col): _*)
        .orderBy("id")
    }),

    // P6 — URL domain extraction with raw-string fallback (index.js:437-444).
    "p6_domain_extract" -> ((s, dir) =>
      table(s, dir, "documents")
        .withColumn(
          "url",
          when(col("doc_id") % 7 === 0, lit("not a url"))
            .otherwise(
              concat(
                lit("https://"),
                col("source"),
                lit(".example.com/p/"),
                col("doc_id")
              )
            )
        )
        .select(
          col("doc_id"),
          expr("coalesce(try_parse_url(url, 'HOST'), url)").as("domain")
        )
        .orderBy("doc_id")),

    // P7 — calendar-year difference histogram (randomuser.js:108 semantics).
    "p7_years_since" -> ((s, dir) =>
      table(s, dir, "orders")
        .groupBy(Metrics.yearsSince(col("o_orderdate")).as("years"))
        .agg(count(lit(1)).as("n"))
        .orderBy("years")),

    // P8 — string formatting helpers (randomuser.js:14-15): lowercase email
    // synthesis + zero-padded phone.
    "p8_string_format" -> ((s, dir) =>
      table(s, dir, "customer")
        .select(
          col("c_custkey"),
          concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com"))
            .as("email"),
          concat(
            lit("555-"),
            lpad((col("c_custkey") % 10000).cast("string"), 4, "0")
          ).as("phone")
        )
        .orderBy("c_custkey")),

    // F3 — null guards before distinct-count (randomuser.js:99-104):
    // count_distinct ignores nulls natively.
    "f3_distinct_nullguard" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
      val nat = table(s, dir, "nation")
      cust
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(
          when(col("c_custkey") % 7 === 0, lit(null: String))
            .otherwise(col("n_name"))
            .as("country")
        )
        .agg(
          count(lit(1)).as("n_rows"),
          count_distinct(col("country")).as("countries")
        )
    }),

    // L1 — deterministic top-20 (index.js:226's limit, made order-stable);
    // plans as TakeOrderedAndProject, no full sort at scale.
    "l1_top20_customers" -> ((s, dir) =>
      table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .limit(20)),

    // L3 — source-side row cap (randomuser.js:1's results=500).
    "l3_source_limit" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(500)),

    // S1 as a DataSource V2 connector: the deterministic generator runs
    // inside the scan (per input partition, executor-side), option-driven
    // row count — `spark.read.format("randomuser").option("n", ...)`.
    // n=150 deliberately crosses the 3-digit index boundary to pin the
    // pad-without-truncate phone semantics (VERDICT r3 #4).
    "s1_dsv2_source" -> ((s, _) =>
      Normalize.flattenForCsv(
        s.read.format("randomuser").option("n", 150).option("partitions", 4).load()
      ).orderBy("id")),

    // L2 — the raw-JSON modal: first 10 users of the page in API order
    // (pages/index.js:262 `users.slice(0, 10)` pretty-printed into the
    // "Raw JSON" modal; object shape per pages/api/etl/restart.js:14-20).
    // API order = index order = most-recent-registered first (registered =
    // T0 − index days), so the deterministic form sorts on registered DESC.
    // Rendering is `to_json` over the full nested user struct — both
    // engines emit compact key-ordered JSON, so the strings hash-match.
    "l2_raw_json_page" -> ((s, _) =>
      MockUserSource
        .users(s)
        .orderBy(col("registered.date").desc)
        .limit(10)
        .select(
          col("id.value").as("key"),
          to_json(
            struct(
              col("id"), col("name"), col("email"), col("phone"),
              col("location"), col("registered"), col("picture")
            )
          ).as("raw_json")
        )
        .orderBy("key")),

    // K3 — degraded zero-metrics result when the pipeline throws
    // (pages/index.js:293-311): poison the CSV sink path, expect the
    // zeroed envelope instead of an exception.
    "k3_degraded_metrics" -> ((s, _) => {
      val r = Pipeline.runSafe(s, csvOut = Some("/proc/nonexistent/x"))
      s.range(1)
        .select(
          lit(r.metrics.getAs[Long]("rows_in")).as("rows_in"),
          lit(r.metrics.getAs[Long]("totalUsers")).as("totalUsers"),
          lit(r.metrics.getAs[Double]("avgRegistrationYears")).as("avgRegistrationYears"),
          lit(r.metrics.getAs[String]("lastUser")).as("lastUser"),
          lit(r.fallbackUsed).as("fallbackUsed"),
          lit(r.users.count()).as("n_users")
        )
    }),

    // K4 — the log-line sink as a driver-checkable query (VERDICT r4
    // "What's missing" #3): the REAL pipeline run's log messages (all
    // deterministic under the mock source), formatted by Sinks.logLine
    // into the reference's `ts | Stage | message` shape (etl.json:12-14)
    // with the reference's pinned timestamps standing in for the run's
    // wall-clock ones (un-oracle-able, like A8).
    "k4_log_lines" -> ((s, _) => {
      val r = Pipeline.run(s)
      val pinnedTs = Seq(
        "2025-11-11T09:00:00Z", // etl.json:12
        "2025-11-11T09:00:17Z", // etl.json:13
        "2025-11-11T09:01:35Z" // etl.json:14
      )
      import s.implicits._
      r.logs
        .zip(pinnedTs)
        .zipWithIndex
        .map { case ((l, ts), i) => (i + 1, Sinks.logLine(ts, l.stage, l.message)) }
        .toDF("seq", "line")
        .orderBy("seq")
    }),

    // A2 at the 100 TB tier: HLL++ approx distinct beside the exact count
    // (SURVEY §7.3 — exact at parity scale, approx for the scale path).
    // The oracle checks the exact count and the within-5%% contract.
    "a2_approx_distinct_scale" -> ((s, dir) => {
      val agg = table(s, dir, "customer").agg(
        count_distinct(col("c_custkey")).as("n_exact"),
        approx_count_distinct(col("c_custkey"), 0.01).as("n_approx")
      )
      agg.select(
        col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") / col("n_exact") <= 0.05)
          .as("approx_within_5pct")
      )
    }),

    // Mergeable distinct sketches — the incremental pattern HLL++ can't
    // do (approx_count_distinct yields a number, not a mergeable state):
    // per-segment DataSketches HLL sketches, persisted as binary, then
    // hll_union_agg'd into a global estimate. At 100 TB this is how
    // distincts are maintained per partition/day and rolled up without
    // rescanning. The sketched domain (25 nation keys) stays far inside
    // the sketch's sparse regime, where HLL is EXACT at any scale factor
    // — so the estimate hash-matches the oracle's plain count(DISTINCT).
    "a3_hll_mergeable_sketches" -> ((s, dir) => {
      val per = table(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(expr("hll_sketch_agg(c_nationkey)").as("sk"))
      per.agg(
        count(lit(1)).as("n_groups"),
        expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)")
          .as("merged_distinct_nations")
      )
    })
  )

  private val mockUsersSelect =
    s"""SELECT concat('mock-id-', i) AS id, first AS name_first, last AS name_last,
       |  lower(concat(first, '.', last, '@example.com')) AS email,
       |  concat('555-0101-', ${Q.padIndexSql("i")}) AS phone,
       |  country, city,
       |  concat(strftime(reg, '%Y-%m-%dT%H:%M:%S.%g'), 'Z') AS registered_date
       |FROM u""".stripMargin

  // Raw-envelope mock (FIXTURES.md A3): key coalesce + every-10th invalid date.
  private val rawUsersCte =
    """WITH u AS (
      |  SELECT i,
      |    CASE WHEN i % 5 = 0 THEN NULL ELSE concat('id-', i) END AS id_value,
      |    concat('uuid-', i) AS login_uuid,
      |    CASE WHEN i % 2 = 0 THEN concat('John', i) ELSE concat('Jane', i) END AS first,
      |    concat('Doe', i) AS last,
      |    CASE WHEN i % 10 = 0 THEN 'not-a-date'
      |         ELSE concat(strftime(TIMESTAMP '2026-01-01 00:00:00' - i * INTERVAL '1 day', '%Y-%m-%dT%H:%M:%S.%g'), 'Z') END AS reg_raw
      |  FROM generate_series(0, 49) t(i)
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "a3_hll_mergeable_sketches" ->
      """SELECT count(DISTINCT c_mktsegment) AS n_groups,
        |  count(DISTINCT c_nationkey) AS merged_distinct_nations
        |FROM customer""".stripMargin,
    "s2_mock_users" ->
      s"""${Q.MockUsersCte}
         |$mockUsersSelect
         |ORDER BY id""".stripMargin,
    "p1_p2_normalize" ->
      s"""$rawUsersCte
         |SELECT coalesce(id_value, login_uuid) AS key, first AS name_first,
         |  lower(concat(first, '.', last, '@example.com')) AS email,
         |  reg_raw AS registered_raw
         |FROM u ORDER BY key""".stripMargin,
    "f2_timestamp_validity" ->
      s"""$rawUsersCte
         |SELECT coalesce(id_value, login_uuid) AS key,
         |  try_cast(reg_raw AS TIMESTAMP) IS NOT NULL AS is_valid
         |FROM u ORDER BY key""".stripMargin,
    "a6_clean_dedup_counts" ->
      s"""$rawUsersCte
         |SELECT count(*) AS rows_in,
         |  count(DISTINCT CASE WHEN try_cast(reg_raw AS TIMESTAMP) IS NOT NULL
         |        THEN coalesce(id_value, login_uuid) END) AS rows_out,
         |  count(*) - count(DISTINCT CASE WHEN try_cast(reg_raw AS TIMESTAMP) IS NOT NULL
         |        THEN coalesce(id_value, login_uuid) END) AS dedup_removed
         |FROM u""".stripMargin,
    "a1_a4_mock_metrics" ->
      s"""${Q.MockUsersCte}
         |SELECT count(*) AS totalUsers,
         |  count(DISTINCT country) AS uniqueCountries,
         |  count(DISTINCT city) AS uniqueCities,
         |  round(avg(year(current_date) - year(reg)), 2) AS avgRegistrationYears
         |FROM u""".stripMargin,
    "a7_last_user" ->
      s"""${Q.MockUsersCte}
         |SELECT concat(first, ' ', last) AS lastUser FROM u
         |ORDER BY reg DESC LIMIT 1""".stripMargin,
    "k2_run_envelope" ->
      s"""${Q.MockUsersCte}
         |SELECT count(*) AS rows_in, count(*) AS rows_out,
         |  CAST(0 AS BIGINT) AS dedup_removed,
         |  count(DISTINCT country) AS countries,
         |  count(DISTINCT city) AS uniqueCities,
         |  count(*) AS totalUsers,
         |  round(avg(year(current_date) - year(reg)), 2) AS avgRegistrationYears,
         |  'John0 Doe0' AS lastUser,
         |  CAST(1 AS BOOLEAN) AS fallbackUsed,
         |  'mock://users' AS sourceUrl
         |FROM u""".stripMargin,
    "f1_envelope_fallback" ->
      "SELECT CAST(50 AS BIGINT) AS n_users, CAST(1 AS BOOLEAN) AS fallback_used",
    "p5_k1_csv_lines" -> {
      val vals = Seq(
        "concat('mock-id-', i)",
        "concat('He said \"', first, '\"')",
        "last",
        "lower(concat(first, '.', last, '@example.com'))",
        s"concat('555-0101-', ${Q.padIndexSql("i")})",
        "country",
        "city",
        "concat(strftime(reg, '%Y-%m-%dT%H:%M:%S.%g'), 'Z')"
      )
      val quoted =
        vals.map(v => s"concat('\"', replace($v, '\"', '\"\"'), '\"')")
      s"""${Q.MockUsersCte}
         |SELECT concat('mock-id-', i) AS id,
         |  concat_ws(',', ${quoted.mkString(", ")}) AS line
         |FROM u ORDER BY id""".stripMargin
    },
    "k2_json_roundtrip" ->
      s"""${Q.MockUsersCte}
         |SELECT concat('mock-id-', i) AS id,
         |  lower(concat(first, '.', last, '@example.com')) AS email,
         |  concat(strftime(reg, '%Y-%m-%dT%H:%M:%S.%g'), 'Z') AS registered_date,
         |  CAST(50 AS BIGINT) AS totalUsers,
         |  CAST(3 AS BIGINT) AS countries,
         |  CAST(1 AS BOOLEAN) AS fallbackUsed
         |FROM u ORDER BY id""".stripMargin,
    // Round-trip must be lossless: the oracle is the mock source itself.
    "k1_csv_roundtrip" ->
      s"""${Q.MockUsersCte}
         |SELECT concat('mock-id-', i) AS id,
         |  concat('He said "', first, '"') AS name_first,
         |  last AS name_last,
         |  lower(concat(first, '.', last, '@example.com')) AS email,
         |  concat('555-0101-', ${Q.padIndexSql("i")}) AS phone,
         |  country, city,
         |  concat(strftime(reg, '%Y-%m-%dT%H:%M:%S.%g'), 'Z') AS registered_date
         |FROM u ORDER BY id""".stripMargin,
    "p6_domain_extract" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN 'not a url'
        |       ELSE concat(source, '.example.com') END AS domain
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p7_years_since" ->
      """SELECT CAST(year(current_date) - year(o_orderdate) AS INT) AS years, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "p8_string_format" ->
      """SELECT c_custkey,
        |  concat(lower(replace(c_name, '#', '.')), '@example.com') AS email,
        |  concat('555-', lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS phone
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "f3_distinct_nullguard" ->
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE n_name END) AS countries
        |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "l1_top20_customers" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey LIMIT 20""".stripMargin,
    "l3_source_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin,
    "s1_dsv2_source" ->
      s"""${Q.mockUsersCte(150)}
         |$mockUsersSelect
         |ORDER BY id""".stripMargin,
    "l2_raw_json_page" ->
      s"""${Q.MockUsersCte}
         |SELECT concat('mock-id-', i) AS key,
         |  CAST(to_json(struct_pack(
         |    id := struct_pack(value := concat('mock-id-', i)),
         |    name := struct_pack(first := first, last := last),
         |    email := lower(concat(first, '.', last, '@example.com')),
         |    phone := concat('555-0101-', ${Q.padIndexSql("i")}),
         |    location := struct_pack(country := country, city := city),
         |    registered := struct_pack(date := concat(strftime(reg, '%Y-%m-%dT%H:%M:%S.%g'), 'Z')),
         |    picture := struct_pack(thumbnail := concat('https://example.com/thumb/', i, '.jpg'))
         |  )) AS VARCHAR) AS raw_json
         |FROM u WHERE i < 10 ORDER BY key""".stripMargin,
    "k3_degraded_metrics" ->
      """SELECT CAST(0 AS BIGINT) AS rows_in, CAST(0 AS BIGINT) AS totalUsers,
        |  CAST(0.0 AS DOUBLE) AS avgRegistrationYears, 'N/A' AS lastUser,
        |  CAST(1 AS BOOLEAN) AS fallbackUsed, CAST(0 AS BIGINT) AS n_users""".stripMargin,
    "a2_approx_distinct_scale" ->
      """SELECT count(DISTINCT c_custkey) AS n_exact,
        |  CAST(1 AS BOOLEAN) AS approx_within_5pct
        |FROM customer""".stripMargin,
    // The literal-generating mirror of the pinned-ts log lines: the mock
    // run's messages are fully determined (50 mock users, all valid, no
    // CSV export), so the exact formatted strings are the oracle.
    "k4_log_lines" ->
      """SELECT 1 AS seq,
        |  '2025-11-11T09:00:00Z | Extract | source=mock://users fallback=true' AS line
        |UNION ALL SELECT 2, '2025-11-11T09:00:17Z | Transform | rows_in=50 rows_out=50'
        |UNION ALL SELECT 3, '2025-11-11T09:01:35Z | Load | exported=false'
        |ORDER BY seq""".stripMargin
  )
}
