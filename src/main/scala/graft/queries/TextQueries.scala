package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TextFeatures.{charHashDuck, charHashSpark}

/** Text-analysis suite over `documents` — per-document feature extraction
  * for a training-data pipeline: token counting, quality scoring,
  * language ID, fingerprinting, and per-group profiling.
  *
  * Scale: every query is a narrow per-row projection (no shuffle) followed
  * by at most one aggregate; features are Spark built-ins (split /
  * regexp_extract_all / higher-order lambdas), all inside whole-stage
  * codegen. Ratios are computed as integer-count divisions and rounded,
  * so the DuckDB oracle is bit-identical.
  */
object TextQueries {
  import Q._

  /** Stopword list for quality/language scoring (ASCII, lowercase). */
  private val Stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private def stopArr = s"array(${Stop.map("'" + _ + "'").mkString(", ")})"
  private def stopList = s"[${Stop.map("'" + _ + "'").mkString(", ")}]"

  /** BPE-ish token pattern: word pieces, digits, or single punctuation. */
  private val BpePat = "[a-z]+|[0-9]|[^a-z0-9 ]"

  val queries: Map[String, Fn] = Map(
    // Token counting: whitespace tokens + BPE-ish regex tokens.
    "t_token_counts" -> ((s, dir) =>
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
          expr(s"CAST(size(regexp_extract_all(text, '$BpePat', 0)) AS BIGINT)").as("n_bpe_tokens"),
          length(col("text")).cast("long").as("n_chars_computed")
        )
        .orderBy("doc_id")),

    // Quality scoring: length/stopword/diversity signals → one score.
    // All ratios are integer-count divisions rounded to 6 — portable.
    "t_quality_scores" -> ((s, dir) =>
      table(s, dir, "documents")
        .withColumn("ws", split(col("text"), " "))
        .select(
          col("doc_id"),
          expr(s"round(CAST(size(filter(ws, t -> array_contains($stopArr, t))) AS DOUBLE) / size(ws), 6)")
            .as("stopword_ratio"),
          expr("round(CAST(size(array_distinct(ws)) AS DOUBLE) / size(ws), 6)")
            .as("distinct_ratio"),
          expr("round(CAST(length(text) - size(ws) + 1 AS DOUBLE) / size(ws), 6)")
            .as("mean_word_len"),
          expr(
            s"""round(CASE WHEN size(ws) >= 20 THEN 0.4D ELSE size(ws) * 0.02D END
               | + size(array_distinct(ws)) * 0.3D / size(ws)
               | + CASE WHEN size(filter(ws, t -> array_contains($stopArr, t))) * 10 >= size(ws) THEN 0.3D ELSE 0.0D END, 6)""".stripMargin
          ).as("quality")
        )
        .orderBy("doc_id")),

    // Language ID: n-gram/stopword-overlap heuristic scored per language,
    // argmax with deterministic tie-break (first in list order). With the
    // driver's shared-vocabulary synthetic corpus every doc scores 'en';
    // the operator is the point, not the answer.
    "t_lang_id" -> ((s, dir) =>
      table(s, dir, "documents")
        .withColumn("ws", split(col("text"), " "))
        .withColumn("s_en", expr(s"size(filter(ws, t -> array_contains($stopArr, t)))"))
        .withColumn("s_es", expr("size(filter(ws, t -> array_contains(array('el', 'la', 'de', 'que', 'y'), t)))"))
        .withColumn("s_de", expr("size(filter(ws, t -> array_contains(array('der', 'die', 'das', 'und', 'ist'), t)))"))
        .withColumn("s_fr", expr("size(filter(ws, t -> array_contains(array('le', 'la', 'et', 'les', 'des'), t)))"))
        .select(
          col("doc_id"),
          col("lang").as("labeled_lang"),
          expr(
            """CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
              |     WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
              |     WHEN s_de >= s_fr THEN 'de'
              |     ELSE 'fr' END""".stripMargin
          ).as("predicted_lang")
        )
        .orderBy("doc_id")),

    // Document fingerprinting: rolling polynomial hash of the whole text
    // via the native codegen expression (CharRollingHashSpec proves it
    // bit-equal to the higher-order-builtin formulation the oracle mirrors).
    "t_fingerprints" -> ((s, dir) => {
      graft.functions.CharRollingHash.register(s)
      table(s, dir, "documents")
        .select(col("doc_id"), expr("char_rolling_hash(text)").as("fingerprint"))
        .orderBy("doc_id")
    }),

    // Corpus profile: per (lang, source-domain-class) doc counts + char
    // stats — the groupBy profiling pass a curation pipeline runs first.
    "t_corpus_profile" -> ((s, dir) =>
      table(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(avg(col("n_chars")), 2).as("avg_chars"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          count_distinct(col("source")).as("n_sources")
        )
        .orderBy("lang"))
  )

  val oracle: Map[String, String] = Map(
    "t_token_counts" ->
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '$BpePat')) AS n_bpe_tokens,
         |  length(text) AS n_chars_computed
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t_quality_scores" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
         |SELECT doc_id,
         |  round(CAST(len(list_filter(ws, t -> list_contains($stopList, t))) AS DOUBLE) / len(ws), 6) AS stopword_ratio,
         |  round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6) AS distinct_ratio,
         |  round(CAST(length(text) - len(ws) + 1 AS DOUBLE) / len(ws), 6) AS mean_word_len,
         |  round(CASE WHEN len(ws) >= 20 THEN CAST(0.4 AS DOUBLE) ELSE len(ws) * CAST(0.02 AS DOUBLE) END
         |    + len(list_distinct(ws)) * CAST(0.3 AS DOUBLE) / len(ws)
         |    + CASE WHEN len(list_filter(ws, t -> list_contains($stopList, t))) * 10 >= len(ws) THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END, 6) AS quality
         |FROM t ORDER BY doc_id""".stripMargin,
    "t_lang_id" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
         |sc AS (SELECT doc_id, lang,
         |  len(list_filter(ws, t -> list_contains($stopList, t))) AS s_en,
         |  len(list_filter(ws, t -> list_contains(['el', 'la', 'de', 'que', 'y'], t))) AS s_es,
         |  len(list_filter(ws, t -> list_contains(['der', 'die', 'das', 'und', 'ist'], t))) AS s_de,
         |  len(list_filter(ws, t -> list_contains(['le', 'la', 'et', 'les', 'des'], t))) AS s_fr
         |  FROM t)
         |SELECT doc_id, lang AS labeled_lang,
         |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
         |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de'
         |       ELSE 'fr' END AS predicted_lang
         |FROM sc ORDER BY doc_id""".stripMargin,
    "t_fingerprints" ->
      s"""SELECT doc_id, ${charHashDuck("text")} AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t_corpus_profile" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(avg(n_chars), 2) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  )
}
