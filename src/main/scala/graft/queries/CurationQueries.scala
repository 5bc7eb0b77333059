package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFeatures.{charHashDuck, hashedNgramsDuck, hashedNgramsSpark}
import graft.plans.GroupedTopK

/** Corpus-curation suite over `documents` — the selection/retrieval side
  * of a training-data pipeline, complementing the feature-extraction tier
  * in [[TextQueries]] and the near-dup tier in [[DedupQueries]]:
  *
  *   - BM25 retrieval ranking (`t_bm25_topk`)
  *   - substring-span (n-gram span) duplication profile (`t_span_dedup`,
  *     the intra-corpus form of Lee et al. 2022, arXiv:2107.06499 —
  *     "Deduplicating Training Data Makes Language Models Better")
  *   - deterministic weighted sampling without replacement
  *     (`t_weighted_sample`, priority-sampling form of Efraimidis &
  *     Spirakis 2006 with hash-derived priorities)
  *   - tokenizer-training first step: top adjacent-pair frequencies
  *     (`t_bpe_merge_step`, the argmax of BPE's first merge — Sennrich
  *     et al. 2016, arXiv:1508.07909)
  *   - token-budget-constrained selection (`t_token_budget_select`)
  *   - per-source quality-score calibration (`t_quality_calibration`)
  *
  * Portability discipline is the suite-wide one: every score is integer
  * fixed-point (e6) or an exact count, every ranking has a total
  * deterministic order (score, then id), so the DuckDB oracle reproduces
  * each result bit-for-bit. DuckDB's `//` and Spark's `div` both truncate
  * toward zero; every quotient here has a non-negative numerator and
  * positive denominator, so even that distinction is moot.
  */
object CurationQueries {
  import Q._

  val queries: Map[String, Fn] = Map(
    // BM25 top-5 documents for a deterministic 3-term query panel (the
    // highest-df terms — a self-contained stand-in for a query log).
    // The scoring is the k1=1.2 / b=0.75 BM25 term shape with a RATIONAL
    // idf (no log): idf_e6 = (N - df + 0.5)/(df + 0.5) scaled to e6 —
    // monotone in the classic Robertson idf, so rankings are preserved,
    // and transcendental-free so the oracle is bit-exact (a log's last
    // ulp can differ between libm builds and flip a near-tie). The tf
    // part is cleared of fractions by multiplying through by 10·T
    // (T = corpus token count, N = doc count, dl = doc length):
    //   tf_part_e6 = 22·tf·T·1e6 div (10·tf·T + 3·T + 9·dl·N)  ∈ [0, 2.2e6]
    // Long-range audit: 22·tf·T·1e6 stays under 2^63 through sf10
    // (T ≈ 1e8); a 100 TB corpus (T ~ 1e13) widens the two products to
    // DECIMAL(38,0) — same truncating division, same result mod scale.
    // Scale: tf/df are single-shuffle partial aggs; the 3-term panel is
    // a TakeOrdered (no global window); per-term top-5 rides the
    // GroupedTopK physical operator (bounded map-side heaps), so the
    // hottest term's posting list never sorts fully.
    "t_bm25_topk" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks"))
      val qterms = dfreq.orderBy(col("df").desc, col("term")).limit(3)
      val scored = tf
        .join(broadcast(qterms), "term")
        .crossJoin(broadcast(stats))
        .withColumn("idf_e6", expr("((2 * n_docs - 2 * df + 1) * 1000000L) div (2 * df + 1)"))
        .withColumn(
          "tf_part_e6",
          expr("(22 * tf * n_toks * 1000000L) div (10 * tf * n_toks + 3 * n_toks + 9 * dl * n_docs)")
        )
        .withColumn("score_e6", expr("(idf_e6 * tf_part_e6) div 1000000"))
      val w = Window.partitionBy(col("term")).orderBy(col("score_e6").desc, col("doc_id"))
      GroupedTopK
        .topK(scored, Seq("term"), Seq(col("score_e6").desc, col("doc_id").asc), k = 5)
        .withColumn("rank", row_number().over(w)) // ≤15 rows — window is a formality
        .select(col("term"), col("doc_id"), col("tf"), col("df"), col("dl"), col("score_e6"), col("rank"))
        .orderBy(col("term"), col("rank"))
    }),

    // Substring-span duplication profile (intra-corpus exact-span dedup
    // plan): every 8-word span is hashed (word char-hashes folded — no
    // per-span string allocation), spans seen in ≥2 documents are "dup",
    // and each doc gets a duplicated-span fraction; the output is the
    // per-source removal report a span-dedup run would emit. Natural
    // 8-gram overlap in the driver corpus is ~zero, so duplication is
    // PLANTED (mirrored in the oracle): every 11th doc gains a copy that
    // is exactly its own first 20 words — the copy's spans are all dup
    // (fraction 1e6 → flagged), the original gains the same 13 dup spans
    // out of its full span set (small fraction → kept): the asymmetry
    // between "document that is mostly copied text" and "document that
    // contains some copied text" is the thing span-level dedup measures.
    // Scale: span hashes are 8-byte keys; the df pass is a partial agg;
    // the dup-set join is a plain shuffle join AQE can size (at 100 TB
    // the dup set is NOT broadcastable by assumption — boilerplate mass
    // is the OOM risk, same reasoning as t_boilerplate_chunks); output
    // is O(#sources).
    "t_span_dedup" -> ((s, dir) => {
      graft.functions.CharRollingHash.register(s)
      val docs = table(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
      val planted = docs
        .filter(col("doc_id") % 11 === 0)
        .select(
          (col("doc_id") + 3000000L).as("doc_id"),
          col("source"),
          expr("array_join(slice(split(text, ' '), 1, 20), ' ')").as("text")
        )
      val spans = docs
        .unionAll(planted)
        .withColumn("ws", split(col("text"), " "))
        // let-bind the word-hash array (array(...) + flatten) so
        // projection collapse can't re-hash every word per n-gram —
        // same guard as t_ngram_decontaminate (r4 profiling).
        .withColumn(
          "g",
          expr(
            s"array_distinct(flatten(transform(array(transform(ws, w -> char_rolling_hash(w))), wh -> ${hashedNgramsSpark("wh", 8)})))"
          )
        )
        .select(col("doc_id"), col("source"), explode(col("g")).as("h"))
        // TWO consumers (span-df agg + per-doc join) and the span hashing
        // is the dominant per-row cost — materialize once, partitioned on
        // the key both consumers shuffle on (the hashedSets pattern; a
        // bare repartition can't help: Catalyst hoists the deterministic
        // hash projection above the exchange and re-runs it per consumer)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("h"))
        .localCheckpoint()
      // spans are distinct within a doc, so count(*) = distinct docs
      val dupSpans = spans
        .groupBy(col("h"))
        .agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h"), lit(1L).as("isdup"))
      spans
        .join(dupSpans, Seq("h"), "left")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("n_spans"), sum(coalesce(col("isdup"), lit(0L))).as("n_dup"))
        .withColumn("dup_frac_e6", expr("(n_dup * 1000000) div n_spans"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("dup_frac_e6") > 500000, 1L).otherwise(0L)).as("n_flagged"),
          sum(col("n_dup")).as("total_dup_spans"),
          max(col("dup_frac_e6")).as("max_dup_frac_e6")
        )
        .orderBy("source")
    }),

    // Deterministic weighted sampling without replacement: per source,
    // the 5 docs with the smallest priority key u/w (priority-sampling
    // form of Efraimidis-Spirakis), where u is a hash-derived uniform
    // (char_rolling_hash mod 1000003 — content-keyed, so the sample is
    // reproducible across runs AND engines) and w = n_chars: longer docs
    // are proportionally likelier. key_e6 = u·1e6 div n_chars keeps the
    // key integer. Scale: per-source top-k rides GroupedTopK (bounded
    // map-side heaps, one shuffle on source) — no global or per-source
    // sort ever materializes.
    "t_weighted_sample" -> ((s, dir) => {
      graft.functions.CharRollingHash.register(s)
      val pri = table(s, dir, "documents")
        .withColumn("u", expr("char_rolling_hash(text) % 1000003 + 1"))
        .withColumn("key_e6", expr("(u * 1000000) div n_chars"))
        .select(col("source"), col("doc_id"), col("n_chars"), col("u"), col("key_e6"))
      val w = Window.partitionBy(col("source")).orderBy(col("key_e6"), col("doc_id"))
      GroupedTopK
        .topK(pri, Seq("source"), Seq(col("key_e6").asc, col("doc_id").asc), k = 5)
        .withColumn("rank", row_number().over(w)) // sources×5 rows — formality
        .select(col("source"), col("rank"), col("doc_id"), col("n_chars"), col("u"), col("key_e6"))
        .orderBy(col("source"), col("rank"))
    }),

    // Tokenizer training, step 1: the corpus-wide adjacent character-pair
    // frequency table whose argmax is BPE's first merge (Sennrich 2016).
    // Computed word-frequency-weighted, as BPE does: words are counted
    // once (first shuffle, the heavy one — partial aggs collapse the
    // stream), then each DISTINCT word explodes into its ≤len-1 pairs
    // weighted by its count (second shuffle over a tiny pair domain,
    // ≤ alphabet² keys — map-side combine makes it scan-bound). Top-20
    // via TakeOrdered, no global window.
    "t_bpe_merge_step" -> ((s, dir) => {
      val wc = table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("wc"))
      val pairs = wc
        .filter(length(col("w")) >= 2)
        .select(
          col("wc"),
          explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair")
        )
        .groupBy(col("pair"))
        .agg(sum(col("wc")).as("freq"))
      val w = Window.orderBy(col("freq").desc, col("pair"))
      pairs
        .orderBy(col("freq").desc, col("pair"))
        .limit(20)
        .withColumn("rank", row_number().over(w)) // 20 rows — formality
        .select(col("pair"), col("freq"), col("rank"))
        .orderBy(col("rank"))
    }),

    // Token-budget-constrained selection: fill a 20 000-token training
    // budget with the highest-quality docs. NOT a global quality sort:
    // quality is bucketed to 1000 fixed levels, the budget threshold is
    // found on the ≤1001-row bucket histogram (the only "global" window,
    // over a FIXED-size frame at any corpus scale), whole buckets above
    // the threshold are taken, and only the single boundary bucket is
    // ordered (by doc_id) to fill the remainder — the per-bucket window
    // partitions on qb, so no unbounded sort exists anywhere in the
    // plan. (If the boundary bucket itself were pathological at scale,
    // the same scheme recurses on a finer sub-bucket — the histogram
    // trick composes.) Output is one summary row.
    "t_token_budget_select" -> ((s, dir) => {
      val budget = 20000L
      val d = table(s, dir, "documents")
        .withColumn("ws", split(col("text"), " "))
        .withColumn("q", expr(TextQueries.qualitySpark))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("toks"),
          expr("CAST(floor(q * 1000) AS BIGINT)").as("qb")
        )
      // the histogram is ≤1001 rows but its LINEAGE is a full corpus
      // quality pass — with three downstream consumers (full-bucket
      // stats, boundary row, boundary min) Catalyst re-ran that pass per
      // consumer (sf10 probe: 49.8 s ≈ 4 corpus passes). Materializing
      // the tiny frame caps the query at its two inherent corpus passes
      // (histogram + boundary selection).
      val hist = d
        .groupBy(col("qb"))
        .agg(count(lit(1)).as("nd"), sum(col("toks")).as("bt"))
        .localCheckpoint()
      val wCum = Window.orderBy(col("qb").desc).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.withColumn("cum", sum(col("bt")).over(wCum))
      val fullStats = cum
        .filter(col("cum") <= budget)
        .agg(
          coalesce(sum(col("nd")), lit(0L)).as("n_full_docs"),
          coalesce(sum(col("bt")), lit(0L)).as("full_tokens"),
          min(col("qb")).as("min_full_qb")
        )
      val boundary = cum
        .filter(col("cum") - col("bt") < budget && col("cum") > budget)
        .select(col("qb"), (lit(budget) - (col("cum") - col("bt"))).as("remaining"))
      val wIn = Window.partitionBy(col("qb")).orderBy(col("doc_id"))
      val bStats = d
        .join(broadcast(boundary), "qb")
        .withColumn("cc", sum(col("toks")).over(wIn))
        .filter(col("cc") <= col("remaining"))
        .agg(count(lit(1)).as("n_boundary_docs"), coalesce(sum(col("toks")), lit(0L)).as("boundary_tokens"))
      val bq = boundary.agg(min(col("qb")).as("bqb"))
      fullStats
        .crossJoin(bStats)
        .crossJoin(bq)
        .select(
          lit(budget).as("budget"),
          coalesce(col("bqb"), col("min_full_qb"), lit(-1L)).as("threshold_qb"),
          col("n_full_docs"),
          col("full_tokens"),
          col("n_boundary_docs"),
          col("boundary_tokens"),
          (col("n_full_docs") + col("n_boundary_docs")).as("n_selected"),
          (col("full_tokens") + col("boundary_tokens")).as("tokens_selected")
        )
    }),

    // Per-source quality calibration: the decile table a mixture-weighting
    // stage reads ("is a 0.62-quality doc from source X above or below its
    // source's median?"). Same histogram discipline as the budget select:
    // quality → 1000 fixed buckets, the cumulative pass runs per source
    // over ≤1001 rows, and a bucket's decile is that of its FIRST element
    // ((cum_excl·10) div total) — deterministic, no per-doc window, no
    // percent_rank sort over the corpus. Output is O(sources × 10).
    "t_quality_calibration" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .withColumn("ws", split(col("text"), " "))
        .withColumn("q", expr(TextQueries.qualitySpark))
        .select(col("source"), expr("CAST(floor(q * 1000) AS BIGINT)").as("qb"))
      // two consumers (cumulative pass + per-source totals) over a tiny
      // frame with a full-corpus lineage — materialize once (same
      // reasoning as t_token_budget_select's histogram)
      val hist = d
        .groupBy(col("source"), col("qb"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val wCum = Window
        .partitionBy(col("source"))
        .orderBy(col("qb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = hist.groupBy(col("source")).agg(sum(col("cnt")).as("total"))
      hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .join(tot, "source")
        .withColumn("decile", expr("((cum - cnt) * 10) div total"))
        .groupBy(col("source"), col("decile"))
        .agg(sum(col("cnt")).as("n_docs"), min(col("qb")).as("min_qb"), max(col("qb")).as("max_qb"))
        .orderBy(col("source"), col("decile"))
    }),

    // Trained-classifier APPLICATION at corpus scale — the CCNet/fastText
    // quality-filter pattern (Wenzek et al. 2020, arXiv:1911.00359;
    // Joulin et al. 2017, arXiv:1607.01759): a linear model over hashed
    // bag-of-words features scores every document, and the per-source
    // pass-rate report drives mixture decisions. The weight table is a
    // deterministic stand-in for trained weights — w(bucket) =
    // (bucket·2654435761 mod P) mod 2001 ∈ [0, 2000] over 4096 feature
    // buckets (Knuth multiplicative hash; a real deployment broadcasts
    // the trained vector, same plan shape) — so the oracle reproduces
    // scores bit-for-bit. score_e6 = Σ_tokens w(b(token)) · 1e6 div
    // (dl · 2000) ∈ [0, 1e6]. Overflow analysis: the BIGINT numerator
    // sum_w·1e6 stays under 2^63 to dl ~ 4.6e9 tokens/doc, and the
    // divisor is forced to BIGINT (CAST below) so it cannot wrap —
    // size() returns INT, and INT·2000 would silently wrap (non-ANSI
    // Spark) at dl ~ 1.07e6 tokens, far BELOW the numerator's bound.
    //
    // Scale: the entire feature-hash + weight-lookup + per-doc fold is
    // ONE codegen'd projection (aggregate/transform lambdas over the
    // word array — no explode, no per-token rows, no shuffle); the only
    // exchange is the O(sources) final groupBy. At 100 TB this is a pure
    // map-side scan — the ideal shape for classifier-filter passes.
    "t_quality_lr_score" -> ((s, dir) => {
      graft.functions.CharRollingHash.register(s)
      table(s, dir, "documents")
        .withColumn("ws", split(col("text"), " "))
        .withColumn(
          "sum_w",
          expr(
            "aggregate(transform(ws, w -> ((char_rolling_hash(w) % 4096) * 2654435761) % 1000000007 % 2001), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
          )
        )
        .withColumn("score_e6", expr("(sum_w * 1000000) div (CAST(size(ws) AS BIGINT) * 2000)"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("score_e6")).as("sum_score"),
          sum(when(col("score_e6") >= 500000L, 1L).otherwise(0L)).as("n_pass")
        )
        .select(
          col("source"),
          col("n_docs"),
          expr("sum_score div n_docs").as("avg_score_e6"),
          col("n_pass"),
          expr("(n_pass * 1000000) div n_docs").as("pass_rate_e6")
        )
        .orderBy(col("source"))
    }),

    // Trained-classifier TRAINING at corpus scale (VERDICT r10 #5 — the
    // half of the CCNet/fastText quality-filter story t_quality_lr_score
    // leaves out: a curation pipeline FITS its classifier on the cluster
    // before it scores with it). Five batch-gradient iterations of a
    // linear model with a hard-sigmoid link (the piecewise-linear
    // sigmoid of Collobert 2004 / standard quantized-NN practice:
    // p = clamp(0, 1, 1/2 + z/4)) over four integer document features
    // (bias; length clamped to 100; type-token ratio ×100; stopword
    // ratio ×100), labels y = [heuristic quality ≥ 0.5] — the bootstrap
    // labeling a real pipeline does from a seed heuristic before
    // human-labeled data exists. EVERYTHING is exact BIGINT fixed point:
    // z = Σ w_q·x, p_e6 = clamp(0, 1e6, 5e5 + z div 4000), gradient
    // g_j = Σ x_j·(y_e6 − p_e6), update w_q += g_j div (n·50) — an LMS
    // step with η = 1/50 in quantized units. Spark `div` and DuckDB `//`
    // both truncate toward zero (probed, round 11), so even the signed
    // quotients in the update are bit-portable; integer sums are
    // order-independent, so the learned weights are identical across
    // engines and partitionings. Overflow: per-doc |x·err| ≤ 1e8, so
    // the BIGINT gradient sum holds to ~9e10 documents; |w_q| stays
    // ~1e7 (5 steps × ≤2e6), so |z| ≤ 4e9 ≪ 2^63.
    //
    // Scale: the feature frame is computed ONCE and checkpointed (6
    // consumers: 5 gradient passes + the final scoring pass — the
    // DedupQueries.hashedSets materialization idiom); each iteration is
    // one scan of that slim frame plus a ONE-ROW aggregate, with the
    // weights re-entering as a broadcast 1-row cross join (the
    // t_bpe_train_merges no-collect loop). At 100 TB: 6 linear scans of
    // a 6-column integer frame, six 1-row exchanges, zero driver loops.
    "t_quality_lr_fit" -> ((s, dir) => {
      import org.apache.spark.sql.DataFrame
      val feats = table(s, dir, "documents")
        .withColumn("ws", split(col("text"), " "))
        .select(
          col("source"),
          lit(1L).as("x0"),
          least(size(col("ws")), lit(100)).cast("long").as("x1"),
          expr("CAST(size(array_distinct(ws)) * 100 div size(ws) AS BIGINT)").as("x2"),
          expr(s"CAST(${TextQueries.stopCountSpark} * 100 div size(ws) AS BIGINT)").as("x3"),
          when(expr(TextQueries.qualitySpark) >= 0.5, lit(1000000L))
            .otherwise(lit(0L)).as("y"))
        .localCheckpoint()
      val pCol = greatest(lit(0L), least(lit(1000000L),
        lit(500000L) + call_function("div",
          col("w0") * col("x0") + col("w1") * col("x1")
            + col("w2") * col("x2") + col("w3") * col("x3"),
          lit(4000L))))
      def step(w: DataFrame): DataFrame = feats
        .crossJoin(broadcast(w))
        .withColumn("p", pCol)
        .withColumn("err", col("y") - col("p"))
        .agg(
          max(col("w0")).as("pw0"), max(col("w1")).as("pw1"),
          max(col("w2")).as("pw2"), max(col("w3")).as("pw3"),
          sum(col("x0") * col("err")).as("g0"),
          sum(col("x1") * col("err")).as("g1"),
          sum(col("x2") * col("err")).as("g2"),
          sum(col("x3") * col("err")).as("g3"),
          count(lit(1)).as("n"))
        .select(
          (col("pw0") + call_function("div", col("g0"), col("n") * 50)).as("w0"),
          (col("pw1") + call_function("div", col("g1"), col("n") * 50)).as("w1"),
          (col("pw2") + call_function("div", col("g2"), col("n") * 50)).as("w2"),
          (col("pw3") + call_function("div", col("g3"), col("n") * 50)).as("w3"))
        .localCheckpoint() // 1 row, two consumers (next step + scoring)
      val w0 = s.range(1).select(
        lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"), lit(0L).as("w3"))
      val learned = (1 to 5).foldLeft(w0)((w, _) => step(w))
      feats
        .crossJoin(broadcast(learned))
        .withColumn("p", pCol)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("p") >= 500000L, 1L).otherwise(0L)).as("n_pass"),
          max(col("w0")).as("w0_q"), max(col("w1")).as("w1_q"),
          max(col("w2")).as("w2_q"), max(col("w3")).as("w3_q"))
        .select(
          col("source"), col("n_docs"), col("n_pass"),
          expr("(n_pass * 1000000) div n_docs").as("pass_rate_e6"),
          col("w0_q"), col("w1_q"), col("w2_q"), col("w3_q"))
        .orderBy(col("source"))
    }),

    // Iterated BPE training (Sennrich et al. 2016, arXiv:1508.07909) —
    // the full learn loop, not just `t_bpe_merge_step`'s first argmax:
    // three merge rounds, each recounting adjacent-symbol pairs AFTER
    // applying the previous merge, exactly as a tokenizer trainer does.
    // The merge-apply is the greedy left-to-right scan as a single
    // `aggregate` fold per word: append the current symbol, or fuse it
    // onto the accumulator's last element when that element is lft and
    // the symbol is rgt. (The fold IS greedy BPE: a fused token lft‖rgt
    // can never itself equal lft — rgt is non-empty — so one pass never
    // double-merges.) The merge pair reaches the lambda as broadcast
    // COLUMNS via a 1-row cross join, not driver-side literals — no
    // collect in the loop.
    //
    // Scale: training runs on the word-TYPE table (Heaps' law: types
    // grow ~√tokens — at 100 TB the type table is the shuffle, and it is
    // orders of magnitude smaller than the corpus), weighted by type
    // counts; each round is one pair-count exchange plus a map-side
    // apply, with the type frame checkpointed per round so lineage stays
    // flat. Real BPE trainers have exactly this shape (count dict → pair
    // counts → argmax → apply).
    "t_bpe_train_merges" -> ((s, dir) => {
      import org.apache.spark.sql.DataFrame
      val types0 = table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy(col("w"))
        .agg(count(lit(1)).as("wc"))
        .withColumn("syms", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .select("wc", "syms")
        .localCheckpoint()
      def topPair(t: DataFrame): DataFrame = t
        .filter(size(col("syms")) >= 2)
        .select(
          col("wc"),
          explode(
            expr(
              "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS lft, element_at(syms, i + 1) AS rgt))"
            )
          ).as("p")
        )
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("lft"), col("rgt"))
        .limit(1)
        .localCheckpoint() // 1 row, two consumers (output row + next apply)
      def applyMerge(t: DataFrame, m: DataFrame): DataFrame = t
        .crossJoin(broadcast(m.select("lft", "rgt")))
        .withColumn(
          "syms",
          expr(
            "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> " +
              "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = lft AND s = rgt " +
              "THEN concat(slice(acc, 1, size(acc) - 1), array(concat(lft, rgt))) " +
              "ELSE concat(acc, array(s)) END)"
          )
        )
        .select("wc", "syms")
        .localCheckpoint()
      var t = types0
      val merges = (1 to 3).map { r =>
        val m = topPair(t)
        if (r < 3) t = applyMerge(t, m)
        m.select(lit(r.toLong).as("round"), col("lft"), col("rgt"), col("freq"))
      }
      merges.reduce(_ unionAll _).orderBy("round")
    }),

    // BPE ENCODING with the trained merges — the apply side of
    // `t_bpe_train_merges`: re-derive the 3 greedy merges on the
    // corpus-wide word-type table (identical training path), apply all
    // three to every word type, then roll up per source: words, pre-BPE
    // symbol (char) count, post-merge token count, and the compression
    // ratio — the stat a tokenizer-budget planner reads per corpus
    // slice. Scale shape mirrors the trainer: ALL per-word work runs on
    // the type table (Heaps' law: ~√tokens types), and the corpus-sized
    // side is only the per-(source, word) count frame — one shuffle,
    // checkpointed once because it feeds both the type build and the
    // final rollup join.
    "t_bpe_encode" -> ((s, dir) => {
      import org.apache.spark.sql.DataFrame
      val perSrcW = table(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("wc_s"))
        .localCheckpoint()
      val types0 = perSrcW
        .groupBy(col("w"))
        .agg(sum(col("wc_s")).as("wc"))
        .withColumn("syms", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
        .select("w", "wc", "syms")
        .localCheckpoint()
      def topPair(t: DataFrame): DataFrame = t
        .filter(size(col("syms")) >= 2)
        .select(
          col("wc"),
          explode(
            expr(
              "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS lft, element_at(syms, i + 1) AS rgt))"
            )
          ).as("p")
        )
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("wc")).as("freq"))
        .orderBy(col("freq").desc, col("lft"), col("rgt"))
        .limit(1)
        .localCheckpoint()
      def applyMerge(t: DataFrame, m: DataFrame): DataFrame = t
        .crossJoin(broadcast(m.select("lft", "rgt")))
        .withColumn(
          "syms",
          expr(
            "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> " +
              "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = lft AND s = rgt " +
              "THEN concat(slice(acc, 1, size(acc) - 1), array(concat(lft, rgt))) " +
              "ELSE concat(acc, array(s)) END)"
          )
        )
        .select("w", "wc", "syms")
        .localCheckpoint()
      var t = types0
      (1 to 3).foreach { _ => t = applyMerge(t, topPair(t)) }
      perSrcW
        .join(t.select(col("w"), size(col("syms")).cast("long").as("n_tok")), Seq("w"))
        .groupBy(col("source"))
        .agg(
          sum(col("wc_s")).as("n_words"),
          sum(col("wc_s") * length(col("w"))).as("chars_total"),
          sum(col("wc_s") * col("n_tok")).as("tokens_total")
        )
        .withColumn("compression_e6", expr("(tokens_total * 1000000) div chars_total"))
        .orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(
    "t_bm25_topk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |dd AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, ws FROM d),
        |tk AS (SELECT doc_id, dl, unnest(ws) AS term FROM dd),
        |tfc AS (SELECT doc_id, dl, term, count(*) AS tf FROM tk GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS n_toks FROM dd),
        |qterms AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 3),
        |sc AS (SELECT t.term, t.doc_id, t.tf, q.df, t.dl,
        |         ((2 * s.n_docs - 2 * q.df + 1) * 1000000) // (2 * q.df + 1) AS idf_e6,
        |         (22 * t.tf * s.n_toks * 1000000)
        |           // (10 * t.tf * s.n_toks + 3 * s.n_toks + 9 * t.dl * s.n_docs) AS tf_part_e6
        |       FROM tfc t JOIN qterms q USING (term) CROSS JOIN stats s),
        |r AS (SELECT term, doc_id, tf, df, dl,
        |        (idf_e6 * tf_part_e6) // 1000000 AS score_e6,
        |        row_number() OVER (PARTITION BY term
        |          ORDER BY (idf_e6 * tf_part_e6) // 1000000 DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT term, doc_id, tf, df, dl, score_e6, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 5 ORDER BY term, rank""".stripMargin,
    "t_span_dedup" -> {
      val ngramHash = s"list_distinct(${hashedNgramsDuck("wh", 8)})"
      s"""WITH planted AS (SELECT doc_id + 3000000 AS doc_id, source,
         |    array_to_string(string_split(text, ' ')[1:20], ' ') AS text
         |  FROM documents WHERE doc_id % 11 = 0),
         |cor AS (SELECT doc_id, source, text FROM documents
         |        UNION ALL SELECT doc_id, source, text FROM planted),
         |sp AS (SELECT doc_id, source, unnest($ngramHash) AS h
         |       FROM (SELECT doc_id, source,
         |               [${charHashDuck("w")} for w in string_split(text, ' ')] AS wh
         |             FROM cor)),
         |dup AS (SELECT h FROM sp GROUP BY h HAVING count(*) >= 2),
         |pd AS (SELECT sp.doc_id, sp.source, count(*) AS n_spans,
         |         CAST(sum(CASE WHEN dup.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |       FROM sp LEFT JOIN dup USING (h) GROUP BY 1, 2),
         |pf AS (SELECT source, n_dup, (n_dup * 1000000) // n_spans AS dup_frac_e6 FROM pd)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN dup_frac_e6 > 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |  CAST(sum(n_dup) AS BIGINT) AS total_dup_spans,
         |  max(dup_frac_e6) AS max_dup_frac_e6
         |FROM pf GROUP BY source ORDER BY source""".stripMargin
    },
    "t_weighted_sample" ->
      s"""WITH pri AS (SELECT source, doc_id, n_chars,
         |    ${charHashDuck("text")} % 1000003 + 1 AS u
         |  FROM documents),
         |k AS (SELECT source, doc_id, n_chars, u, (u * 1000000) // n_chars AS key_e6 FROM pri),
         |r AS (SELECT source, doc_id, n_chars, u, key_e6,
         |        row_number() OVER (PARTITION BY source ORDER BY key_e6, doc_id) AS rank
         |      FROM k)
         |SELECT source, CAST(rank AS INT) AS rank, doc_id, n_chars, u, key_e6
         |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "t_bpe_merge_step" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS wc FROM toks GROUP BY 1),
        |pr AS (SELECT wc, unnest([w[i:i+1] for i in range(1, len(w))]) AS pair
        |       FROM wc WHERE len(w) >= 2),
        |pf AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS freq FROM pr GROUP BY 1),
        |r AS (SELECT pair, freq, row_number() OVER (ORDER BY freq DESC, pair) AS rank FROM pf)
        |SELECT pair, freq, CAST(rank AS INT) AS rank FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "t_token_budget_select" -> {
      s"""WITH d0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS toks,
         |        CAST(floor((${TextQueries.qualityDuck}) * 1000) AS BIGINT) AS qb
         |      FROM d0),
         |hist AS (SELECT qb, count(*) AS nd, CAST(sum(toks) AS BIGINT) AS bt FROM d GROUP BY 1),
         |c AS (SELECT qb, nd, bt,
         |        sum(bt) OVER (ORDER BY qb DESC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM hist),
         |fs AS (SELECT coalesce(CAST(sum(nd) AS BIGINT), 0) AS n_full_docs,
         |         coalesce(CAST(sum(bt) AS BIGINT), 0) AS full_tokens,
         |         min(qb) AS min_full_qb
         |       FROM c WHERE cum <= 20000),
         |bound AS (SELECT qb, 20000 - (cum - bt) AS remaining FROM c
         |          WHERE cum - bt < 20000 AND cum > 20000),
         |bsel AS (SELECT qb, toks FROM (
         |    SELECT d.qb, d.toks, bound.remaining,
         |      sum(d.toks) OVER (PARTITION BY d.qb ORDER BY d.doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
         |    FROM d JOIN bound USING (qb)) WHERE cc <= remaining),
         |bs AS (SELECT CAST(count(*) AS BIGINT) AS n_boundary_docs,
         |         coalesce(CAST(sum(toks) AS BIGINT), 0) AS boundary_tokens FROM bsel),
         |bq AS (SELECT min(qb) AS bqb FROM bound)
         |SELECT CAST(20000 AS BIGINT) AS budget,
         |  coalesce(bq.bqb, fs.min_full_qb, -1) AS threshold_qb,
         |  fs.n_full_docs, fs.full_tokens, bs.n_boundary_docs, bs.boundary_tokens,
         |  fs.n_full_docs + bs.n_boundary_docs AS n_selected,
         |  fs.full_tokens + bs.boundary_tokens AS tokens_selected
         |FROM fs, bs, bq""".stripMargin
    },
    "t_quality_calibration" -> {
      s"""WITH d0 AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
         |d AS (SELECT source,
         |        CAST(floor((${TextQueries.qualityDuck}) * 1000) AS BIGINT) AS qb
         |      FROM d0),
         |hist AS (SELECT source, qb, count(*) AS cnt FROM d GROUP BY 1, 2),
         |c AS (SELECT source, qb, cnt,
         |        sum(cnt) OVER (PARTITION BY source ORDER BY qb
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM hist),
         |t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total FROM hist GROUP BY 1)
         |SELECT c.source, CAST(((c.cum - c.cnt) * 10) // t.total AS BIGINT) AS decile,
         |  CAST(sum(c.cnt) AS BIGINT) AS n_docs, min(c.qb) AS min_qb, max(c.qb) AS max_qb
         |FROM c JOIN t ON t.source = c.source
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    // Mirrors the 5 unrolled LMS iterations in the same BIGINT fixed
    // point (both engines truncate integer division toward zero —
    // probed), so gradients, weights, and the learned pass rates match
    // bit-for-bit. `f` is pinned MATERIALIZED: it feeds all 5 gradient
    // passes plus scoring, and DuckDB's default CTE inlining would
    // re-split the corpus 6× (the o_pagerank_copurchase lesson).
    "t_quality_lr_fit" -> {
      def iter(k: Int): String =
        s"""p$k AS (SELECT f.y, f.x0, f.x1, f.x2, f.x3,
           |    greatest(CAST(0 AS BIGINT), least(CAST(1000000 AS BIGINT),
           |      500000 + (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) // 4000)) AS p
           |  FROM f CROSS JOIN w${k - 1} w),
           |g$k AS (SELECT CAST(sum(x0*(y-p)) AS BIGINT) AS g0,
           |    CAST(sum(x1*(y-p)) AS BIGINT) AS g1,
           |    CAST(sum(x2*(y-p)) AS BIGINT) AS g2,
           |    CAST(sum(x3*(y-p)) AS BIGINT) AS g3,
           |    CAST(count(*) AS BIGINT) AS n FROM p$k),
           |w$k AS (SELECT w.w0 + g.g0 // (g.n*50) AS w0, w.w1 + g.g1 // (g.n*50) AS w1,
           |    w.w2 + g.g2 // (g.n*50) AS w2, w.w3 + g.g3 // (g.n*50) AS w3
           |  FROM w${k - 1} w CROSS JOIN g$k g)""".stripMargin
      s"""WITH d AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
         |f AS MATERIALIZED (SELECT source,
         |    CAST(1 AS BIGINT) AS x0,
         |    CAST(least(len(ws), 100) AS BIGINT) AS x1,
         |    CAST(len(list_distinct(ws)) * 100 // len(ws) AS BIGINT) AS x2,
         |    CAST(${TextQueries.stopCountDuck} * 100 // len(ws) AS BIGINT) AS x3,
         |    CASE WHEN (${TextQueries.qualityDuck}) >= 0.5
         |         THEN CAST(1000000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y
         |  FROM d),
         |w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         |       CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
         |${(1 to 5).map(iter).mkString(",\n")},
         |sc AS (SELECT f.source,
         |    greatest(CAST(0 AS BIGINT), least(CAST(1000000 AS BIGINT),
         |      500000 + (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) // 4000)) AS p,
         |    w.w0, w.w1, w.w2, w.w3
         |  FROM f CROSS JOIN w5 w)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN p >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  (CAST(sum(CASE WHEN p >= 500000 THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         |    // CAST(count(*) AS BIGINT) AS pass_rate_e6,
         |  CAST(max(w0) AS BIGINT) AS w0_q, CAST(max(w1) AS BIGINT) AS w1_q,
         |  CAST(max(w2) AS BIGINT) AS w2_q, CAST(max(w3) AS BIGINT) AS w3_q
         |FROM sc GROUP BY source ORDER BY source""".stripMargin
    },
    "t_quality_lr_score" ->
      s"""WITH d AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
         |sc AS (SELECT source, CAST(len(ws) AS BIGINT) AS dl,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [((${charHashDuck("w")} % 4096) * 2654435761) % 1000000007 % 2001 for w in ws]),
         |      (acc, x) -> acc + x) AS sum_w
         |  FROM d),
         |s2 AS (SELECT source, (sum_w * 1000000) // (dl * 2000) AS score_e6 FROM sc)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(score_e6) AS BIGINT) // count(*) AS avg_score_e6,
         |  CAST(sum(CASE WHEN score_e6 >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  (CAST(sum(CASE WHEN score_e6 >= 500000 THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*) AS pass_rate_e6
         |FROM s2 GROUP BY source ORDER BY source""".stripMargin,
    // DuckDB's list_reduce fixes the accumulator type to the element
    // type, so the merge-apply folds a chr(31)-joined STRING instead of
    // a list: fusing = append rgt with no separator; the last-symbol
    // test is an exact ends_with on separator+lft (symbols never contain
    // the separator). Semantics are identical to the Spark array fold.
    "t_bpe_train_merges" -> {
      def pairs(r: Int): String =
        s"""p$r AS (SELECT unnest(syms[1:len(syms)-1]) AS lft, unnest(syms[2:len(syms)]) AS rgt, wc
           |       FROM s${r - 1} WHERE len(syms) >= 2),
           |c$r AS (SELECT lft, rgt, CAST(sum(wc) AS BIGINT) AS freq FROM p$r GROUP BY 1, 2),
           |m$r AS (SELECT lft, rgt, freq FROM c$r ORDER BY freq DESC, lft, rgt LIMIT 1)""".stripMargin
      def applyM(r: Int): String =
        s"""s$r AS (SELECT wc, string_split(list_reduce(list_prepend('', s${r - 1}.syms), (acc, s) ->
           |    CASE WHEN (acc = m.lft OR ends_with(acc, chr(31) || m.lft)) AND s = m.rgt THEN acc || s
           |         WHEN acc = '' THEN s
           |         ELSE acc || chr(31) || s END), chr(31)) AS syms
           |  FROM s${r - 1}, m$r m)""".stripMargin
      s"""WITH wt AS (SELECT w, CAST(count(*) AS BIGINT) AS wc
         |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) >= 1 GROUP BY w),
         |s0 AS (SELECT wc, [w[i] for i in range(1, len(w) + 1)] AS syms FROM wt),
         |${pairs(1)},
         |${applyM(1)},
         |${pairs(2)},
         |${applyM(2)},
         |${pairs(3)}
         |SELECT CAST(1 AS BIGINT) AS round, lft, rgt, freq FROM m1
         |UNION ALL SELECT CAST(2 AS BIGINT), lft, rgt, freq FROM m2
         |UNION ALL SELECT CAST(3 AS BIGINT), lft, rgt, freq FROM m3
         |ORDER BY round""".stripMargin
    },
    // Encode: the same 3-round trainer CTEs (with the word carried
    // through the fold) + a per-(source, word) rollup.
    "t_bpe_encode" -> {
      def pairs(r: Int): String =
        s"""p$r AS (SELECT unnest(syms[1:len(syms)-1]) AS lft, unnest(syms[2:len(syms)]) AS rgt, wc
           |       FROM s${r - 1} WHERE len(syms) >= 2),
           |c$r AS (SELECT lft, rgt, CAST(sum(wc) AS BIGINT) AS freq FROM p$r GROUP BY 1, 2),
           |m$r AS (SELECT lft, rgt, freq FROM c$r ORDER BY freq DESC, lft, rgt LIMIT 1)""".stripMargin
      def applyM(r: Int): String =
        s"""s$r AS (SELECT w, wc, string_split(list_reduce(list_prepend('', s${r - 1}.syms), (acc, s) ->
           |    CASE WHEN (acc = m.lft OR ends_with(acc, chr(31) || m.lft)) AND s = m.rgt THEN acc || s
           |         WHEN acc = '' THEN s
           |         ELSE acc || chr(31) || s END), chr(31)) AS syms
           |  FROM s${r - 1}, m$r m)""".stripMargin
      s"""WITH wsrc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS wc_s
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) >= 1 GROUP BY 1, 2),
         |wt AS (SELECT w, CAST(sum(wc_s) AS BIGINT) AS wc FROM wsrc GROUP BY w),
         |s0 AS (SELECT w, wc, [w[i] for i in range(1, len(w) + 1)] AS syms FROM wt),
         |${pairs(1)},
         |${applyM(1)},
         |${pairs(2)},
         |${applyM(2)},
         |${pairs(3)},
         |${applyM(3)},
         |enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS n_tok, CAST(len(w) AS BIGINT) AS n_chars
         |        FROM s3)
         |SELECT source, CAST(sum(wc_s) AS BIGINT) AS n_words,
         |  CAST(sum(wc_s * n_chars) AS BIGINT) AS chars_total,
         |  CAST(sum(wc_s * n_tok) AS BIGINT) AS tokens_total,
         |  (CAST(sum(wc_s * n_tok) AS BIGINT) * 1000000)
         |    // CAST(sum(wc_s * n_chars) AS BIGINT) AS compression_e6
         |FROM wsrc JOIN enc USING (w) GROUP BY source ORDER BY source""".stripMargin
    }
  )
}
