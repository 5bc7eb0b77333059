package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + embedding near-dup over the `embeddings` table
  * (`Array[Float]`, 64-dim, unit-norm).
  *
  * Three tiers:
  *  - brute-force cosine top-k: the exactness baseline — broadcast the
  *    (few) query vectors, one pass over candidates, per-query top-k.
  *  - IVF top-k: the scale path — k centroids (deterministic sample),
  *    vectors assigned to nearest centroid (one broadcast join), queries
  *    probe nprobe centroids, candidates restricted to probed cells. At
  *    100 TB the assignment becomes the partition key → candidate
  *    generation is a partition-pruned scan.
  *  - cosine near-dup pairs: sign-LSH (random-projection hyperplanes)
  *    bucket join → exact-cosine verification — never all-pairs.
  *
  * Portability: all float→double casts, sequential left-fold dot products
  * and inline LCG-generated hyperplanes are pure integer/IEEE arithmetic,
  * so the DuckDB oracle reproduces every cosine BIT-IDENTICALLY — ranking
  * ties and threshold edges cannot diverge between engines.
  */
object EmbeddingQueries {
  import Q._

  /** Spark: sequential-fold dot product of two DOUBLE-array columns —
    * the native codegen `vec_dot` expression (SketchExpressions.VecDot),
    * bit-identical to the builtin `aggregate(zip_with(...))` fold it
    * replaced (same left-fold order, proven in SketchExpressionsSpec) but
    * one fused loop instead of ~2·dim interpreted lambda calls per pair.
    */
  private def dotSpark(a: String, b: String): String =
    s"vec_dot($a, $b)"

  /** DuckDB mirror of [[dotSpark]] (same element order ⇒ same double). */
  private def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), [($a)[i] * ($b)[i] for i in range(1, len($a) + 1)]), (x, y) -> x + y)"

  /** Sign-LSH hyperplanes: 12 tables × 16 bits × 64 dims of genuinely
    * random coefficients from a fixed-seed PRNG. (An earlier inline-LCG
    * variant produced near-parallel planes — any affine map of
    * consecutive seeds is an arithmetic ramp — and missed real pairs.)
    * The planes travel as a 192-row broadcast DataFrame, not as literals:
    * a 12288-literal expression tree costs seconds of analysis/codegen
    * per run and would be re-shipped inside every task's plan at scale.
    *
    * Sizing (round-5 sf1 lesson): the original 4-bit tables (16 buckets)
    * made the bucket self-join Σ·sz² ≈ T·n²/16 — quadratic in the corpus,
    * 8e9 candidates at sf1, a cap blowout. 16-bit tables (65536 buckets)
    * put bucket occupancy ≈ n/2^16 ≈ 1.6 at sf1, and candidate volume
    * T·n·probes·occupancy stays ~linear; recall lost to the extra bits is
    * partially bought back with Hamming-radius-1 multiprobe on one join
    * side (a near-dup pair whose per-table codes differ in ≤1 bit in ANY
    * of the 12 tables is found). Bits-per-table GROWS with the corpus:
    * `max(16, ceil(log2 n))` — occupancy-constant, so candidate volume
    * T·n·(bits+1)·occupancy stays ~n·log n instead of the n²·T/2^bits a
    * fixed table width decays to (the round-7 sf10 probe measured that
    * decay: occupancy ≈ 3 at 225K vectors, 122M exact-verify dots,
    * 324 s median; 18-bit tables measured 28 s — 11.6×, the candidate
    * cut compounding with the smaller distinct/shuffle volume). Every
    * oracle-checked scale (≤ sf1) sits under the 16-bit floor, so
    * checked results are bit-identical to the fixed-width scheme.
    *
    * Recall math (ADVICE r5 — the old "≈2e-7" figure belonged to the
    * 4-bit scheme): per-bit disagreement for a pair at cosine c is
    * p = acos(c)/π, per-table Hamming-≤1 hit = (1-p)^16 + 16p(1-p)^15,
    * miss = (1-hit)^12 over the independent tables. At the 0.95
    * threshold boundary: p ≈ 0.101, hit ≈ 0.51, miss ≈ 0.49^12 ≈ 2e-4.
    * At 0.97: miss ≈ 5e-6; at 0.99: ≈ 4e-9. The 4-scale oracle sweeps
    * observe zero missed pairs, but NOTE: the planted near-dups all sit
    * at cosine ≥ 0.97 (natural pair max ≈ 0.51), so the sweeps do not
    * exercise the 0.95 boundary — on a corpus with mass near 0.95,
    * expect ~2e-4 of those boundary pairs dropped.
    *
    * ABOVE the 16-bit floor the table count GROWS to pay the recall
    * back (VERDICT r7 #2 — previously this trade was priced in prose
    * only): wider codes cut per-table hit probability (18 bits at the
    * 0.95 boundary: hit 0.51 → 0.44, so 12 tables would decay to miss
    * ≈ 9e-4), so [[tablesForBits]] picks the least T with
    * (1 - hit_bits)^T ≤ (1 - hit_16)^12 at the design boundary —
    * boundary miss never exceeds the 16-bit/12-table level at ANY
    * corpus size. Concretely T(16)=12, T(18)=15, T(20)=18: probe
    * volume grows T·(bits+1)/204 ≈ 1.4× at 18 bits — far cheaper than
    * radius-2 probing (~8×) for more recall recovered.
    * EmbeddingSpec's floor-vs-grown test runs both configurations on
    * the planted corpus and asserts the 18-bit candidates lose nothing.
    * MEASURED at the boundary (round 9, EmbeddingSpec's 0.95-boundary
    * test: 50K deterministic pairs planted at cosine 0.9502): 16-bit
    * miss 8/50000 = 1.6e-4 vs the closed-form 1.92e-4; forced
    * 18-bit/T=15 miss 7/50000 = 1.4e-4 vs closed-form 1.44e-4 — the
    * priced figures hold empirically at both widths, and the grown
    * tables do keep the floor's boundary recall.
    */
  private val NumTables = 12

  /** Recall-preserving table count for a given code width: least T with
    * per-pair miss at the 0.95 design boundary ≤ the 16-bit/12-table
    * baseline (see sizing note above). Pure closed-form double math —
    * deterministic, plan-sizing only. At the floor this is exactly
    * [[NumTables]], so every oracle-checked scale keeps its recorded
    * plane set.
    */
  private[graft] def tablesForBits(bits: Int): Int = {
    val p = math.acos(0.95) / math.Pi
    def tableHit(b: Int): Double =
      math.pow(1 - p, b) + b * p * math.pow(1 - p, b - 1)
    val targetLogMiss = NumTables * math.log1p(-tableHit(16))
    // epsilon guards the bits=16 case against ceil(12.0000…01) = 13
    math.max(NumTables, math.ceil(targetLogMiss / math.log1p(-tableHit(bits)) - 1e-9).toInt)
  }

  /** 16-bit floor keeps every oracle-verified scale on its recorded
    * plane set; ceil(log2 n) above it holds bucket occupancy ≈ 1.
    */
  private def bitsForCorpus(n: Long): Int =
    math.max(16, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1L)))

  /** Fixed-point scale (2^20) for k-means centroid arithmetic — see
    * `e_kmeans_ivf_topk`. */
  private val QScale = 1048576L
  private val KMeansIters = 2
  private[graft] def planesFlat(bits: Int): IndexedSeq[Double] = {
    val rnd = new scala.util.Random(424242L)
    // at bits = 16 (⇒ tablesForBits = 12) this reproduces the round-5
    // plane set exactly (same seed, same draw count/order) — the basis
    // of the bit-identical claim above; wider codes draw the extra
    // recall-recovery tables from the same stream
    IndexedSeq.fill(tablesForBits(bits) * bits * 64)(rnd.nextDouble() * 2 - 1)
  }

  /** (vec_id, t, bucket) — one row per vector per hash table: broadcast
    * plane join → per-(vector, table) sign-bit assembly. One narrow
    * groupBy on (vec_id, t); no giant literals in the plan.
    */
  private def lshBuckets(cor: DataFrame, bits: Int): DataFrame = {
    val session = cor.sparkSession
    import session.implicits._
    val planes = planesFlat(bits)
      .grouped(64)
      .zipWithIndex
      .map { case (cs, p) => (p / bits, p % bits, cs.toArray) }
      .toSeq
      .toDF("t", "j", "coeffs")
    cor
      .select(col("vec_id"), col("v"))
      .crossJoin(broadcast(planes))
      .select(
        col("vec_id"),
        col("t"),
        when(
          expr(dotSpark("v", "coeffs")) >= 0,
          expr("shiftleft(CAST(1 AS BIGINT), j)")
        ).otherwise(lit(0L)).as("bit")
      )
      .groupBy(col("vec_id"), col("t"))
      .agg(sum(col("bit")).as("bucket"))
  }

  /** LSH near-dup CANDIDATE pairs at a given code width — extracted so
    * EmbeddingSpec can force an above-floor width on the planted corpus
    * and compare against the floor configuration. Hamming-≤1 multiprobe:
    * the probe side expands each per-table code to itself + its `bits`
    * single-bit flips, so a pair differing in ≤1 bit of SOME table
    * collides. Probe volume is (bits+1)·T·n rows — ~n·log n with the
    * [[tablesForBits]] growth — and the equi-join output is bounded by
    * probes × bucket occupancy (held ≈1 by [[bitsForCorpus]]), never
    * the n²/buckets of a plain self-join on under-sized buckets.
    */
  private[graft] def neardupCandidates(cor: DataFrame, bits: Int): DataFrame = {
    val bk = lshBuckets(cor, bits).localCheckpoint()
    val probes = bk.select(
      col("t"),
      col("vec_id").as("vec_a"),
      explode(
        expr(
          s"concat(array(bucket), transform(sequence(0, ${bits - 1}), " +
            "j -> bucket ^ shiftleft(CAST(1 AS BIGINT), j)))"
        )
      ).as("bucket")
    )
    probes
      .join(bk.select(col("t"), col("bucket"), col("vec_id").as("vec_b")), Seq("t", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
      .distinct()
  }

  /** vectors as DOUBLE arrays + squared norm. */
  private def vecs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchExpressions.register(s)
    table(s, dir, "embeddings")
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")
      )
      .withColumn("nrm", expr(dotSpark("v", "v")))
  }

  private val vecsCte =
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, ${dotDuck("v", "v")} AS nrm FROM e)""".stripMargin

  /** Near-dup corpus: originals ∪ first-coordinate-perturbed copies of
    * every 20th vector (planted pairs at cosine ≥ 0.97; natural max ~0.51).
    */
  private[graft] def nearCorpus(s: SparkSession, dir: String): DataFrame = {
    graft.functions.SketchExpressions.register(s)
    val base = table(s, dir, "embeddings")
      .select(
        col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")
      )
    val pert = base
      .filter(col("vec_id") % 20 === 0)
      .select(
        (col("vec_id") + 1000000L).as("vec_id"),
        expr("concat(array(element_at(v, 1) + 0.25), slice(v, 2, 63))").as("v")
      )
    base.unionAll(pert).withColumn("nrm", expr(dotSpark("v", "v")))
  }

  private val nearCorpusCte =
    s"""WITH e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, v FROM e
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, list_prepend(v[1] + 0.25, v[2:64]) AS v
       |  FROM e WHERE vec_id % 20 = 0),
       |n AS (SELECT vec_id, v, ${dotDuck("v", "v")} AS nrm FROM corpus)""".stripMargin

  /** cosine between pre-normed frames aliased q/c (raw, unrounded). */
  private val cosCol =
    expr(s"${dotSpark("qv", "cv")} / (sqrt(qn) * sqrt(cn))")

  /** Exact cardinality of [[nearCorpus]] (base ∪ planted copies), cached
    * per dir like [[Q.cachedRowCount]]: the base count comes from that
    * cache; the planted-copy count (`vec_id % 20 == 0` over the base) is
    * one count-only scan on first use. Feeds plan sizing that must match
    * the DuckDB mirror EXACTLY (`count(*)` over its corpus CTE) — unlike
    * the ±1-tolerant LSH bit sizing, a k-means/IVF seed modulus off by
    * one changes cluster assignments and the verified output.
    */
  private val plantedCountCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private def nearCorpusCount(s: SparkSession, dir: String): Long =
    cachedRowCount(s, dir, "embeddings") +
      plantedCountCache.getOrElseUpdate(
        dir,
        table(s, dir, "embeddings").filter(col("vec_id") % 20 === 0).count()
      )

  /** Exact brute-force top-k for the 10 standard query vectors: broadcast
    * the query side, single candidate pass, per-query ranking. Returns
    * (query_id, neighbor_id, cos (unrounded), rank ≤ k) — shared by
    * `e_bruteforce_topk` and the recall measurement below.
    */
  private def bruteforceTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val all = vecs(s, dir)
    val q = all
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = all
      .select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Symmetric int8 retriever: unit-normalize, scale by 127, round — then
    * rank by the exact integer dot product (associativity-independent, so
    * partitioning can't perturb ranking). Returns (query_id, neighbor_id,
    * qdot, rank) with rank ≤ k; shared by `e_int8_quantized_topk` and the
    * RRF fusion. */
  private def int8TopK(s: SparkSession, dir: String, k: Int): DataFrame = {
    val qz = vecs(s, dir)
      .select(
        col("vec_id"),
        expr("transform(v, x -> CAST(round(x / sqrt(nrm) * 127) AS BIGINT))").as("q")
      )
    val q = qz
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val c = qz.select(col("vec_id").as("neighbor_id"), col("q").as("cq"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("qdot").desc, col("neighbor_id"))
    c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn(
        "qdot",
        expr("aggregate(zip_with(qq, cq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
      )
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  val queries: Map[String, Fn] = Map[String, Fn](
    // Brute-force cosine top-10 for queries vec_id < 10: broadcast the
    // query side, single candidate pass, per-query ranking.
    "e_bruteforce_topk" -> ((s, dir) => {
      bruteforceTopK(s, dir, 10)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF top-5, nprobe=2: centroids = deterministic sample (vec_id%50);
    // assignment + probing are broadcast joins against the tiny centroid
    // set; candidates = vectors in probed cells only.
    "e_ivf_topk" -> ((s, dir) => {
      ivfTopK(s, dir, 5)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ANN index QUALITY metric — the monitoring query a production
    // similarity-search pipeline runs next to its index builds: recall@10
    // of the IVF(nprobe=2) search against the exact brute-force top-10,
    // per query vector. Both sides are deterministic (ties broken by
    // neighbor_id) so the DuckDB oracle reproduces the recall numbers
    // exactly. At 100 TB this is the same plan at the same cost as ONE
    // extra search over a fixed 10-query panel (the brute-force side is
    // the only full scan, and a recall audit samples its query panel by
    // design) — output is 10 rows regardless of corpus size.
    "e_ivf_recall_at_k" -> ((s, dir) => {
      val exact = bruteforceTopK(s, dir, 10).select(col("query_id"), col("neighbor_id"))
      val approx = ivfTopK(s, dir, 10)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      exact
        .join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("hit")).as("hits"))
        .select(col("query_id"), col("hits"), round(col("hits") / 10.0, 6).as("recall"))
        .orderBy(col("query_id"))
    }),

    // MMR diversity re-ranking (Carbonell & Goldstein): greedily pick 5
    // of the top-20 relevance shortlist, each round maximizing
    // λ·rel − (1−λ)·maxSimToSelected (λ = 0.5) with ties on neighbor_id.
    // The 100 TB shape: the corpus is scanned ONCE (the shortlist
    // build); the 5 greedy rounds then run on an O(queries × 20) frame
    // whose size is independent of corpus scale — iterative refinement
    // never re-touches the corpus. Scoring is the same fold-ordered
    // vec_dot doubles as every other embedding query, so each round's
    // argmax is bit-identical in the DuckDB mirror (selection is
    // discrete — one ulp of divergence would pick a different document,
    // making this the sharpest float-portability test in the suite).
    // Round 1's empty selected-set coalesces maxSim to 0, so one score
    // formula serves all rounds.
    "e_mmr_diversify" -> ((s, dir) => {
      val cand = bruteforceTopK(s, dir, 20)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("cv"), col("cn"))
        .localCheckpoint() // shortlist: the only corpus-derived frame
      val pair = cand
        .as("a")
        .join(
          cand.as("b"),
          col("a.query_id") === col("b.query_id") &&
            col("a.neighbor_id") =!= col("b.neighbor_id")
        )
        .select(
          col("a.query_id").as("query_id"),
          col("a.neighbor_id").as("ida"),
          col("b.neighbor_id").as("idb"),
          (expr(dotSpark("a.cv", "b.cv")) / (sqrt(col("a.cn")) * sqrt(col("b.cn"))))
            .as("sim")
        )
        .localCheckpoint() // 20×20 per query, consumed every round
      val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
      var selected = s.emptyDataFrame
      for (r <- 1 to 5) {
        val remaining =
          if (r == 1) cand
          else cand.join(selected, Seq("query_id", "neighbor_id"), "left_anti")
        val maxSim =
          if (r == 1) null
          else
            pair
              .join(
                selected.select(col("query_id"), col("neighbor_id").as("idb")),
                Seq("query_id", "idb")
              )
              .groupBy(col("query_id"), col("ida").as("neighbor_id"))
              .agg(max(col("sim")).as("msim"))
        val scored =
          (if (r == 1) remaining.withColumn("msim", lit(null).cast("double"))
           else remaining.join(maxSim, Seq("query_id", "neighbor_id"), "left"))
            .select(
              col("query_id"),
              col("neighbor_id"),
              (lit(0.5) * col("cos") - lit(0.5) * coalesce(col("msim"), lit(0.0)))
                .as("score")
            )
        val pick = scored
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("neighbor_id"), lit(r).as("rank"), col("score"))
        selected =
          (if (r == 1) pick else selected.unionByName(pick)).localCheckpoint()
      }
      selected
        .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("score"), 6).as("score"))
        .orderBy(col("query_id"), col("rank"))
    })
  ) ++ queries2

  /** IVF(nprobe=2) top-k for the 10 standard query vectors — the plan
    * documented on `e_ivf_topk` below, parameterized by k so the recall
    * measurement can compare its top-10 against the exact top-10.
    * Returns (query_id, neighbor_id, cos (unrounded), rank ≤ k).
    */
  private def ivfTopK(s: SparkSession, dir: String, k: Int): DataFrame = {
      val all = vecs(s, dir)
      // IVF-standard centroid count k ≈ √n, same growth law as
      // e_kmeans_ivf_topk's seed (floored at 50 so small scales keep
      // their previous exact results). The round-7 sf10 probe caught the
      // old fixed `% 50` seed making k LINEAR in n: assignment cost
      // n·k = n²/50 — ~760 s at sf10 (200K vectors × 4000 centroids)
      // vs 4.2 s at sf1. With k ≈ √n the assignment is n^1.5: the same
      // "bucket count must track corpus size" law the round-5 sf1 sweep
      // established for the sign-LSH tables.
      val nVec = cachedRowCount(s, dir, "embeddings")
      val seedMod = math.max(50L, math.floor(math.sqrt(nVec.toDouble)).toLong)
      val cent = all
        .filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      // assign every vector to its nearest centroid — single-pass argmax
      // (max over (cos, -cid) structs == ORDER BY cos DESC, cid LIMIT 1)
      // instead of a window sort over the whole corpus
      val asg = all
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("cid")).as("negcid"))).as("m"))
        .select(col("vec_id"), (-col("m.negcid")).as("cid"))
      // queries probe their 2 nearest centroids
      val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cid"))
      val probes = all
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("query_id"), col("cid"))
      // candidates = vectors assigned to a probed cell; exact re-rank
      val qv = all
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      probes
        .join(asg, "cid")
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .distinct()
        .filter(col("neighbor_id") =!= col("query_id"))
        .join(
          all.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn")),
          "neighbor_id"
        )
        .join(broadcast(qv), "query_id")
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= k)
  }

  /** e6-scaled DCG rank discounts 1/log2(rank+1), ranks 1..10 — fixed
    * literals so NDCG needs no transcendental at query time (a log2's
    * last ulp differs across libm builds; a frozen table cannot).
    */
  private val DiscE6 =
    Seq(1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  /** Ideal DCG_e6 for 10 results with graded relevance 10,9,…,1. */
  private val IdcgE6 = DiscE6.zipWithIndex.map { case (d, i) => (10L - i) * d }.sum

  private def discCase(rankCol: String): String =
    s"CASE $rankCol " + DiscE6.zipWithIndex
      .map { case (d, i) => s"WHEN ${i + 1} THEN ${d}L" }
      .mkString(" ") + " ELSE 0L END"

  private lazy val queries3: Map[String, Fn] = Map(
    // ANN ranking-QUALITY metric beyond recall: NDCG@10 of the IVF
    // (nprobe=2) search against the exact brute-force ranking, per query
    // vector. Graded relevance = 11 − exact_rank for exact-top-10
    // neighbors (0 otherwise); discounts are the frozen e6 1/log2(r+1)
    // table above, so dcg_e6 = Σ rel·disc is exact integer arithmetic
    // and the DuckDB oracle matches bit-for-bit. IDCG is constant
    // (every query has ≥10 true neighbors), so ndcg_e6 is one integer
    // division. Cost profile is identical to e_ivf_recall_at_k: the
    // exact side is the audit's one full scan over a fixed 10-query
    // panel; output is 10 rows at any corpus size.
    "e_ndcg_at_k" -> ((s, dir) => {
      val exact = bruteforceTopK(s, dir, 10)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("ex_rank"))
      ivfTopK(s, dir, 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .join(exact, Seq("query_id", "neighbor_id"), "left")
        .withColumn("rel", coalesce(lit(11L) - col("ex_rank"), lit(0L)))
        .withColumn("gain", col("rel") * expr(discCase("rank")))
        .groupBy(col("query_id"))
        .agg(sum(col("gain")).as("dcg_e6"))
        .select(
          col("query_id"),
          col("dcg_e6"),
          lit(IdcgE6).as("idcg_e6"),
          expr(s"(dcg_e6 * 1000000) div ${IdcgE6}L").as("ndcg_e6")
        )
        .orderBy("query_id")
    }),

    // Distributed linear algebra without collect(): the corpus's top
    // principal direction (first eigenvector of the uncentered Gram
    // matrix Σ v·vᵀ) by TWO unrolled power iterations — the spectral
    // primitive under PCA whitening, spectral clustering, and embedding
    // diagnostics. The 64×64 Gram matrix is never materialized: each
    // step is two linear passes (y = V·x keyed by vec_id, w = Vᵀ·y keyed
    // by the 64 dims), so the cost is O(n·d) per iteration with
    // partial-agg shuffles — the same shape at 100 TB. Fixed e6 start
    // vector, fixed-point integer arithmetic throughout ([[powerStep]]),
    // so the DuckDB mirror is bit-exact; EmbeddingSpec checks the
    // direction against a double-precision reference (cos > 0.999).
    "e_power_iteration_pc1" -> ((s, dir) => {
      val dims = table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
            .as("qvi")
        )
        .select(col("vec_id"), posexplode(col("qvi")).as(Seq("pos", "q")))
        // consumed twice per step × two steps — materialize the
        // quantized dim frame once (hashedSets pattern)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt, col("vec_id"))
        .localCheckpoint()
      val x0 = s.range(0, 64).select(col("id").cast("int").as("pos"), lit(1000000L).as("x_e6"))
      val x2 = powerStep(dims, powerStep(dims, x0))
      x2.orderBy("pos").select(col("pos"), col("x_e6"))
    }),

    // Embedding-distribution drift monitor: per label, the L1 distance
    // between the centroid of the even-id cohort ("old") and the odd-id
    // cohort ("new") — the check a production embedding pipeline runs
    // when a new encoder version or data batch lands. All arithmetic is
    // fixed-point: coordinates quantize to ×2^20 BIGINT, per-(label,
    // cohort, dim) integer sums are exact and associative (partial aggs
    // do the work at 100 TB; the shuffle key domain is labels × 64 dims,
    // tiny), and the per-dim drift |s_o·n_n − s_n·n_o| div (n_o·n_n)
    // keeps every numerator non-negative so truncating division is
    // engine-portable. Output is O(labels).
    "e_centroid_drift" -> ((s, dir) => {
      val dims = table(s, dir, "embeddings")
        .select(
          col("label"),
          (col("vec_id") % 2 === 0).cast("int").as("old_half"),
          expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
            .as("qvi")
        )
        .select(col("label"), col("old_half"), posexplode(col("qvi")).as(Seq("pos", "qv")))
      val cent = dims
        .groupBy(col("label"), col("old_half"), col("pos"))
        .agg(sum(col("qv")).as("sq"), count(lit(1)).as("n"))
      val old = cent
        .filter(col("old_half") === 1)
        .select(col("label"), col("pos"), col("sq").as("so"), col("n").as("no"))
      val neu = cent
        .filter(col("old_half") === 0)
        .select(col("label"), col("pos"), col("sq").as("sn"), col("n").as("nn"))
      old
        .join(neu, Seq("label", "pos"))
        .withColumn("d_q", expr("abs(so * nn - sn * no) div (no * nn)"))
        .groupBy(col("label"))
        .agg(
          min(col("no")).as("n_old"),
          min(col("nn")).as("n_new"),
          sum(col("d_q")).as("l1_drift_q"),
          max(col("d_q")).as("max_dim_drift_q")
        )
        .orderBy("label")
    })
  )

  private lazy val queries2: Map[String, Fn] = queries3 ++ Map[String, Fn](
    // IVF with k-means-LEARNED centroids (VERDICT r3 stretch): 2 Lloyd
    // iterations from the deterministic √n-modulus seed set — fit on a
    // deterministic sample (≥64 points/centroid, see below), full corpus
    // assigned once — then the same nprobe=2 / top-5 search as
    // e_ivf_topk, exact re-rank on the original vectors. Centroid updates run on fixed-point QUANTIZED
    // coordinates (×2^20 → BIGINT): integer sums are exact and
    // associative, so the learned centroids are bit-identical across
    // engines AND across partitionings — a naive double mean is
    // order-dependent and could flip a near-tie assignment. This is also
    // the 100 TB path: the update is a plain partial-aggregating
    // sum/count per (cid, dim) — no ordered folds, no collect — and the
    // assignment is a broadcast-centroid argmax identical to e_ivf_topk's.
    "e_kmeans_ivf_topk" -> ((s, dir) => {
      // register vec_dot BEFORE the first eager-analyzed expr below —
      // standalone invocation must not depend on an earlier query having
      // registered it in the shared session (latent-bug fix, round 5)
      graft.functions.SketchExpressions.register(s)
      // quantized corpus: qvi exact BIGINT, qv = same values as DOUBLE
      // (64 dims × (2^20)^2 ≤ 2^46 keeps dot products overflow-safe)
      val vec = table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
            .as("qvi")
        )
        .withColumn("qv", expr("transform(qvi, x -> CAST(x AS DOUBLE))"))
        .withColumn("qn", expr(dotSpark("qv", "qv")))
      // one Lloyd step: nearest-centroid assignment (single-pass argmax,
      // ties → smallest cid), then per-dimension exact integer mean
      def assign(pts: DataFrame, cent: DataFrame): DataFrame =
        pts
          .select(col("vec_id"), col("qv"), col("qn"))
          .crossJoin(broadcast(cent))
          .withColumn("cos", cosCol)
          .groupBy(col("vec_id"))
          .agg(max(struct(col("cos"), (-col("cid")).as("negcid"))).as("m"))
          .select(col("vec_id"), (-col("m.negcid")).as("cid"))
      def update(asg: DataFrame): DataFrame =
        asg
          .join(vec.select(col("vec_id"), col("qvi")), "vec_id")
          .select(col("cid"), posexplode(col("qvi")))
          .groupBy(col("cid"), col("pos"))
          .agg((sum(col("col")).cast("double") / count(lit(1))).as("v"))
          .groupBy(col("cid"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, v))), p -> p.v)").as("cv"))
          .withColumn("cn", expr(dotSpark("cv", "cv")))
      // IVF-standard centroid count k ≈ √n: the seed modulus grows with
      // the corpus (floored at 50 so small scales keep their previous
      // exact results), so Lloyd assignment work is n·k ≈ n^1.5 instead
      // of n²/50 — on the regenerated corpus (20K vectors at sf1) this
      // is 141 centroids, not the 400 a fixed %50 seed would give. Both
      // engines floor(sqrt(count)) on an exactly-representable double,
      // so the modulus is identical.
      val nVec = cachedRowCount(s, dir, "embeddings")
      val seedMod = math.max(50L, math.floor(math.sqrt(nVec.toDouble)).toLong)
      val cent0 = vec
        .filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id").as("cid"), col("qv").as("cv"), col("qn").as("cn"))
      // SAMPLE-FIT Lloyd (VERDICT r7 #1): the fit iterations run on a
      // deterministic modulus sample of ≥64 points per centroid
      // (m = n / sampleMod ≈ 64·k), so the build costs 2·m·k ≈ 128·n dot
      // products — O(n) — instead of the 2·n·k = n^1.5 a full-corpus fit
      // grows at (the round-7 sf10 probe billed that at 143 s of the
      // 210 s total). The FULL corpus is still assigned exactly once
      // below (that n·k pass is the IVF index itself, not fit overhead).
      // 64 points/centroid keeps the learned centroids statistically
      // indistinguishable for search (each centroid's mean estimated
      // from ≥64 draws; the exact-re-rank stage absorbs any residual
      // cell-boundary drift). sampleMod = 1 (fit = full corpus, plans
      // unchanged) through sf0.1; sf1 fits on every 2nd vector — and the
      // sf1 oracle sweep checks that path end-to-end, DuckDB mirroring
      // the same modulus sample in its c0/fit CTEs.
      val sampleMod = math.max(1L, nVec / (64L * seedMod))
      val fit =
        if (sampleMod == 1L) vec else vec.filter(col("vec_id") % sampleMod === 0)
      // checkpoint the (tiny, ≤ |corpus|/50-row) centroid frame: it has
      // two consumers (final assignment + query probes) which would each
      // re-run the whole Lloyd-iteration DAG; on a real cluster you'd
      // persist learned centroids the same way
      val learned = (1 to KMeansIters)
        .foldLeft(cent0)((c, _) => update(assign(fit, c)))
        .localCheckpoint()
      // search: probe 2 nearest learned centroids (quantized metric, same
      // as assignment), candidates from probed cells, exact re-rank on
      // the ORIGINAL unquantized vectors
      val all = vecs(s, dir)
      val asgF = assign(vec, learned)
      val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cid"))
      val probes = vec
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("qv"), col("qn"))
        .crossJoin(broadcast(learned))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("query_id"), col("cid"))
      val q = all
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      probes
        .join(asgF, "cid")
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
        .distinct()
        .filter(col("neighbor_id") =!= col("query_id"))
        .join(
          all.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn")),
          "neighbor_id"
        )
        .join(broadcast(q), "query_id")
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Embedding-cosine near-dup: 12-table sign-LSH bucket join → exact
    // verify ≥ 0.95. Banding miss probability is threshold-dependent —
    // ≈2e-4 right at the 0.95 boundary, ≤5e-6 at the ≥0.97 cosines the
    // test corpus actually contains (full derivation and the knobs to
    // tighten it are in the sizing note above); the verified output
    // equals the exact pair set on every swept corpus (the oracle).
    "e_cosine_neardup_pairs" -> ((s, dir) => {
      val cor = nearCorpus(s, dir)
      // Candidate generation (bucket build + checkpoint, multiprobe,
      // bucket join) lives in [[neardupCandidates]]; the bucket frame is
      // checkpointed there because it self-joins and the corpus feeds
      // three subplans — the plane dot products must run once.
      // Corpus size for bit sizing: base + one planted copy per 20 ids —
      // derived from the CACHED base count (ADVICE r7: the old eager
      // cor.count() billed a full scan per invocation). The (n+19)/20
      // term is exact for 0-based contiguous vec_ids and within ±1
      // otherwise — bit-width sizing only needs the magnitude; the
      // verified output is the exact pair set regardless of bits.
      val nBase = cachedRowCount(s, dir, "embeddings")
      val bits = bitsForCorpus(nBase + (nBase + 19L) / 20L)
      val cand = neardupCandidates(cor, bits)
      val a = cor.select(col("vec_id").as("vec_a"), col("v").as("qv"), col("nrm").as("qn"))
      val b = cor.select(col("vec_id").as("vec_b"), col("v").as("cv"), col("nrm").as("cn"))
      cand
        .join(a, "vec_a")
        .join(b, "vec_b")
        .withColumn("cos", cosCol)
        .filter(col("cos") >= 0.95)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540):
    // cluster the embedding space with k ≈ √n deterministic centroids
    // (same seed law as the IVF index), then search for near-duplicates
    // ONLY within cluster cells — a vector is dropped when some
    // smaller-id cell-mate sits at cosine ≥ 0.95; the reported exemplar
    // is its most-similar kept neighbor (ties → smallest id). Assignment
    // is SOFT: each vector lands in its 2 nearest cells (a near-dup pair
    // is searched if the vectors SHARE any cell). On isotropic vectors —
    // clustering's worst case — hard assignment found only 11/25 planted
    // pairs at sf0.001 (cell boundaries are everywhere when the space has
    // no real cluster structure); top-2 assignment recovers 24/25 for a
    // bounded 4× candidate-volume factor, the same nprobe=2 trade the IVF
    // search makes. The clustering still bounds the pairwise stage:
    // expected cell size 2n/k, total candidate dots Σ sz² ≈ 4n²/k ≈ n^1.5
    // — distributed by a plain shuffle join on the cell id (AQE's
    // skew-join split handles a hot cell) — instead of the n² an
    // unclustered pass costs. Remaining boundary-split pairs are inherent
    // to SemDeDup, not this implementation; the DuckDB oracle mirrors the
    // SAME soft assignment, so the check is exact about what the
    // algorithm claims. Cross-check: e_cosine_neardup_pairs finds the
    // boundary-split pairs too (LSH buckets are independent of the
    // clustering).
    "e_semantic_dedup" -> ((s, dir) => {
      val cor = nearCorpus(s, dir)
      val nCor = nearCorpusCount(s, dir)
      val seedMod = math.max(50L, math.floor(math.sqrt(nCor.toDouble)).toLong)
      val cent = cor
        .filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      // top-2 nearest-centroid soft assignment (ties → smaller cid) —
      // same n·k volume as the argmax, ranked per-vector
      val wAsg = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("cid"))
      val asg = cor
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(wAsg))
        .filter(col("rn") <= 2)
        .select(col("vec_id"), col("cid"))
      val m = asg.join(cor, "vec_id")
      val keep = m.select(
        col("cid"), col("vec_id").as("exemplar_id"),
        col("v").as("qv"), col("nrm").as("qn"))
      val drop = m.select(
        col("cid"), col("vec_id"),
        col("v").as("cv"), col("nrm").as("cn"))
      keep
        .join(drop, "cid")
        .filter(col("exemplar_id") < col("vec_id"))
        .withColumn("cos", cosCol)
        .filter(col("cos") >= 0.95)
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("exemplar_id")).as("nege"))).as("m"))
        .select(
          col("vec_id").as("dropped_id"),
          (-col("m.nege")).as("exemplar_id"),
          round(col("m.cos"), 6).as("cosine"))
        .orderBy(col("dropped_id"))
    }),

    // Product-quantization ANN (Jégou, Douze, Schmid 2011, "Product
    // Quantization for Nearest Neighbor Search", IEEE TPAMI): split the
    // 64-dim space into M=8 subspaces of 8 dims, quantize each subvector
    // to one of K=16 deterministic codewords (argmin L2, ties → smallest
    // code), search by Asymmetric Distance Computation — per query, an
    // M×K inner-product lookup table against the codebook, each
    // candidate scored as the sum of its M table entries. This is the
    // memory-bound 100 TB play beyond int8: a vector compresses to
    // M·log2(K) = 32 BITS (64× smaller than float32), the encode pass is
    // n·M·K 8-dim dots (linear), and the scan phase never touches the
    // original vectors — at cluster scale the codes column rides in
    // memory while floats stay on disk for a final exact re-rank (here
    // the output is the raw ADC ranking so the oracle checks the PQ math
    // itself, not a re-rank that would mask it). All scoring is IEEE
    // double arithmetic folded in a FIXED order (codebook scores: one
    // fused vec_dot; ADC sum: m-sorted list fold) so DuckDB reproduces
    // every score bit-identically — an unordered SUM over the M partial
    // scores would be partitioning-dependent in the last ulp.
    "e_pq_topk" -> ((s, dir) =>
      pqRanked(s, dir)
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("qscore"), 6).as("qscore"), col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))),

    // ANN audit #3 — recall@10 of the PQ/ADC search vs the exact float
    // top-10, per query: the codebook-quality number a PQ index build
    // publishes (recall/NDCG audit the IVF routing above; this audits
    // the QUANTIZER — the two degrade independently). Same cost shape
    // as the other audits: exact side is the one full scan over the
    // fixed query panel; 10 output rows at any corpus size.
    "e_pq_recall_at_k" -> ((s, dir) => {
      val exact = bruteforceTopK(s, dir, 10).select(col("query_id"), col("neighbor_id"))
      val approx = pqRanked(s, dir)
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
      exact
        .join(approx, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("hit")).as("hits"))
        .select(col("query_id"), col("hits"), round(col("hits") / 10.0, 6).as("recall"))
        .orderBy(col("query_id"))
    })
  ) ++ pqHost ++ indexStore

  /** One distributed power-iteration step, integer fixed-point: given the
    * current direction X(pos → x_e6), compute w = Σ_v (v·x)·v without ever
    * materializing the 64×64 Gram matrix — y_v = Σ_pos q·x (shuffle on
    * vec_id), then w_pos = Σ_v y'·q (shuffle on pos, 64 keys) — and
    * renormalize to e6 by the max |w| coordinate. All sums are BIGINT
    * (associative, partial-agg friendly); the two `div 2^26` / renorm
    * shifts keep every intermediate under 2^63 through sf10 (≈2.2e18 at
    * 2M vectors — a 100 TB corpus widens the w sums to DECIMAL(38)).
    * Spark `div` and DuckDB `//` both truncate toward zero, so the
    * signed quotients agree exactly.
    */
  private def powerStep(dims: DataFrame, x: DataFrame): DataFrame = {
    val y = dims
      .join(broadcast(x), "pos")
      .groupBy(col("vec_id"))
      .agg(sum(col("q") * col("x_e6")).as("y"))
      .withColumn("yq", expr("y div 67108864")) // 2^26
    val w = dims
      .join(y.select(col("vec_id"), col("yq")), "vec_id")
      .groupBy(col("pos"))
      .agg(sum(col("yq") * col("q")).as("w"))
    val wmax = w.agg(max(abs(col("w"))).as("wmax"))
    w.crossJoin(broadcast(wmax))
      .select(col("pos"), expr("w div greatest(1, wmax div 1000000)").as("x_e6"))
  }

  /** PQ/ADC ranked candidates for the 10 standard query vectors:
    * M=8 × K=16 codebook from evenly-spaced sample vectors, argmin-L2
    * encoding (as argmax 2·x·c − c·c), ADC lookup-table scoring folded
    * in subspace order (deterministic double sum). Returns (query_id,
    * neighbor_id, qscore, rank) — shared by `e_pq_topk` and the PQ
    * recall audit.
    */
  private def pqRanked(
      s: SparkSession,
      dir: String
  ): DataFrame = {
      val all = vecs(s, dir)
      val M = 8
      val K = 16
      val nVec = cachedRowCount(s, dir, "embeddings")
      val cbMod = math.max(1L, nVec / K)
      // codebook: the K evenly-spaced sample vectors, sliced into M
      // 8-dim codewords each — (m, j, cv, cc); 128 tiny rows, broadcast
      val cb = all
        .filter(col("vec_id") % cbMod === 0 && col("vec_id") < K * cbMod)
        .select(floor(col("vec_id") / cbMod).cast("long").as("j"), col("v"))
        .select(col("j"), explode(expr(s"sequence(0, ${M - 1})")).as("m"), col("v"))
        .select(col("j"), col("m"), expr("slice(v, m * 8 + 1, 8)").as("cv"))
        .withColumn("cc", expr(dotSpark("cv", "cv")))
      // encode: per (vector, subspace) argmin-L2 codeword; for fixed x,
      // argmin ||x-c||² == argmax (2·x·c − c·c) — skips the x·x term
      val sub = all
        .select(col("vec_id"), explode(expr(s"sequence(0, ${M - 1})")).as("m"), col("v"))
        .select(col("vec_id"), col("m"), expr("slice(v, m * 8 + 1, 8)").as("xm"))
      val codes = sub
        .join(broadcast(cb), "m")
        .withColumn("sc", expr(s"2 * ${dotSpark("xm", "cv")} - cc"))
        .groupBy(col("vec_id"), col("m"))
        .agg(max(struct(col("sc"), (-col("j")).as("negj"))).as("a"))
        .select(col("vec_id"), col("m"), (-col("a.negj")).as("code"))
      // ADC lookup tables for the 10 standard query vectors: 10×M×K rows
      val lut = all
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), explode(expr(s"sequence(0, ${M - 1})")).as("m"), col("v"))
        .select(col("query_id"), col("m"), expr("slice(v, m * 8 + 1, 8)").as("qm"))
        .join(broadcast(cb), "m")
        .select(col("query_id"), col("m"), col("j").as("code"),
          expr(dotSpark("qm", "cv")).as("lut"))
      // score every encoded vector against every query via the tables;
      // the M partial scores fold in subspace order (deterministic sum)
      val w = Window.partitionBy(col("query_id")).orderBy(col("qscore").desc, col("neighbor_id"))
      codes
        .join(broadcast(lut), Seq("m", "code"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(expr(
          "aggregate(transform(array_sort(collect_list(struct(m, lut))), p -> p.lut), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x)").as("qscore"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("qscore"))
        .withColumn("rank", row_number().over(w))
  }

  private lazy val pqHost: Map[String, Fn] = Map(
    // Int8-quantized brute-force top-10: normalize, scale to [-127, 127],
    // round to integers, rank by the INTEGER dot product. At 100 TB this
    // is the memory-bandwidth play — 8-bit vectors are 4× smaller than
    // float32 (64 B/vector here), scans are SIMD-friendly, and the
    // integer scores are exact/associative so ranking is partitioning-
    // independent (no float-sum order sensitivity). Quantization uses
    // only IEEE ops both engines share (divide, sqrt, multiply, round) —
    // the oracle reproduces every int8 code and score bit-identically.
    // EmbeddingSpec checks recall vs the exact float top-10.
    "e_int8_quantized_topk" -> ((s, dir) => {
      int8TopK(s, dir, 10)
        .select(col("query_id"), col("neighbor_id"), col("qdot"), col("rank").cast("int").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    // fuse the exact float-cosine retriever with the int8 symmetric-
    // quantized retriever — rrf(d) = Σ_r 1/(K + rank_r(d)), K = 60, over
    // each retriever's top-20. All-integer scoring (1e6 div (60+rank)),
    // so the fused ranking is associativity/partitioning-independent and
    // reproduces bit-exactly in the mirror. Absent-from-a-list ranks
    // surface as 0 (not NULL) so the output is typed-stable. Scale: the
    // two retrievers are computed in ONE corpus pass — the int8 vector is
    // a projection of the same row the float cosine reads, so both scores
    // come out of a single broadcast-query scan, and both rank windows
    // share one hash(query_id) exchange (two sorts, zero extra scans —
    // the round-8 two-independent-retriever form paid the corpus scan
    // and the per-row 64-dim arithmetic twice, 18 s at sf10). A row
    // ranked > 20 by a retriever is absent from that retriever's list
    // (contributes 0), exactly the prior full-outer-join semantics.
    "e_rrf_fusion" -> ((s, dir) => {
      val all = vecs(s, dir)
      val q = all
        .filter(col("vec_id") < 10)
        .select(
          col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
          expr("transform(v, x -> CAST(round(x / sqrt(nrm) * 127) AS BIGINT))").as("qq")
        )
      val c = all.select(
        col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"),
        expr("transform(v, x -> CAST(round(x / sqrt(nrm) * 127) AS BIGINT))").as("cq")
      )
      val wFloat = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      val wInt8 = Window.partitionBy(col("query_id")).orderBy(col("qdot").desc, col("neighbor_id"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("rrf_e6").desc, col("neighbor_id"))
      c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosCol)
        .withColumn(
          "qdot",
          expr("aggregate(zip_with(qq, cq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
        )
        .withColumn("r_float", row_number().over(wFloat))
        .withColumn("r_int8", row_number().over(wInt8))
        .filter(col("r_float") <= 20 || col("r_int8") <= 20)
        .withColumn(
          "rrf_e6",
          expr("CASE WHEN r_float <= 20 THEN 1000000L div (60 + r_float) ELSE 0L END") +
            expr("CASE WHEN r_int8 <= 20 THEN 1000000L div (60 + r_int8) ELSE 0L END")
        )
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(
          col("query_id"), col("neighbor_id"), col("rrf_e6"),
          col("rank").cast("int").as("rank"),
          expr("CASE WHEN r_float <= 20 THEN r_float ELSE 0 END").as("rank_float"),
          expr("CASE WHEN r_int8 <= 20 THEN CAST(r_int8 AS INT) ELSE 0 END").as("rank_int8")
        )
        .orderBy("query_id", "rank")
    }),

    // Centroid-based silhouette per IVF cell — the cluster-quality audit
    // an index build emits next to `e_ivf_balance_stats`: for each vector,
    // a = distance to its own (nearest) centroid, b = distance to the
    // runner-up centroid; with cosine distance d = 1 − cos and a ≤ b this
    // collapses to s = (c1 − c2) / (1 − c2). Classic silhouette's
    // all-pairs a/b is O(n²) per cell; the centroid form (Rousseeuw's
    // "simplified silhouette") is the standard large-corpus surrogate —
    // one n×k pass, the same cost as the assignment itself. Per-vector
    // top-2 rides the GroupedTopK operator (bounded map-side heaps):
    // the broadcast join emits each vector's k centroid rows
    // consecutively, so the partial heap holds 2 rows per live key and
    // the exchange carries 2n rows — the round-8 sf10 probe caught the
    // previous collect_list+array_sort form buffering the full n×k in
    // agg state (198 s at sf10; the heap form removes the n·k·log k
    // sort and the n×k hash-agg buffers).
    "e_centroid_silhouette" -> ((s, dir) => {
      val all = vecs(s, dir)
      val nVec = cachedRowCount(s, dir, "embeddings")
      val seedMod = math.max(50L, math.floor(math.sqrt(nVec.toDouble)).toLong)
      val cent = all
        .filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      val scored = all
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .select(col("vec_id"), col("cid"), col("cos"))
      graft.plans.GroupedTopK
        .topK(scored, Seq("vec_id"), Seq(col("cos").desc, col("cid").asc), 2)
        .groupBy(col("vec_id"))
        .agg(
          max(struct(col("cos"), (-col("cid")).as("negcid"))).as("m1"),
          min(struct(col("cos"), (-col("cid")).as("negcid"))).as("m2")
        )
        .select(
          (-col("m1.negcid")).as("cid"),
          col("m1.cos").as("c1"),
          col("m2.cos").as("c2")
        )
        .groupBy(col("cid"))
        .agg(
          count(lit(1)).as("n_members"),
          round(avg(expr("(c1 - c2) / (1 - c2)")), 6).as("avg_silhouette")
        )
        .orderBy("cid")
    }),

    // Hard-negative mining — the contrastive-training data op (DPR /
    // Contriever style): for each query, the top-5 most-similar corpus
    // vectors that are NOT positives — candidates at cosine ≥ 0.95
    // (near-dups/paraphrases of the query, planted here by nearCorpus)
    // are excluded first, because training against a true duplicate as a
    // "negative" poisons the objective. Output carries the per-query
    // excluded-positive count so the exclusion is itself verified.
    // Scale shape = brute-force top-k (broadcast 10-query panel, one
    // corpus pass); in production the candidate pass rides the same IVF/
    // LSH index as e_ivf_topk — the exclusion filter and ranking are
    // unchanged.
    "e_hard_negatives" -> ((s, dir) => {
      val all = nearCorpus(s, dir)
      val q = all
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = all.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
      val scored = c
        .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosCol)
      val posCounts = scored
        .filter(col("cos") >= 0.95)
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_positives_excluded"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      scored
        .filter(col("cos") < 0.95)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .join(posCounts, Seq("query_id"), "left")
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cosine"), col("rank").cast("int").as("rank"),
          coalesce(col("n_positives_excluded"), lit(0L)).as("n_positives_excluded"))
        .orderBy("query_id", "rank")
    }),

    // IVF index-health stats — the monitoring row an ANN pipeline emits
    // after every index build: cell count, assigned total, cell-size
    // min/max/avg and the imbalance factor (max/avg). A skewed index
    // (imbalance ≫ 1) degrades probe cost and recall simultaneously;
    // this is the observability face of the k ≈ √n growth law. One
    // broadcast-argmax assignment pass + one groupBy — same cost class
    // as the index build itself; O(1) output.
    "e_ivf_balance_stats" -> ((s, dir) => {
      val all = vecs(s, dir)
      val nVec = cachedRowCount(s, dir, "embeddings")
      val seedMod = math.max(50L, math.floor(math.sqrt(nVec.toDouble)).toLong)
      val cent = all
        .filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      val asg = all
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("cid")).as("negcid"))).as("m"))
        .select(col("vec_id"), (-col("m.negcid")).as("cid"))
      asg
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("sz"))
        .agg(
          count(lit(1)).as("n_cells"),
          sum(col("sz")).as("n_assigned"),
          min(col("sz")).as("min_size"),
          max(col("sz")).as("max_size"),
          round(avg(col("sz")), 6).as("avg_size"),
          // max/avg as exact-integer ratio: max·cells/total, one division
          round(max(col("sz")) * count(lit(1)) / sum(col("sz")).cast("double"), 6)
            .as("imbalance"))
    }),

    // Matryoshka two-stage retrieval (Kusupati et al. 2022, "Matryoshka
    // Representation Learning", NeurIPS): MRL-trained embeddings make
    // every PREFIX a usable lower-dim embedding, so retrieval ranks the
    // whole corpus by the 16-dim prefix cosine (¼ the dot-product work),
    // shortlists the top-50 per query, and re-ranks ONLY the shortlist
    // by full 64-dim cosine. The 100 TB shape: the prefix lives as its
    // own column, so stage 1's scan reads 25 % of the vector bytes
    // (column pruning, SIMD-friendly short dots), and stage 2 is a keyed
    // JOIN fetching 50·|queries| full vectors — never a second corpus
    // scan. Both stages are deterministic (cos DESC, neighbor_id
    // tie-break) and every double is a fixed-order fold, so the oracle
    // reproduces shortlist membership and both rankings bit-identically.
    // On this corpus the prefix is a random projection, not MRL-trained
    // — EmbeddingSpec measures the recall floor that survives even that.
    "e_matryoshka_topk" -> ((s, dir) => {
      val all = vecs(s, dir)
        .withColumn("pv", expr("slice(v, 1, 16)"))
        .withColumn("pn", expr(dotSpark("pv", "pv")))
      val q = all
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("pv").as("qpv"), col("pn").as("qpn"))
      val cPrefix = all.select(col("vec_id").as("neighbor_id"),
        col("pv").as("cpv"), col("pn").as("cpn"))
      val wPre = Window.partitionBy(col("query_id"))
        .orderBy(col("pcos").desc, col("neighbor_id"))
      val short = cPrefix
        .join(broadcast(q.select("query_id", "qpv", "qpn")),
          col("neighbor_id") =!= col("query_id"))
        .withColumn("pcos", expr(s"${dotSpark("qpv", "cpv")} / (sqrt(qpn) * sqrt(cpn))"))
        .withColumn("prefix_rank", row_number().over(wPre))
        .filter(col("prefix_rank") <= 50)
        .select("query_id", "neighbor_id", "prefix_rank")
      // stage 2: fetch full vectors for the shortlist only (keyed join)
      val wFull = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      short
        .join(all.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
          col("nrm").as("cn")), Seq("neighbor_id"))
        .join(broadcast(q.select("query_id", "qv", "qn")), Seq("query_id"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(wFull))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cosine"),
          col("prefix_rank").cast("int").as("prefix_rank"),
          col("rank").cast("int").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // Binary-quantization retrieval (the BQ/RaBitQ pattern production
    // vector stores ship next to int8 and PQ): each 64-dim vector
    // compresses to its 64 SIGN BITS, the coarse pass ranks by Hamming
    // distance — two XOR+popcount ops per pair instead of 64 multiplies
    // — and only the 50-candidate shortlist is re-ranked with exact
    // cosine. Codes are stored as TWO 32-bit halves in BIGINTs: a single
    // 64-bit code would need bit 63, whose 1<<63 overflows — Spark's
    // non-ANSI shift wraps negative while DuckDB raises, so the engines
    // would diverge; two halves keep every value positive and the
    // arithmetic identical. Ties (common — Hamming is integer-valued)
    // break on neighbor_id on both engines.
    //
    // Scale: the coarse scan reads 16 bytes/vector instead of 512 (the
    // raw doubles) — a 32× byte reduction on the corpus-sized pass — and
    // the shortlist rides the GroupedTopK physical operator (bounded
    // map-side heaps, no global sort); exact re-rank then touches only
    // |queries|·50 vectors via a broadcast semi-join, independent of
    // corpus size.
    "e_binary_topk" -> ((s, dir) => {
      def half(off: Int) =
        s"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) -> acc + " +
          s"CASE WHEN element_at(v, j + ${off + 1}) > CAST(0 AS DOUBLE) " +
          s"THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"
      val all = vecs(s, dir)
      val coded = all.select(
        col("vec_id"),
        expr(half(0)).as("lo"),
        expr(half(32)).as("hi")
      )
      val q = coded
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("lo").as("qlo"), col("hi").as("qhi"))
      val shortlist = graft.plans.GroupedTopK
        .topK(
          coded
            .select(col("vec_id").as("neighbor_id"), col("lo"), col("hi"))
            .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
            .withColumn("hamming", expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)")),
          Seq("query_id"),
          Seq(col("hamming").asc, col("neighbor_id").asc),
          k = 50
        )
        .select(col("query_id"), col("neighbor_id"), col("hamming"))
      val qv = vecs(s, dir)
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      shortlist
        .join(
          vecs(s, dir).select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn")),
          Seq("neighbor_id")
        )
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(
          col("query_id"),
          col("neighbor_id"),
          col("hamming"),
          round(col("cos"), 6).as("cosine"),
          col("rank").cast("int").as("rank")
        )
        .orderBy("query_id", "rank")
    })
  )

  private def cosSql(qv: String, cv: String, qn: String, cn: String) =
    s"${dotDuck(qv, cv)} / (sqrt($qn) * sqrt($cn))"

  /** Unrolled fixed-dim (64) dot product — the same left-associative
    * fold order as [[dotDuck]] (0 + p₁ + p₂ + …), so the same IEEE
    * double, but as one flat vectorized expression instead of a per-row
    * list comprehension + lambda reduce (the scalar-at-a-time shape the
    * r12 minhash mirror re-plan measured as the disease). Verified
    * per-row identical to the dotDuck form on the sf1 corpus.
    */
  private def dotDuck64(a: String, b: String): String =
    (1 to 64).map(i => s"($a)[$i] * ($b)[$i]")
      .mkString("(CAST(0 AS DOUBLE) + ", " + ", ")")

  private def cosSql64(qv: String, cv: String, qn: String, cn: String) =
    s"${dotDuck64(qv, cv)} / (sqrt($qn) * sqrt($cn))"

  /** Full-corpus nearest-centroid assignment `name(vec_id, cid)` over
    * `xCte` (vec col `xv`, norm `xn`) × `centCte` (cid, `cv`, `cn`) —
    * the r13 re-plan of the nxk-assignment mirror family (VERDICT r12
    * #1). The old cross-join + per-vector row_number() window form
    * sorts n×k rows and evaluates the lambda-fold dot per pair: TIMEOUT
    * (>900 s) at sf10. This form is the verify-skill's prescribed
    * scalar-max + tie-break join-back: two streaming aggregates with
    * 8-byte states (a struct_pack argmin was measured kernel-OOMing at
    * the same scale — the documented 100M-row struct-aggregate balloon)
    * and the unrolled dot. Same argmax semantics bit-for-bit: max cos,
    * ties to the smallest cid, cos recomputed by the identical
    * expression on both passes. Measured sf10: 104 s vs >900 s; sf1
    * per-row identical to the window form.
    */
  private def argmaxAsgDuck(
      name: String, xCte: String, centCte: String,
      xv: String = "v", xn: String = "nrm",
      cv: String = "v", cn: String = "nrm"): String = {
    val cos = cosSql64(s"x.$xv", s"c.$cv", s"x.$xn", s"c.$cn")
    s"""${name}mx AS (SELECT x.vec_id, max($cos) AS mc
       |       FROM $xCte x CROSS JOIN $centCte c GROUP BY x.vec_id),
       |$name AS (SELECT x.vec_id, min(c.cid) AS cid
       |        FROM $xCte x JOIN ${name}mx USING (vec_id) CROSS JOIN $centCte c
       |        WHERE $cos = ${name}mx.mc
       |        GROUP BY x.vec_id)""".stripMargin
  }

  /** One unrolled greedy MMR round as a DuckDB CTE pair: the remaining
    * candidates' max-sim-to-selected joins in, the round's winner is the
    * (score DESC, neighbor_id) row_number()=1 row, and `a_r` accumulates
    * the selected set — mirroring the Spark loop round-for-round.
    * MATERIALIZED is load-bearing at scale (the pagerank-mirror move):
    * each round references its predecessor twice (msim join + NOT
    * EXISTS), so DuckDB's default CTE inlining re-derives the corpus-
    * sized `p`→`cand` chain exponentially many times — the sf10 sweep
    * timed the un-pinned form out at 600 s where the pinned form
    * clears in seconds; the hint is semantics-neutral and mirrors the
    * Spark side's per-round localCheckpoint. */
  private def mmrStepDuck(r: Int): String = {
    val prev = s"a${r - 1}"
    s""", s$r AS MATERIALIZED (SELECT query_id, neighbor_id, $r AS rank, score FROM (
       |  SELECT c.query_id, c.neighbor_id,
       |    0.5 * c.cos - 0.5 * coalesce(m.msim, 0.0) AS score,
       |    row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY 0.5 * c.cos - 0.5 * coalesce(m.msim, 0.0) DESC, c.neighbor_id) AS rn
       |  FROM cand c
       |  LEFT JOIN (SELECT p2.query_id, p2.ida AS nid, max(p2.sim) AS msim
       |             FROM pr p2 JOIN $prev s ON p2.query_id = s.query_id AND p2.idb = s.neighbor_id
       |             GROUP BY 1, 2) m
       |    ON c.query_id = m.query_id AND c.neighbor_id = m.nid
       |  WHERE NOT EXISTS (SELECT 1 FROM $prev s2
       |                    WHERE s2.query_id = c.query_id AND s2.neighbor_id = c.neighbor_id)
       |  ) WHERE rn = 1)
       |, a$r AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT * FROM s$r)""".stripMargin
  }

  /** IVF(nprobe=2) candidate scoring as a CTE chain (requires the `n`
    * normed-vector CTE in scope) — shared by the `e_ivf_topk` oracle and
    * the recall-measurement oracle, mirroring [[ivfTopK]] exactly. */
  private lazy val ivfScSql: String =
    s"""cent AS MATERIALIZED (SELECT vec_id AS cid, v, nrm FROM n
       |         WHERE vec_id % (SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT))
       |                         FROM embeddings) = 0),
       |${argmaxAsgDuck("asg", "n", "cent")},
       |probes AS (SELECT query_id, cid FROM (
       |  SELECT q.vec_id AS query_id, c.cid,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} DESC, c.cid) AS rn
       |  FROM n q CROSS JOIN cent c WHERE q.vec_id < 10) WHERE rn <= 2),
       |cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
       |         FROM probes p JOIN asg a ON p.cid = a.cid
       |         WHERE a.vec_id <> p.query_id),
       |sc AS (SELECT cand.query_id, cand.neighbor_id,
       |         ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
       |       FROM cand JOIN n q ON q.vec_id = cand.query_id
       |                 JOIN n c ON c.vec_id = cand.neighbor_id)""".stripMargin

  /** The PQ pipeline as a CTE chain ending in ranked candidates `r`
    * (query_id, neighbor_id, qscore, rank) — codebook slicing, argmin-L2
    * encoding (as the equivalent argmax 2·x·c − c·c with the identical
    * tie-break), and the m-ordered ADC score fold: every score is the
    * same IEEE double on both engines, so rankings cannot diverge.
    * Shared by the `e_pq_topk` oracle and the PQ recall audit.
    */
  private lazy val pqCtes: String = {
    val cbModSql = "(SELECT greatest(1, count(*) // 16) FROM embeddings)"
    s"""$vecsCte,
       |cb0 AS (SELECT CAST(floor(vec_id / $cbModSql) AS BIGINT) AS j,
       |          r.range AS m, v[r.range * 8 + 1 : r.range * 8 + 8] AS cv
       |        FROM n CROSS JOIN range(0, 8) r
       |        WHERE vec_id % $cbModSql = 0 AND vec_id < 16 * $cbModSql),
       |cb AS (SELECT j, m, cv, ${dotDuck("cv", "cv")} AS cc FROM cb0),
       |sub AS (SELECT vec_id, r.range AS m,
       |          v[r.range * 8 + 1 : r.range * 8 + 8] AS xm
       |        FROM n CROSS JOIN range(0, 8) r),
       |enc AS (SELECT s.vec_id, s.m, c.j,
       |          2 * ${dotDuck("s.xm", "c.cv")} - c.cc AS sc
       |        FROM sub s JOIN cb c ON c.m = s.m),
       |codes AS (SELECT vec_id, m, j AS code FROM (
       |  SELECT vec_id, m, j,
       |    row_number() OVER (PARTITION BY vec_id, m ORDER BY sc DESC, j) AS rn
       |  FROM enc) WHERE rn = 1),
       |lut AS (SELECT s.vec_id AS query_id, s.m, c.j AS code,
       |          ${dotDuck("s.xm", "c.cv")} AS lut
       |        FROM sub s JOIN cb c ON c.m = s.m WHERE s.vec_id < 10),
       |adc AS (SELECT l.query_id, c.vec_id, l.m, l.lut
       |        FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code),
       |agg AS (SELECT query_id, vec_id,
       |          list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lut ORDER BY m)),
       |                      (x, y) -> x + y) AS qscore
       |        FROM adc GROUP BY query_id, vec_id),
       |r AS (SELECT query_id, vec_id AS neighbor_id, qscore,
       |        row_number() OVER (PARTITION BY query_id
       |          ORDER BY qscore DESC, vec_id) AS rank
       |      FROM agg WHERE vec_id <> query_id)""".stripMargin
  }

  /** Persisted IVF index tables for `dir`'s embeddings (VERDICT r8 #5 —
    * "build once, search many", the index-store twin of
    * `o_bucketed_join_stats`'s bucket-once discipline): a centroid table
    * (k ≈ √n seeded centroids, the exact frame [[ivfTopK]] derives
    * in-flight) and a postings table — every vector with its assigned
    * cell — written PARTITIONED BY cid, so a search that probes nprobe
    * cells reads only those partition directories (nprobe/k of the
    * corpus; the scan-level realization of the ANN promise, same
    * "partition once, prune many" layout as `partitionedEvents`).
    * Table names carry the source-content fingerprint, so a regenerated
    * corpus or a scale switch rebuilds instead of serving stale cells.
    * `repartition(cid)` before the write keeps it to one file per
    * (cell, task) instead of every task spraying every cell directory.
    */
  private def ivfIndexTables(
      s: SparkSession,
      dir: String,
      rebuild: Boolean
  ): (String, String, String) = {
    val tag = OperatorQueries.sourceTag(s, s"$dir/embeddings.parquet")
    val centT = s"graft_ivf_cent_$tag"
    val postT = s"graft_ivf_post_$tag"
    val codeT = s"graft_pq_code_$tag"
    if (rebuild || !s.catalog.tableExists(centT) ||
      !s.catalog.tableExists(postT) || !s.catalog.tableExists(codeT)) {
      // Orphan sweep (ADVICE r9 #3): a regenerated corpus or a scale
      // switch changes the tag, stranding the PREVIOUS tag's tables (the
      // postings one is corpus-sized) in the warehouse forever — drop any
      // same-prefix table whose suffix differs before writing this tag's.
      s.catalog.listTables().collect()
        .map(_.name)
        .filter(n =>
          Seq("graft_ivf_cent_", "graft_ivf_post_", "graft_pq_code_")
            .exists(p => n.startsWith(p) && n != s"$p$tag"))
        .foreach(OperatorQueries.dropManagedTable(s, _))
      OperatorQueries.dropManagedTable(s, centT)
      OperatorQueries.dropManagedTable(s, postT)
      OperatorQueries.dropManagedTable(s, codeT)
      val all = vecs(s, dir)
      val nVec = cachedRowCount(s, dir, "embeddings")
      val seedMod = math.max(50L, math.floor(math.sqrt(nVec.toDouble)).toLong)
      val cent = all
        .filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      cent.coalesce(1).write.mode("overwrite").saveAsTable(centT)
      // nearest-centroid assignment — the identical single-pass argmax
      // ivfTopK plans (broadcast centroids, max over (cos, -cid) structs)
      val asg = all
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("cid")).as("negcid"))).as("m"))
        .select(col("vec_id"), (-col("m.negcid")).as("cid"))
      all
        .join(asg, "vec_id")
        .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").saveAsTable(postT)
      // PQ codebook — the identical 8×16 subspace codewords pqRanked
      // derives in-flight (K evenly-spaced sample vectors sliced into
      // M 8-dim codewords); 128 tiny rows, one file
      val cbMod = math.max(1L, nVec / 16)
      all
        .filter(col("vec_id") % cbMod === 0 && col("vec_id") < 16 * cbMod)
        .select(floor(col("vec_id") / cbMod).cast("long").as("j"), col("v"))
        .select(col("j"), explode(expr("sequence(0, 7)")).as("m"), col("v"))
        .select(col("j"), col("m"), expr("slice(v, m * 8 + 1, 8)").as("cv"))
        .withColumn("cc", expr(dotSpark("cv", "cv")))
        .coalesce(1).write.mode("overwrite").saveAsTable(codeT)
    }
    (centT, postT, codeT)
  }

  private lazy val indexStore: Map[String, Fn] = Map[String, Fn](
    // INDEX BUILD as a first-class operation: persist centroids +
    // cid-partitioned postings, then report the build audit row a real
    // index pipeline logs — everything below is computed from the
    // PERSISTED tables (read-back, not the in-flight frames), so a
    // write-path bug cannot hide. Scale: the build is one broadcast-
    // centroid argmax pass + one hash(cid) exchange for the write; the
    // audit is one groupBy over the postings. The DuckDB mirror replays
    // the full n×k assignment — deliberately exact, the same
    // timeout-class-at-sf10 family as e_ivf_topk's mirror.
    "e_index_build" -> ((s, dir) => {
      val (centT, postT, codeT) = ivfIndexTables(s, dir, rebuild = true)
      val cells = s.table(postT)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("sz"), sum(col("vec_id")).as("vsum"))
      cells
        .agg(
          count(lit(1)).as("n_cells"),
          sum(col("sz")).as("n_vectors"),
          min(col("sz")).as("min_cell"),
          max(col("sz")).as("max_cell"),
          // binds cell → size and cell → members (mod keeps any corpus
          // size far from BIGINT overflow)
          sum(expr("(cid % 1000003) * (sz % 1000003)")).as("cell_checksum"),
          sum(col("vsum")).as("member_checksum")
        )
        .crossJoin(broadcast(
          s.table(centT).agg(
            count(lit(1)).as("n_centroids"),
            sum(col("cid")).as("centroid_checksum"))
        ))
        .crossJoin(broadcast(
          // codeword norms are the same fixed-order vec_dot doubles the
          // mirror computes, so the e6-quantized sum is engine-exact
          s.table(codeT).agg(
            count(lit(1)).as("n_codewords"),
            sum(expr("CAST(round(cc * 1000000) AS BIGINT)")).as("codebook_checksum_e6"))
        ))
        .select(
          col("n_centroids"), col("centroid_checksum"), col("n_cells"),
          col("n_vectors"), col("min_cell"), col("max_cell"),
          col("cell_checksum"), col("member_checksum"),
          col("n_codewords"), col("codebook_checksum_e6"))
    }),

    // SEARCH FROM THE STORED INDEX: reuse the persisted tables when the
    // fingerprint matches (build-on-miss keeps the query self-contained),
    // probe the 2 nearest centroids per query against the TINY centroid
    // table, then read candidates from the cid-partitioned postings —
    // the probe side arrives as a broadcast, so the scan is pruned to
    // the probed cells (nprobe/k of the corpus) instead of re-deriving
    // the assignment. Semantics are exactly e_ivf_topk's (same centroid
    // seed, same argmax assignment persisted, same exact re-rank), so
    // the oracle is the same mirror — what this row adds is the
    // round-trip through the stored artifact. At 100 TB the build
    // amortizes over every subsequent search; this pair prices both
    // halves separately where e_ivf_topk pays build+search per call.
    "e_index_search" -> ((s, dir) => {
      val (centT, postT, _) = ivfIndexTables(s, dir, rebuild = false)
      val cent = s.table(centT)
      val qv = vecs(s, dir)
        .filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cid"))
      val probes = qv
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("query_id"), col("cid"))
      val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
      s.table(postT)
        .join(broadcast(probes), Seq("cid"))
        .select(
          col("query_id"),
          col("vec_id").as("neighbor_id"), col("v").as("cv"), col("nrm").as("cn"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("cos", cosCol)
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 5)
        .select(
          col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // INCREMENTAL INDEX MAINTENANCE (VERDICT r9 #4 — the ANN twin of
    // d_incremental_dedup's batch-vs-corpus discipline): a daily-append
    // pipeline must NOT rebuild the index per batch. This query owns a
    // separate base index (86% of the corpus, `vec_id % 7 <> 3`; its own
    // graft_inc_* tables so it can never contaminate e_index_search's
    // store), then (1) assigns the held-out batch to the STORED centroids
    // — a broadcast-centroid argmax whose scan touches ONLY the batch,
    // never the corpus (IndexAppendSpec asserts base postings files are
    // byte-identical across the append), (2) APPENDS the assignments into
    // the cid-partitioned postings (new files inside existing partition
    // dirs — not a rewrite), and (3) reports per-cell drift between the
    // stored centroid and the incoming batch's mean, in the exact
    // fixed-point arithmetic of e_centroid_drift, against the re-seed
    // threshold — the signal that a cell has drifted enough that serving
    // it from the old centroid degrades recall and a re-seed
    // (e_index_build) is due. Ingest-once: if the batch generation is
    // already present the append is skipped (re-running must not
    // duplicate) — at 100 TB that check reads the ingestion manifest;
    // here it is an existence probe on the batch id range. Scale: batch
    // argmax is |batch|×k with k tiny and broadcast; the report is one
    // groupBy over postings; output is O(cells-touched) ≤ O(√n) — index
    // metadata scale, not corpus scale.
    "e_index_append" -> ((s, dir) => {
      val (centT, postT) = ensureIncAppended(s, dir)
      incCellDrift(s, centT, postT)
        .select(
          col("cid"), col("n_base"), col("n_batch"), col("l1_drift_q"),
          (col("l1_drift_q") > lit(DriftReseedThresholdQ)).as("needs_reseed"))
        .orderBy("cid")
    }),

    // RE-SEED PLAN — the action `e_index_append`'s drift flag calls for,
    // closing the maintenance loop (build → append → drift → re-seed):
    // for the TOP-5 highest-drift cells (budgeted worst-first, so the
    // plan is scale-stable where a fixed threshold flags nothing on a
    // large well-mixed corpus), split the cell along its diameter —
    // KEEP the stored centroid as sub-seed A and ADD the member farthest
    // from it (min cosine, tie-broken on vec_id) as sub-seed B — then
    // re-assign ONLY that cell's members to the nearer sub-seed. Since
    // sub-seed A IS the old centroid, every member's chosen cosine is
    // ≥ its old one, so new_cos_e6_sum − old_cos_e6_sum is the exact
    // measured fit gain of the split (asserted ≥ 0 in IndexAppendSpec).
    // Scale: drift is a postings groupBy; top-5 is a TakeOrdered over
    // O(√n) cells; members of 5 cells enter via a broadcast semi-join
    // (partition-pruned read at scale); everything downstream is
    // O(members-of-5-cells). Like o_compaction_plan / o_vacuum_plan this
    // emits the maintenance PLAN — applying it is a partition rewrite of
    // exactly 5 cid dirs.
    "e_index_reseed" -> ((s, dir) => {
      val (centT, postT) = ensureIncAppended(s, dir)
      val p = reseedParts(s, centT, postT)
      reseedPlanAgg(p)
        .select(
          col("cid"), col("l1_drift_q"), col("n_members"), col("seed_b"),
          col("n_a"), col("n_b"), col("asg_checksum"),
          col("old_cos_e6_sum"), col("new_cos_e6_sum"))
        .orderBy(col("l1_drift_q").desc, col("cid"))
    }),

    // RE-SEED APPLY — the final link of the maintenance loop (VERDICT
    // r10 #2: build → append → drift → re-seed plan → APPLY → serve).
    // [[ensureReseedApplied]] executes the plan as a real partition
    // rewrite against a serving copy of the store: exactly the 5 planned
    // cid dirs are overwritten with their A-members and ≤5 new seed-B
    // dirs appear (dynamic partition overwrite; ReseedApplySpec asserts
    // no other partition's files change), and the centroid table gains
    // the 5 sub-seed-B rows. This query then reports, per split cell,
    // the REALIZED outcome read back from the rewritten store — serving
    // cell sizes n_a/n_b, the membership checksum, and the realized
    // post-apply cosine-fit sum — next to the plan's predicted values
    // (recomputed from the immutable base store). realized == planned
    // holds by construction on a correct write path, so any divergence
    // (a lost member, a wrong partition, a corrupted vector) breaks the
    // hash against the mirror, which derives both from scratch. Scale:
    // the plan is index-metadata scale (O(√n) cells), the rewrite and
    // read-back touch only members-of-5-cells via broadcast semi-joins
    // into the cid-partitioned store (partition-pruned at 100 TB).
    "e_index_reseed_apply" -> ((s, dir) => {
      val (centT, postT) = ensureIncAppended(s, dir)
      val (rsdCentT, rsdPostT) = ensureReseedApplied(s, dir)
      val p = reseedParts(s, centT, postT)
      val plan = reseedPlanAgg(p)
      // read-back: each split cell serves from two cells now — A kept
      // the old cid, B lives at cid = seed_b (disjoint across cells:
      // sub-seed B is a member of its cell). The degenerate single-
      // member cell (seed_b == cid) serves from A alone.
      val cellMap = plan.select(col("cid").as("cell"), col("cid").as("pair"),
          lit(true).as("is_a"))
        .union(plan.filter(col("seed_b") =!= col("cid"))
          .select(col("seed_b").as("cell"), col("cid").as("pair"),
            lit(false).as("is_a")))
      val served = s.table(rsdPostT)
        .join(broadcast(cellMap), col("cid") === col("cell"))
        .select(col("pair"), col("is_a"), col("vec_id"),
          col("v").as("qv"), col("nrm").as("qn"), col("cell"))
        .join(broadcast(s.table(rsdCentT)
          .select(col("cid").as("cell"), col("cv"), col("cn"))), Seq("cell"))
        .withColumn("cos", cosCol)
        .groupBy(col("pair"))
        .agg(
          sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"),
          sum((col("vec_id") % 1000000007L)
            * when(col("is_a"), 31L).otherwise(17L)).as("asg_checksum"),
          sum(expr("CAST(round(cos * 1000000) AS BIGINT)"))
            .as("realized_new_cos_e6_sum"))
      served
        .join(broadcast(plan.select(
          col("cid"), col("seed_b"), col("l1_drift_q"),
          col("old_cos_e6_sum"),
          col("new_cos_e6_sum").as("planned_new_cos_e6_sum"))),
          col("pair") === col("cid"))
        .select(
          col("cid"), col("seed_b"), col("l1_drift_q"),
          col("n_a"), col("n_b"), col("asg_checksum"),
          col("old_cos_e6_sum"), col("planned_new_cos_e6_sum"),
          col("realized_new_cos_e6_sum"),
          (col("realized_new_cos_e6_sum") - col("old_cos_e6_sum")).as("gain_e6"))
        .orderBy(col("cid"))
    })
  )

  /** Shared internals of the re-seed plan (e_index_reseed and its apply
    * path must compute the SPLIT from the same frames, or "realized ==
    * planned" would compare two different plans): top-5 drift cells,
    * sub-seed B per cell, and the per-member assignment frame.
    */
  private final case class ReseedParts(
      top: DataFrame, seedB: DataFrame, withB: DataFrame)

  private def reseedParts(
      s: SparkSession, centT: String, postT: String): ReseedParts = {
    val top = incCellDrift(s, centT, postT)
      .orderBy(col("l1_drift_q").desc, col("cid"))
      .limit(5)
      .select(col("cid"), col("l1_drift_q"))
    val members = s.table(postT)
      .join(broadcast(top.select(col("cid"))), Seq("cid"))
      .select(col("cid"), col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
    val withOld = members
      .join(broadcast(s.table(centT)), Seq("cid"))
      .withColumn("cos_old", cosCol)
      .select(col("cid"), col("vec_id"), col("qv"), col("qn"), col("cos_old"))
    // farthest member from the kept centroid = sub-seed B; its vector
    // rides the argmax struct (unique (cos, vec_id) per row, so the
    // trailing array fields never participate in the comparison)
    val seedB = withOld
      .groupBy(col("cid"))
      .agg(max(struct(
        (-col("cos_old")).as("nc"), (-col("vec_id")).as("nv"),
        col("qv").as("bv"), col("qn").as("bn"))).as("m"))
      .select(
        col("cid"), (-col("m.nv")).as("seed_b"),
        col("m.bv").as("bv"), col("m.bn").as("bn"))
    val withB = withOld
      .join(broadcast(seedB), Seq("cid"))
      .withColumn("cos_b", expr(s"${dotSpark("qv", "bv")} / (sqrt(qn) * sqrt(bn))"))
    ReseedParts(top, seedB, withB)
  }

  /** The plan aggregate over [[reseedParts]] — e_index_reseed's output
    * frame (unordered).
    */
  private def reseedPlanAgg(p: ReseedParts): DataFrame =
    p.withB
      .select(
        col("cid"), col("vec_id"),
        (col("cos_old") >= col("cos_b")).as("to_a"),
        col("cos_old"), col("cos_b"))
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(when(col("to_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("to_a"), 1L).otherwise(0L)).as("n_b"),
        sum((col("vec_id") % 1000000007L)
          * when(col("to_a"), 31L).otherwise(17L)).as("asg_checksum"),
        sum(expr("CAST(round(cos_old * 1000000) AS BIGINT)")).as("old_cos_e6_sum"),
        sum(expr(
          "CAST(round(CASE WHEN cos_old >= cos_b THEN cos_old ELSE cos_b END" +
            " * 1000000) AS BIGINT)")).as("new_cos_e6_sum")
      )
      .join(broadcast(p.seedB), Seq("cid"))
      .join(broadcast(p.top), Seq("cid"))

  /** Builds the base index if absent and appends the held-out batch once
    * (ingest-once: if batch-range vec_ids are already present the append
    * is a no-op — at 100 TB this check reads the ingestion manifest;
    * here it is an existence probe on the id range).
    */
  private def ensureIncAppended(s: SparkSession, dir: String): (String, String) = {
    val (centT, postT) = incIndexTables(s, dir)
    val hasBatch =
      !s.table(postT).filter(col("vec_id") >= IncBatchOffset).isEmpty
    if (!hasBatch) {
      val batch = vecs(s, dir)
        .filter(col("vec_id") % 7 === 3)
        .select((col("vec_id") + IncBatchOffset).as("vec_id"), col("v"), col("nrm"))
      val asg = batch
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(s.table(centT)))
        .withColumn("cos", cosCol)
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("cid")).as("negcid"))).as("m"))
        .select(col("vec_id"), (-col("m.negcid")).as("cid"))
      batch
        .join(asg, "vec_id")
        .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
        .repartition(col("cid"))
        .write.mode("append").partitionBy("cid").saveAsTable(postT)
    }
    (centT, postT)
  }

  /** Drops the incremental-index store (and its derived reseed serving
    * copy) for this corpus, forcing the next [[incIndexTables]] call to
    * rebuild from scratch — test hook for suites that assert properties
    * of a FRESH base build regardless of which suite touched the shared
    * store first in the JVM.
    */
  private[graft] def dropIncStore(s: SparkSession, dir: String): Unit = {
    val tag = OperatorQueries.sourceTag(s, s"$dir/embeddings.parquet")
    Seq("graft_inc_cent_", "graft_inc_post_", "graft_rsd_cent_", "graft_rsd_post_")
      .foreach(p => OperatorQueries.dropManagedTable(s, s"$p$tag"))
  }

  /** Executes the re-seed plan against a SERVING copy of the incremental
    * store, build-once per corpus fingerprint. The base graft_inc_*
    * tables stay immutable — they are what e_index_append/e_index_reseed
    * and every oracle replay read, and what keeps this whole query
    * family reproducible across runs — so the apply first clones the
    * postings into graft_rsd_post_* (standing in for the serving copy a
    * production deployment already has), then performs the actual
    * maintenance operation: a DYNAMIC partition overwrite that rewrites
    * exactly the 5 planned cid dirs with their A-members and writes the
    * ≤5 new seed-B dirs. The rewrite itself is O(members-of-5-cells) —
    * the clone is bookkeeping for oracle immutability, not part of the
    * operation's scale cost. The centroid serving table adds the seed-B
    * rows (sub-seed A IS the old centroid, so its row is unchanged).
    * Apply-once: the rsd centroid table is written LAST, so its
    * existence marks a completed apply.
    */
  private[graft] def ensureReseedApplied(
      s: SparkSession, dir: String): (String, String) = {
    val (centT, postT) = ensureIncAppended(s, dir)
    val tag = OperatorQueries.sourceTag(s, s"$dir/embeddings.parquet")
    val rsdCentT = s"graft_rsd_cent_$tag"
    val rsdPostT = s"graft_rsd_post_$tag"
    if (!s.catalog.tableExists(rsdCentT)) {
      // drop BOTH (catalog entry AND warehouse dir): in a fresh JVM the
      // in-memory catalog is empty but a previous session's dirs survive
      // on disk, and saveAsTable(overwrite) refuses an un-cataloged
      // location (LOCATION_ALREADY_EXISTS — caught by the r11 bench)
      OperatorQueries.dropManagedTable(s, rsdCentT)
      OperatorQueries.dropManagedTable(s, rsdPostT)
      // serving clone (same cid-partitioned layout as the base store)
      s.table(postT)
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").saveAsTable(rsdPostT)
      val p = reseedParts(s, centT, postT)
      val moved = p.withB.select(
        col("vec_id"), col("qv").as("v"), col("qn").as("nrm"),
        when(col("cos_old") >= col("cos_b"), col("cid"))
          .otherwise(col("seed_b")).as("cid"))
      val prevMode = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        // dynamic overwrite: only partitions receiving rows are replaced
        // — the 5 A dirs (kept cid) and the new B dirs (cid = seed_b);
        // every other cid dir's files are untouched (spec-asserted)
        moved
          .repartition(col("cid"))
          .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
          .write.mode("overwrite").insertInto(rsdPostT)
      finally prevMode match {
        case Some(m) => s.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.table(centT)
        .unionByName(p.seedB
          .filter(col("seed_b") =!= col("cid"))
          .select(col("seed_b").as("cid"), col("bv").as("cv"), col("bn").as("cn")))
        .coalesce(1)
        .write.mode("overwrite").saveAsTable(rsdCentT)
    }
    (rsdCentT, rsdPostT)
  }

  /** Per-cell drift of the appended batch vs the stored centroid, from
    * the PERSISTED tables (read-back, so an append-path bug cannot
    * hide): (cid, n_base, n_batch, l1_drift_q) for cells that received
    * batch rows — the fixed-point arithmetic of e_centroid_drift.
    */
  private def incCellDrift(
      s: SparkSession,
      centT: String,
      postT: String
  ): org.apache.spark.sql.DataFrame = {
    val posts = s.table(postT)
    val nBase = posts
      .filter(col("vec_id") < IncBatchOffset)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_base"))
    val batchDims = posts
      .filter(col("vec_id") >= IncBatchOffset)
      .select(
        col("cid"),
        expr(s"transform(v, x -> CAST(round(x * $QScale) AS BIGINT))").as("qvi"))
      .select(col("cid"), posexplode(col("qvi")).as(Seq("pos", "q")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("nb"))
    val centDims = s.table(centT)
      .select(
        col("cid"),
        expr(s"transform(cv, x -> CAST(round(x * $QScale) AS BIGINT))").as("qci"))
      .select(col("cid"), posexplode(col("qci")).as(Seq("pos", "cq")))
    batchDims
      .join(centDims, Seq("cid", "pos"))
      .withColumn("d_q", expr("abs(cq * nb - sq) div nb"))
      .groupBy(col("cid"))
      .agg(min(col("nb")).as("n_batch"), sum(col("d_q")).as("l1_drift_q"))
      .join(nBase, Seq("cid"))
  }

  /** Batch vec_ids live at +10M so base vs appended rows are separable by
    * id range (same id-offset provenance as [[nearCorpus]]'s planted
    * copies and d_incremental_dedup's synthetic batch).
    */
  private[graft] val IncBatchOffset = 10000000L

  /** Re-seed trigger for `e_index_append`'s per-cell drift: quantized L1
    * over 64 dims (×2^20 fixed point). Calibrated on the synthetic
    * corpus: at the driver's sf0.01 gate per-cell drift spans ~5.5-6.3M
    * (≈0.085-0.098 mean per-dim deviation), so 5.9M exercises BOTH flag
    * branches there; at sf1 cells hold ~18 batch members whose mean is
    * correspondingly tighter (4.2-5.5M — all under threshold), which is
    * the intended semantics: a flag fires on genuine batch-mean strays,
    * and bigger batches estimate the cell mean with less sampling noise.
    * The exact l1_drift_q value is oracle-verified per cell regardless
    * of the flag.
    */
  private[graft] val DriftReseedThresholdQ = 5900000L

  /** Base-split index tables for `e_index_append` (86% of the corpus —
    * `vec_id % 7 <> 3` — so the remaining 14% is the append batch):
    * same √n-seeding, broadcast-argmax assignment, and cid-PARTITIONED
    * postings layout as [[ivfIndexTables]], separate prefix so append
    * experiments never touch the tables e_index_search serves from.
    */
  private[graft] def incIndexTables(s: SparkSession, dir: String): (String, String) = {
    val tag = OperatorQueries.sourceTag(s, s"$dir/embeddings.parquet")
    val centT = s"graft_inc_cent_$tag"
    val postT = s"graft_inc_post_$tag"
    if (!s.catalog.tableExists(centT) || !s.catalog.tableExists(postT)) {
      s.catalog.listTables().collect()
        .map(_.name)
        .filter(n =>
          Seq("graft_inc_cent_", "graft_inc_post_")
            .exists(p => n.startsWith(p) && n != s"$p$tag"))
        .foreach(OperatorQueries.dropManagedTable(s, _))
      OperatorQueries.dropManagedTable(s, centT)
      OperatorQueries.dropManagedTable(s, postT)
      // the reseed serving store derives from these tables — drop every
      // rsd table (any tag) whenever the base store rebuilds, so a stale
      // apply can never serve against a fresh base
      s.catalog.listTables().collect()
        .map(_.name)
        .filter(n => n.startsWith("graft_rsd_cent_") || n.startsWith("graft_rsd_post_"))
        .foreach(OperatorQueries.dropManagedTable(s, _))
      val base = vecs(s, dir).filter(col("vec_id") % 7 =!= 3)
      // counted fresh on every (rare) build — a dir-keyed cache here went
      // stale when the corpus at the dir was regenerated in-session,
      // silently diverging seedMod from the mirror's sqrt(count(*))
      // (ADVICE r10); the count is one scan on a path that also writes
      // the full postings table, so caching saved nothing that matters
      val nBase = base.count()
      val seedMod = math.max(50L, math.floor(math.sqrt(nBase.toDouble)).toLong)
      val cent = base
        .filter(col("vec_id") % seedMod === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
      cent.coalesce(1).write.mode("overwrite").saveAsTable(centT)
      val asg = base
        .select(col("vec_id"), col("v").as("qv"), col("nrm").as("qn"))
        .crossJoin(broadcast(cent))
        .withColumn("cos", cosCol)
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), (-col("cid")).as("negcid"))).as("m"))
        .select(col("vec_id"), (-col("m.negcid")).as("cid"))
      base
        .join(asg, "vec_id")
        .select(col("vec_id"), col("v"), col("nrm"), col("cid"))
        .repartition(col("cid"))
        .write.mode("overwrite").partitionBy("cid").saveAsTable(postT)
    }
    (centT, postT)
  }

  /** Shared DuckDB CTE chain for the incremental-index mirrors: base
    * split → √n̄ base seeding → exact base/batch argmax assignments →
    * per-cell fixed-point batch drift (`dr`). Still exactly n×k dot
    * evaluations, but in the scalar-max + tie-back shape
    * ([[argmaxAsgDuck]]) that cleared sf10 in minutes where the window
    * form timed out.
    */
  private lazy val incIdxCtes: String =
    s"""$vecsCte,
       |base AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 7 <> 3),
       |cent AS MATERIALIZED (SELECT vec_id AS cid, v, nrm FROM base
       |         WHERE vec_id % (SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT))
       |                         FROM base) = 0),
       |${argmaxAsgDuck("basg", "base", "cent")},
       |nbase AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_base FROM basg GROUP BY cid),
       |batch AS (SELECT vec_id + $IncBatchOffset AS vec_id, v, nrm FROM n
       |          WHERE vec_id % 7 = 3),
       |${argmaxAsgDuck("gasg0", "batch", "cent")},
       |gasg AS (SELECT a.vec_id, a.cid, x.v FROM gasg0 a JOIN batch x USING (vec_id)),
       |bsum AS (SELECT cid, r.range - 1 AS pos,
       |           CAST(sum(CAST(round(v[r.range] * $QScale) AS BIGINT)) AS BIGINT) AS sq,
       |           count(*) AS nb
       |         FROM gasg CROSS JOIN range(1, 65) r GROUP BY 1, 2),
       |cd AS (SELECT cid, r.range - 1 AS pos,
       |         CAST(round(v[r.range] * $QScale) AS BIGINT) AS cq
       |       FROM cent CROSS JOIN range(1, 65) r),
       |d AS (SELECT b.cid, abs(cd.cq * b.nb - b.sq) // b.nb AS d_q, b.nb
       |      FROM bsum b JOIN cd ON cd.cid = b.cid AND cd.pos = b.pos),
       |dr AS (SELECT cid, CAST(min(nb) AS BIGINT) AS n_batch,
       |         CAST(sum(d_q) AS BIGINT) AS l1_drift_q FROM d GROUP BY cid)""".stripMargin

  val oracle: Map[String, String] = Map(
    "e_bruteforce_topk" ->
      s"""$vecsCte,
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM p)
         |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // 5 greedy MMR rounds unrolled as CTE pairs (s_r = the round's pick,
    // a_r = cumulative selected set); one ulp of score divergence would
    // pick a different document, so this doubles as the suite's
    // sharpest float-portability check.
    "e_mmr_diversify" ->
      s"""$vecsCte,
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS cv, c.nrm AS cn,
         |        ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |cand AS MATERIALIZED (SELECT query_id, neighbor_id, cv, cn, cos FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM p) WHERE rk <= 20),
         |pr AS MATERIALIZED (SELECT a.query_id, a.neighbor_id AS ida, b.neighbor_id AS idb,
         |         ${dotDuck("a.cv", "b.cv")} / (sqrt(a.cn) * sqrt(b.cn)) AS sim
         |       FROM cand a JOIN cand b
         |         ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
         |s1 AS MATERIALIZED (SELECT query_id, neighbor_id, 1 AS rank, score FROM (
         |  SELECT query_id, neighbor_id, 0.5 * cos - 0.5 * 0.0 AS score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY 0.5 * cos - 0.5 * 0.0 DESC, neighbor_id) AS rn
         |  FROM cand) WHERE rn = 1),
         |a1 AS (SELECT * FROM s1)
         |${mmrStepDuck(2)}
         |${mmrStepDuck(3)}
         |${mmrStepDuck(4)}
         |${mmrStepDuck(5)}
         |SELECT query_id, neighbor_id, rank, round(score, 6) AS score
         |FROM a5 ORDER BY query_id, rank""".stripMargin,
    "e_int8_quantized_topk" ->
      s"""$vecsCte,
         |qz AS (SELECT vec_id,
         |         [CAST(round(v[i] / sqrt(nrm) * 127) AS BIGINT) for i in range(1, len(v) + 1)] AS q
         |       FROM n),
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        ${dotDuck("q.q", "c.q").replace("CAST(0 AS DOUBLE)", "CAST(0 AS BIGINT)")} AS qdot
         |      FROM qz q JOIN qz c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |r AS (SELECT query_id, neighbor_id, qdot,
         |        row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) AS rank
         |      FROM p)
         |SELECT query_id, neighbor_id, CAST(qdot AS BIGINT) AS qdot, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // RRF: same two retrievers at top-20, integer 1e6 // (60 + rank)
    // scoring, absent ranks coalesced to 0.
    "e_rrf_fusion" ->
      s"""$vecsCte,
         |p1 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |r1 AS (SELECT * FROM (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS r_float
         |      FROM p1) WHERE r_float <= 20),
         |qz AS (SELECT vec_id,
         |         [CAST(round(v[i] / sqrt(nrm) * 127) AS BIGINT) for i in range(1, len(v) + 1)] AS q
         |       FROM n),
         |p2 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        ${dotDuck("q.q", "c.q").replace("CAST(0 AS DOUBLE)", "CAST(0 AS BIGINT)")} AS qdot
         |      FROM qz q JOIN qz c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |r2 AS (SELECT * FROM (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY qdot DESC, neighbor_id) AS r_int8
         |      FROM p2) WHERE r_int8 <= 20),
         |f AS (SELECT coalesce(a.query_id, b.query_id) AS query_id,
         |        coalesce(a.neighbor_id, b.neighbor_id) AS neighbor_id,
         |        a.r_float, b.r_int8
         |      FROM r1 a FULL JOIN r2 b
         |        ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id),
         |g AS (SELECT query_id, neighbor_id,
         |        CAST(coalesce(1000000 // (60 + r_float), 0)
         |           + coalesce(1000000 // (60 + r_int8), 0) AS BIGINT) AS rrf_e6,
         |        CAST(coalesce(r_float, 0) AS INT) AS rank_float,
         |        CAST(coalesce(r_int8, 0) AS INT) AS rank_int8
         |      FROM f),
         |rk AS (SELECT query_id, neighbor_id, rrf_e6,
         |        row_number() OVER (PARTITION BY query_id ORDER BY rrf_e6 DESC, neighbor_id) AS rank,
         |        rank_float, rank_int8
         |      FROM g)
         |SELECT query_id, neighbor_id, rrf_e6, CAST(rank AS INT) AS rank, rank_float, rank_int8
         |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // Simplified silhouette: top-2 centroid cosines per vector, identical
    // seed law and tie-break as the IVF assignment.
    "e_centroid_silhouette" ->
      s"""$vecsCte,
         |cent AS (SELECT vec_id AS cid, v, nrm FROM n
         |         WHERE vec_id % (SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT))
         |                         FROM embeddings) = 0),
         |p AS (SELECT x.vec_id, c.cid, ${cosSql("x.v", "c.v", "x.nrm", "c.nrm")} AS cos
         |      FROM n x CROSS JOIN cent c),
         |r AS (SELECT * FROM (SELECT vec_id, cid, cos,
         |        row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
         |      FROM p) WHERE rn <= 2),
         |t AS (SELECT vec_id,
         |        max(CASE WHEN rn = 1 THEN cid END) AS cid,
         |        max(CASE WHEN rn = 1 THEN cos END) AS c1,
         |        max(CASE WHEN rn = 2 THEN cos END) AS c2
         |      FROM r GROUP BY vec_id)
         |SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |       round(avg((c1 - c2) / (1 - c2)), 6) AS avg_silhouette
         |FROM t GROUP BY cid ORDER BY cid""".stripMargin,
    // Hard negatives: positives (cos ≥ 0.95) excluded, top-5 of the rest.
    "e_hard_negatives" ->
      s"""$nearCorpusCte,
         |sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |       FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |pos AS (SELECT query_id, count(*) AS n_pos FROM sc WHERE cos >= 0.95 GROUP BY 1),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM sc WHERE cos < 0.95)
         |SELECT r.query_id, r.neighbor_id, round(r.cos, 6) AS cosine,
         |       CAST(r.rank AS INT) AS rank,
         |       coalesce(pos.n_pos, 0) AS n_positives_excluded
         |FROM r LEFT JOIN pos ON pos.query_id = r.query_id
         |WHERE r.rank <= 5 ORDER BY r.query_id, r.rank""".stripMargin,
    // IVF cell-size distribution from the mirrored assignment CTE.
    "e_ivf_balance_stats" ->
      s"""$vecsCte,
         |$ivfScSql,
         |g AS (SELECT cid, count(*) AS sz FROM asg GROUP BY cid)
         |SELECT count(*) AS n_cells, CAST(sum(sz) AS BIGINT) AS n_assigned,
         |  min(sz) AS min_size, max(sz) AS max_size, round(avg(sz), 6) AS avg_size,
         |  round(max(sz) * count(*) / CAST(sum(sz) AS DOUBLE), 6) AS imbalance
         |FROM g""".stripMargin,
    // Two-stage matryoshka retrieval: prefix-cosine shortlist (top-50)
    // re-ranked by full cosine — both rankings mirrored exactly.
    "e_matryoshka_topk" ->
      s"""$vecsCte,
         |p0 AS (SELECT vec_id, v, nrm, v[1:16] AS pv FROM n),
         |p AS (SELECT vec_id, v, nrm, pv, ${dotDuck("pv", "pv")} AS pn FROM p0),
         |s1 AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         ${dotDuck("q.pv", "c.pv")} / (sqrt(q.pn) * sqrt(c.pn)) AS pcos
         |       FROM p q JOIN p c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |r1 AS (SELECT query_id, neighbor_id,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY pcos DESC, neighbor_id) AS prefix_rank
         |       FROM s1),
         |short AS (SELECT query_id, neighbor_id, prefix_rank FROM r1 WHERE prefix_rank <= 50),
         |s2 AS (SELECT short.query_id, short.neighbor_id, short.prefix_rank,
         |         ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |       FROM short
         |       JOIN p c ON c.vec_id = short.neighbor_id
         |       JOIN p q ON q.vec_id = short.query_id),
         |r2 AS (SELECT query_id, neighbor_id, cos, prefix_rank,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos DESC, neighbor_id) AS rank
         |       FROM s2)
         |SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
         |       CAST(prefix_rank AS INT) AS prefix_rank, CAST(rank AS INT) AS rank
         |FROM r2 WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "e_ivf_topk" ->
      s"""$vecsCte,
         |$ivfScSql,
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM sc)
         |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // The stored-index search is semantically e_ivf_topk (same seeded
    // centroids, same persisted argmax assignment, same exact re-rank) —
    // the mirror is the same CTE chain; what the engine side adds is the
    // round-trip through the persisted tables.
    "e_index_search" ->
      s"""$vecsCte,
         |$ivfScSql,
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM sc)
         |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    // Build audit over the full n×k assignment (exact; scalar-max +
    // tie-back shape — the r13 re-plan of the nxk mirror family).
    "e_index_build" ->
      s"""$vecsCte,
         |cent AS MATERIALIZED (SELECT vec_id AS cid, v, nrm FROM n
         |         WHERE vec_id % (SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT))
         |                         FROM embeddings) = 0),
         |${argmaxAsgDuck("asg", "n", "cent")},
         |cells AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz,
         |                 CAST(sum(vec_id) AS BIGINT) AS vsum
         |          FROM asg GROUP BY cid),
         |cb0 AS (SELECT CAST(floor(vec_id / (SELECT greatest(1, count(*) // 16) FROM embeddings)) AS BIGINT) AS j,
         |          r.range AS m, v[r.range * 8 + 1 : r.range * 8 + 8] AS cv
         |        FROM n CROSS JOIN range(0, 8) r
         |        WHERE vec_id % (SELECT greatest(1, count(*) // 16) FROM embeddings) = 0
         |          AND vec_id < 16 * (SELECT greatest(1, count(*) // 16) FROM embeddings)),
         |cb AS (SELECT j, m, ${dotDuck("cv", "cv")} AS cc FROM cb0)
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM cent) AS n_centroids,
         |  (SELECT CAST(sum(cid) AS BIGINT) FROM cent) AS centroid_checksum,
         |  CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(sz) AS BIGINT) AS n_vectors,
         |  min(sz) AS min_cell,
         |  max(sz) AS max_cell,
         |  CAST(sum((cid % 1000003) * (sz % 1000003)) AS BIGINT) AS cell_checksum,
         |  CAST(sum(vsum) AS BIGINT) AS member_checksum,
         |  (SELECT CAST(count(*) AS BIGINT) FROM cb) AS n_codewords,
         |  (SELECT CAST(sum(CAST(round(cc * 1000000) AS BIGINT)) AS BIGINT) FROM cb)
         |    AS codebook_checksum_e6
         |FROM cells""".stripMargin,
    // Replays the base-split build (86% of the corpus), the batch argmax
    // against those centroids, and the fixed-point drift — all exact, so
    // the mirror is the same n×k timeout-class family at sf10.
    "e_index_append" ->
      s"""$incIdxCtes
         |SELECT dr.cid, nbase.n_base, dr.n_batch, dr.l1_drift_q,
         |  dr.l1_drift_q > $DriftReseedThresholdQ AS needs_reseed
         |FROM dr JOIN nbase ON nbase.cid = dr.cid ORDER BY dr.cid""".stripMargin,
    // Same CTE chain, then the diameter split over the top-5 drift
    // cells: seed B = min-cosine member (ties on vec_id), members choose
    // the nearer of {old centroid, seed B} with >= to the kept centroid.
    "e_index_reseed" ->
      s"""$incIdxCtes,
         |mem AS (
         |  SELECT g.cid, b.vec_id, b.v, b.nrm
         |  FROM basg g JOIN base b ON b.vec_id = g.vec_id
         |  UNION ALL
         |  SELECT g.cid, t.vec_id, t.v, t.nrm
         |  FROM gasg g JOIN batch t ON t.vec_id = g.vec_id),
         |top5 AS (SELECT cid, l1_drift_q FROM dr
         |         ORDER BY l1_drift_q DESC, cid LIMIT 5),
         |mo AS (SELECT m.cid, m.vec_id, m.v, m.nrm,
         |         ${cosSql("m.v", "c.v", "m.nrm", "c.nrm")} AS cos_old
         |       FROM mem m JOIN top5 USING (cid) JOIN cent c ON c.cid = m.cid),
         |sb AS (SELECT cid, vec_id AS seed_b, v AS bv, nrm AS bn FROM mo
         |       QUALIFY row_number() OVER (PARTITION BY cid
         |         ORDER BY cos_old ASC, vec_id ASC) = 1),
         |wb AS (SELECT mo.cid, mo.vec_id, mo.cos_old,
         |         ${cosSql("mo.v", "sb.bv", "mo.nrm", "sb.bn")} AS cos_b
         |       FROM mo JOIN sb ON sb.cid = mo.cid),
         |ag AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_members,
         |        CAST(count(*) FILTER (cos_old >= cos_b) AS BIGINT) AS n_a,
         |        CAST(count(*) FILTER (cos_old < cos_b) AS BIGINT) AS n_b,
         |        CAST(sum((vec_id % 1000000007)
         |          * CASE WHEN cos_old >= cos_b THEN 31 ELSE 17 END) AS BIGINT)
         |          AS asg_checksum,
         |        CAST(sum(CAST(round(cos_old * 1000000) AS BIGINT)) AS BIGINT)
         |          AS old_cos_e6_sum,
         |        CAST(sum(CAST(round(CASE WHEN cos_old >= cos_b THEN cos_old
         |                                 ELSE cos_b END * 1000000) AS BIGINT)) AS BIGINT)
         |          AS new_cos_e6_sum
         |      FROM wb GROUP BY cid)
         |SELECT ag.cid, t.l1_drift_q, ag.n_members, sb.seed_b, ag.n_a, ag.n_b,
         |  ag.asg_checksum, ag.old_cos_e6_sum, ag.new_cos_e6_sum
         |FROM ag JOIN sb ON sb.cid = ag.cid JOIN top5 t ON t.cid = ag.cid
         |ORDER BY t.l1_drift_q DESC, ag.cid""".stripMargin,
    // Apply mirror: the engine reports realized values read back from
    // the rewritten serving store; the mirror derives the same split
    // from scratch (realized == planned on a correct write path, in both
    // engines' identical fixed-point arithmetic), so any engine-side
    // write/read-back divergence breaks the hash. Same n×k family.
    "e_index_reseed_apply" ->
      s"""$incIdxCtes,
         |mem AS (
         |  SELECT g.cid, b.vec_id, b.v, b.nrm
         |  FROM basg g JOIN base b ON b.vec_id = g.vec_id
         |  UNION ALL
         |  SELECT g.cid, t.vec_id, t.v, t.nrm
         |  FROM gasg g JOIN batch t ON t.vec_id = g.vec_id),
         |top5 AS (SELECT cid, l1_drift_q FROM dr
         |         ORDER BY l1_drift_q DESC, cid LIMIT 5),
         |mo AS (SELECT m.cid, m.vec_id, m.v, m.nrm,
         |         ${cosSql("m.v", "c.v", "m.nrm", "c.nrm")} AS cos_old
         |       FROM mem m JOIN top5 USING (cid) JOIN cent c ON c.cid = m.cid),
         |sb AS (SELECT cid, vec_id AS seed_b, v AS bv, nrm AS bn FROM mo
         |       QUALIFY row_number() OVER (PARTITION BY cid
         |         ORDER BY cos_old ASC, vec_id ASC) = 1),
         |wb AS (SELECT mo.cid, mo.vec_id, mo.cos_old,
         |         ${cosSql("mo.v", "sb.bv", "mo.nrm", "sb.bn")} AS cos_b
         |       FROM mo JOIN sb ON sb.cid = mo.cid),
         |ag AS (SELECT cid, CAST(count(*) FILTER (cos_old >= cos_b) AS BIGINT) AS n_a,
         |        CAST(count(*) FILTER (cos_old < cos_b) AS BIGINT) AS n_b,
         |        CAST(sum((vec_id % 1000000007)
         |          * CASE WHEN cos_old >= cos_b THEN 31 ELSE 17 END) AS BIGINT)
         |          AS asg_checksum,
         |        CAST(sum(CAST(round(cos_old * 1000000) AS BIGINT)) AS BIGINT)
         |          AS old_cos_e6_sum,
         |        CAST(sum(CAST(round(CASE WHEN cos_old >= cos_b THEN cos_old
         |                                 ELSE cos_b END * 1000000) AS BIGINT)) AS BIGINT)
         |          AS new_cos_e6_sum
         |      FROM wb GROUP BY cid)
         |SELECT ag.cid, sb.seed_b, t.l1_drift_q, ag.n_a, ag.n_b,
         |  ag.asg_checksum, ag.old_cos_e6_sum,
         |  ag.new_cos_e6_sum AS planned_new_cos_e6_sum,
         |  ag.new_cos_e6_sum AS realized_new_cos_e6_sum,
         |  ag.new_cos_e6_sum - ag.old_cos_e6_sum AS gain_e6
         |FROM ag JOIN sb ON sb.cid = ag.cid JOIN top5 t ON t.cid = ag.cid
         |ORDER BY ag.cid""".stripMargin,
    // Recall@10 of the IVF search vs the exact brute-force top-10 — both
    // paths mirrored above; hits counted over the (query, neighbor) pairs
    // the two rankings share.
    "e_ivf_recall_at_k" ->
      s"""$vecsCte,
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |rex AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM p),
         |$ivfScSql,
         |riv AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM sc)
         |SELECT e.query_id, count(i.query_id) AS hits,
         |       round(count(i.query_id) / 10.0, 6) AS recall
         |FROM (SELECT query_id, neighbor_id FROM rex WHERE rank <= 10) e
         |LEFT JOIN (SELECT query_id, neighbor_id FROM riv WHERE rank <= 10) i
         |  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,
    // Mirrors the 2 unrolled Lloyd iterations: quantized BIGINT sums make
    // every centroid coordinate bit-identical to Spark's regardless of
    // aggregation order, so assignments, probes, and the final top-5
    // cannot diverge on near-ties. The Lloyd steps fit on the SAME
    // modulus sample as Spark (`fit` CTE — ≥64 points/centroid); the
    // final assignment (af) runs over the full corpus, exactly once.
    "e_kmeans_ivf_topk" -> {
      // one Lloyd step as two CTEs: a<k> SAMPLE assignment against
      // c<k-1>, s<k> per-(cid, dim) integer mean over the sample,
      // c<k> reassembled centroid
      def step(k: Int): String = {
        val prev = s"c${k - 1}"
        s"""${argmaxAsgDuck(s"a$k", "fit", prev, xv = "qv", xn = "qn", cv = "cv", cn = "cn")},
           |s$k AS (SELECT a.cid, r.range - 1 AS pos,
           |         CAST(sum(x.qvi[r.range]) AS DOUBLE) / count(*) AS v
           |       FROM a$k a JOIN fit x ON x.vec_id = a.vec_id
           |            CROSS JOIN range(1, 65) r
           |       GROUP BY a.cid, r.range),
           |c$k AS MATERIALIZED (SELECT cid, cv, ${dotDuck("cv", "cv")} AS cn FROM (
           |       SELECT cid, list(v ORDER BY pos) AS cv FROM s$k GROUP BY cid))""".stripMargin
      }
      // MATERIALIZED on qn / fit / c<k> is load-bearing: the argmax
      // assignments reference each twice (max pass + tie-back) and the
      // c<k> chain is recursive — default inlining would re-derive the
      // whole Lloyd chain per reference (the pagerank/nsym mirror
      // lesson), where pinning keeps it at one execution each.
      s"""WITH q0 AS (SELECT vec_id,
         |    [CAST(round(CAST(x AS DOUBLE) * $QScale) AS BIGINT) for x in embedding] AS qvi
         |  FROM embeddings),
         |qv AS (SELECT vec_id, qvi, [CAST(x AS DOUBLE) for x in qvi] AS qv FROM q0),
         |qn AS MATERIALIZED (SELECT vec_id, qvi, qv, ${dotDuck("qv", "qv")} AS qn FROM qv),
         |fit AS MATERIALIZED (SELECT * FROM qn WHERE vec_id %
         |        (SELECT greatest(1, count(*) //
         |                (64 * greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT))))
         |         FROM embeddings) = 0),
         |c0 AS (SELECT vec_id AS cid, qv AS cv, qn AS cn FROM qn
         |       WHERE vec_id % (SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT))
         |                       FROM embeddings) = 0),
         |${(1 to KMeansIters).map(step).mkString(",\n")},
         |${argmaxAsgDuck("af", "qn", s"c$KMeansIters", xv = "qv", xn = "qn", cv = "cv", cn = "cn")},
         |probes AS (SELECT query_id, cid FROM (
         |  SELECT x.vec_id AS query_id, c.cid,
         |    row_number() OVER (PARTITION BY x.vec_id
         |      ORDER BY ${cosSql("x.qv", "c.cv", "x.qn", "c.cn")} DESC, c.cid) AS rn
         |  FROM qn x CROSS JOIN c$KMeansIters c WHERE x.vec_id < 10) WHERE rn <= 2),
         |cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
         |         FROM probes p JOIN af a ON p.cid = a.cid
         |         WHERE a.vec_id <> p.query_id),
         |e AS (SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, ${dotDuck("v", "v")} AS nrm FROM e),
         |sc AS (SELECT cand.query_id, cand.neighbor_id,
         |         ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |       FROM cand JOIN n q ON q.vec_id = cand.query_id
         |                 JOIN n c ON c.vec_id = cand.neighbor_id),
         |r AS (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM sc)
         |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },
    // Mirrors the PQ pipeline end-to-end: codebook slicing, argmin-L2
    // encoding (as the equivalent argmax 2·x·c − c·c with the identical
    // tie-break), and the m-ordered ADC score fold — every score is the
    // same IEEE double on both engines, so rankings cannot diverge.
    "e_pq_topk" ->
      s"""$pqCtes
         |SELECT query_id, neighbor_id, round(qscore, 6) AS qscore, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // PQ recall@10 vs the exact float ranking — both sides mirrored.
    "e_pq_recall_at_k" ->
      s"""$pqCtes,
         |pex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |          ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |        FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |rex AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |        FROM pex)
         |SELECT e.query_id, count(i.query_id) AS hits,
         |       round(count(i.query_id) / 10.0, 6) AS recall
         |FROM (SELECT query_id, neighbor_id FROM rex WHERE rank <= 10) e
         |LEFT JOIN (SELECT query_id, neighbor_id FROM r WHERE rank <= 10) i
         |  ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
         |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin,
    // Mirrors the deterministic √n-seed clustering, the top-2 soft cell
    // assignment, and the within-cell smaller-id neighbor rule exactly —
    // the oracle checks WHAT SemDeDup claims (within-cell dedup), so
    // assignment and exemplar tie-breaks must be bit-identical.
    "e_semantic_dedup" ->
      s"""$nearCorpusCte,
         |cent AS (SELECT vec_id AS cid, v, nrm FROM n WHERE vec_id %
         |  (SELECT greatest(50, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM n) = 0),
         |asg AS (SELECT vec_id, cid FROM (
         |  SELECT x.vec_id, c.cid,
         |    row_number() OVER (PARTITION BY x.vec_id
         |      ORDER BY ${cosSql("x.v", "c.v", "x.nrm", "c.nrm")} DESC, c.cid) AS rn
         |  FROM n x CROSS JOIN cent c) WHERE rn <= 2),
         |m AS (SELECT a.cid, n.vec_id, n.v, n.nrm
         |      FROM asg a JOIN n ON n.vec_id = a.vec_id),
         |p AS (SELECT DISTINCT b.vec_id, a.vec_id AS exemplar_id,
         |        ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} AS cos
         |      FROM m a JOIN m b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |      WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= 0.95),
         |r AS (SELECT vec_id, exemplar_id, cos,
         |        row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cos DESC, exemplar_id) AS rn
         |      FROM p)
         |SELECT vec_id AS dropped_id, exemplar_id, round(cos, 6) AS cosine
         |FROM r WHERE rn = 1 ORDER BY dropped_id""".stripMargin,
    // Exact ground truth — the LSH+verify path must reproduce it.
    "e_cosine_neardup_pairs" ->
      s"""$nearCorpusCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       round(${cosSql("a.v", "b.v", "a.nrm", "b.nrm")}, 6) AS cosine
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v", "a.nrm", "b.nrm")} >= 0.95
         |ORDER BY vec_a, vec_b""".stripMargin,
    // Two power-iteration steps mirrored CTE-for-CTE: same quantization,
    // same 2^26 shift, same max-renorm, same truncating division.
    "e_power_iteration_pc1" -> {
      def step(i: Int, prevX: String): String =
        s"""y$i AS (SELECT d.vec_id,
           |  CAST(sum(d.q * x.x_e6) AS BIGINT) // 67108864 AS yq
           |  FROM dims d JOIN $prevX x ON x.pos = d.pos GROUP BY 1),
           |w$i AS (SELECT d.pos, CAST(sum(y.yq * d.q) AS BIGINT) AS w
           |  FROM dims d JOIN y$i y ON y.vec_id = d.vec_id GROUP BY 1),
           |m$i AS (SELECT max(abs(w)) AS wmax FROM w$i),
           |x$i AS (SELECT pos,
           |  w // greatest(1, (SELECT wmax FROM m$i) // 1000000) AS x_e6 FROM w$i)""".stripMargin
      s"""WITH q0 AS (SELECT vec_id,
         |    [CAST(round(CAST(x AS DOUBLE) * $QScale) AS BIGINT) for x in embedding] AS qvi
         |  FROM embeddings),
         |dims AS (SELECT vec_id, r.range - 1 AS pos, qvi[r.range] AS q
         |         FROM q0 CROSS JOIN range(1, 65) r),
         |x0 AS (SELECT r.range - 1 AS pos, CAST(1000000 AS BIGINT) AS x_e6
         |       FROM range(1, 65) r),
         |${step(1, "x0")},
         |${step(2, "x1")}
         |SELECT CAST(pos AS INT) AS pos, CAST(x_e6 AS BIGINT) AS x_e6
         |FROM x2 ORDER BY pos""".stripMargin
    },
    // NDCG@10 of IVF vs exact — both rankings mirrored from the shared
    // CTEs; the discount table and all gains are e6 integers.
    "e_ndcg_at_k" -> {
      val duckDisc = "CASE a.rank " + DiscE6.zipWithIndex
        .map { case (d, i) => s"WHEN ${i + 1} THEN $d" }
        .mkString(" ") + " ELSE 0 END"
      s"""$vecsCte,
         |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |rex AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM p),
         |$ivfScSql,
         |riv AS (SELECT query_id, neighbor_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM sc),
         |j AS (SELECT a.query_id, a.rank, coalesce(11 - e.rank, 0) AS rel
         |      FROM (SELECT * FROM riv WHERE rank <= 10) a
         |      LEFT JOIN (SELECT * FROM rex WHERE rank <= 10) e
         |        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id),
         |g AS (SELECT query_id,
         |        CAST(sum(rel * ($duckDisc)) AS BIGINT) AS dcg_e6
         |      FROM j a GROUP BY query_id)
         |SELECT query_id, dcg_e6, CAST($IdcgE6 AS BIGINT) AS idcg_e6,
         |       (dcg_e6 * 1000000) // $IdcgE6 AS ndcg_e6
         |FROM g ORDER BY query_id""".stripMargin
    },
    // Centroid drift: identical quantization and integer-mean-free
    // cross-product formulation, dims via range(1, 65).
    "e_centroid_drift" ->
      s"""WITH q0 AS (SELECT vec_id, label,
         |    [CAST(round(CAST(x AS DOUBLE) * $QScale) AS BIGINT) for x in embedding] AS qvi
         |  FROM embeddings),
         |dims AS (SELECT label, CAST(vec_id % 2 = 0 AS INT) AS old_half,
         |           r.range - 1 AS pos, qvi[r.range] AS qv
         |         FROM q0 CROSS JOIN range(1, 65) r),
         |c AS (SELECT label, old_half, pos, CAST(sum(qv) AS BIGINT) AS sq, count(*) AS n
         |      FROM dims GROUP BY 1, 2, 3),
         |j AS (SELECT a.label, a.pos,
         |        abs(a.sq * b.n - b.sq * a.n) // (a.n * b.n) AS d_q,
         |        a.n AS n_old, b.n AS n_new
         |      FROM c a JOIN c b ON a.label = b.label AND a.pos = b.pos
         |        AND a.old_half = 1 AND b.old_half = 0)
         |SELECT label, min(n_old) AS n_old, min(n_new) AS n_new,
         |  CAST(sum(d_q) AS BIGINT) AS l1_drift_q, max(d_q) AS max_dim_drift_q
         |FROM j GROUP BY label ORDER BY label""".stripMargin,
    // codes as two 32-bit halves (bit 63 would overflow DuckDB's BIGINT
    // shift where Spark wraps — see the Spark-side scaladoc)
    "e_binary_topk" ->
      s"""$vecsCte,
         |codes AS (SELECT vec_id,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CASE WHEN v[j + 1] > CAST(0 AS DOUBLE) THEN (CAST(1 AS BIGINT) << j)
         |            ELSE CAST(0 AS BIGINT) END for j in range(0, 32)]),
         |      (a, b) -> a + b) AS lo,
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      [CASE WHEN v[j + 33] > CAST(0 AS DOUBLE) THEN (CAST(1 AS BIGINT) << j)
         |            ELSE CAST(0 AS BIGINT) END for j in range(0, 32)]),
         |      (a, b) -> a + b) AS hi
         |  FROM n),
         |ham AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    CAST(bit_count(xor(c.lo, q.lo)) + bit_count(xor(c.hi, q.hi)) AS INT) AS hamming
         |  FROM codes q JOIN codes c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
         |short AS (SELECT query_id, neighbor_id, hamming FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY hamming, neighbor_id) AS hr FROM ham) WHERE hr <= 50),
         |rr AS (SELECT s.query_id, s.neighbor_id, s.hamming,
         |    ${cosSql("q.v", "c.v", "q.nrm", "c.nrm")} AS cos
         |  FROM short s JOIN n c ON c.vec_id = s.neighbor_id
         |  JOIN n q ON q.vec_id = s.query_id),
         |r AS (SELECT query_id, neighbor_id, hamming, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM rr)
         |SELECT query_id, neighbor_id, hamming, round(cos, 6) AS cosine, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  )
}
