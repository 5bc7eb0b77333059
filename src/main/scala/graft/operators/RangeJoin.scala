package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join via bucketization — the keyless range join that
  * Spark plans as BroadcastNestedLoopJoin/CartesianProduct (quadratic,
  * fatal at 100 TB) when written as a theta join. The reference app has
  * nothing like it; this is scale-tier infrastructure for time-range
  * analytics (co-activity, downtime attribution, campaign overlap).
  *
  * Pattern (same as Databricks' range-join hints and the interval-join of
  * stream processors): chop the number line into fixed-width buckets,
  * replicate each interval into every bucket it touches
  * (`sequence(floor(s/w), floor(e/w))` + `explode`), equi-join on the
  * bucket id (a plain shuffle-hash/sort-merge join — linear, partitioned),
  * then keep only truly overlapping pairs.
  *
  * De-duplication is free: a pair overlapping across k shared buckets
  * would surface k times, so the join keeps only the CANONICAL bucket —
  * the bucket containing `greatest(lStart, rStart)` (the overlap's left
  * edge, which both sides replicate by construction). No distinct, no
  * second shuffle.
  *
  * Scale knobs: `bucketWidth` trades replication (width ≪ interval span →
  * many copies) against join fan-out (width ≫ span → many pairs per
  * bucket share no overlap). Set it near the median interval length.
  * Long-tailed interval lengths → cap replication by splitting outliers
  * (not needed for the registered workloads; documented here as the
  * 100 TB follow-up).
  */
object RangeJoin {

  /** `floor(x / w)` as a LONG bucket id, in exact integer arithmetic:
    * `(x - pmod(x, w)) div w`. The numerator is an exact multiple of `w`
    * (pmod is the non-negative remainder), so the integral divide is the
    * exact floor quotient for the FULL long range — unlike
    * `floor(x / w)` via double division, whose quotient ulp exceeds 1
    * once |x| ≳ 2^52 and can misbucket boundary values (ADVICE r4).
    */
  private def bucketOf(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Overlap join of two interval sets: returns all (left, right) row
    * pairs with `lStart <= rEnd && rStart <= lEnd` (closed intervals),
    * each pair exactly once. Bounds are epoch-scaled LONGs (microseconds,
    * seconds — any consistent unit).
    *
    * @param left        intervals with LONG columns `lStart`/`lEnd`
    * @param right       intervals with LONG columns `rStart`/`rEnd`
    * @param bucketWidth bucket size in the same unit as the bounds
    * @param extraCond   optional additional join predicate (e.g. key
    *                    equality or `l.u < r.u` anti-symmetry), applied
    *                    with the overlap predicate
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long,
      extraCond: Option[Column] = None
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(lStart), bucketWidth),
        bucketOf(col(lEnd), bucketWidth)))
    )
    val rb = right.withColumn(
      "__bucket",
      explode(sequence(bucketOf(col(rStart), bucketWidth),
        bucketOf(col(rEnd), bucketWidth)))
    )
    val overlap =
      lb(lStart) <= rb(rEnd) && rb(rStart) <= lb(lEnd) &&
        // canonical bucket: the one holding the overlap's left edge —
        // emits each overlapping pair from exactly one bucket
        lb("__bucket") === bucketOf(greatest(lb(lStart), rb(rStart)), bucketWidth)
    val cond = extraCond.fold(overlap)(overlap && _)
    lb.join(rb, lb("__bucket") === rb("__bucket") && cond)
      .drop("__bucket")
  }
}
