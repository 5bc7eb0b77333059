package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row `(key, ts)`, attach the payload of the
  * most recent right row `(key, ts')` with `ts' <= ts` (inclusive — the
  * "last known value at time t" lookup of time-series analytics; the
  * reference app has nothing like it, and Spark has no native operator).
  *
  * Implementation is the UNION + WINDOW pattern, not a theta join:
  * tag right rows 0 and left rows 1, union them on (key, ts, tag), and
  * carry the right payload forward with `last(payload, ignoreNulls)` over
  * `(partitionBy key, orderBy ts, tag, rows unbounded preceding..current)`;
  * left rows then read the payload of the latest right row at-or-before
  * their timestamp (ties resolve right-before-left because 0 < 1).
  *
  * Scale: ONE shuffle of |left| + |right| rows on the key — state per key
  * is a single carried payload, and no candidate pairs are materialized.
  * The naive formulation (`l ⋈ r ON key ∧ ts' <= ts` then max-per-left-row)
  * explodes to Σ_k |l_k|·|r_k| intermediate rows — quadratic on hot keys,
  * fatal at 100 TB. The window's sort is per-key (Spark sorts within
  * partitions after the hash exchange), so skew behaves like any groupBy
  * and can reuse the same salting machinery if one key dominates.
  *
  * Determinism: if the right side can hold duplicate `(key, ts)` rows the
  * carried payload would be order-dependent; `asOf` therefore pre-reduces
  * the right side to one row per `(key, ts)` by `max(struct(payload))` —
  * "largest payload wins", stable across partitionings and engines (and
  * matching what a DuckDB ASOF JOIN oracle sees after the same reduction).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (payload source)
    * @param key       equi-join column present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param payload   columns of `right` to carry (returned as `asof_<name>`)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    // one right row per (key, ts): deterministic dup resolution
    val rightUnique = right
      .groupBy(col(key), col(rightTs).as("__ts"))
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(
        col(key) +: col("__ts") +:
          payload.map(p => col(s"__p.$p").as(s"__r_$p")): _*
      )

    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .select(
        (col(key) +: col("__ts") +: col("__tag") +:
          leftCols.filterNot(_ == key).map(col)) ++
          payload.map(p => lit(null).cast(rightUnique.schema(s"__r_$p").dataType).as(s"__r_$p")): _*
      )
    val taggedRight = rightUnique
      .withColumn("__tag", lit(0))
      .select(
        (col(key) +: col("__ts") +: col("__tag") +:
          leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
          payload.map(p => col(s"__r_$p")): _*
      )

    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) {
      case (df, p) => df.withColumn(s"asof_$p", last(col(s"__r_$p"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"asof_$p")): _*)
  }

  /** Convenience: also emit the matched right timestamp as `asof_ts`. */
  def asOfWithTs(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]
  ): DataFrame =
    asOf(
      left,
      right.withColumn("__rts", col(rightTs)),
      key,
      leftTs,
      rightTs,
      payload :+ "__rts"
    ).withColumnRenamed("asof___rts", "asof_ts")
}
