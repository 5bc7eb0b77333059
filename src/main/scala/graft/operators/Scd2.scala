package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type 2) interval construction from a
  * changelog: collapse consecutive rows with an unchanged state into
  * versions, each valid from its first row's timestamp until the NEXT
  * version's start (`valid_to` NULL for the open-ended current version).
  *
  * This is the standard build of a versioned dimension from CDC events.
  * Scale shape: one hash exchange on the key; the change-point filter and
  * the closing `lead()` share the same (key, order) window sort — Spark
  * plans a single Exchange with two Window/Sort passes over it, never a
  * second shuffle. Joining facts AT a point in time against the result is
  * `AsOfJoin.asOf` (valid_from as the as-of key) — the two operators
  * compose into temporal joins without interval explosion.
  *
  * Determinism: `orderCols` must be a TOTAL order within each key (e.g.
  * ts + a unique id tie-break) or lag/lead are partition-order dependent.
  */
object Scd2 {

  /** @param df        changelog rows
    * @param keyCols   dimension key (version streams are per key)
    * @param orderCols total order of changes within a key
    * @param stateCol  the tracked state; equal consecutive states collapse
    * @param tsCol     event-time column stamping validity boundaries
    * @return one row per version: key, state, valid_from, valid_to (NULL =
    *         current), plus any `carry` columns taken from the version's
    *         first row
    */
  def intervals(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      stateCol: String,
      tsCol: String,
      carry: Seq[String] = Seq.empty
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("__prev_state").isNull || col("__prev_state") =!= col(stateCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(
        (keyCols.map(col) :+ col(stateCol) :+
          col(tsCol).as("valid_from") :+ col("valid_to")) ++ carry.map(col): _*
      )
  }
}
