package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for hot join keys: salt the fact side, replicate the
  * dimension side.
  *
  * A shuffle join hashes rows to partitions by key — one hot key (a few
  * percent of 100 TB on a single value) pins a whole partition to one
  * task. Salting splits each key into `nSalts` sub-keys: the fact side
  * gets a deterministic per-row salt, the dim side is exploded ×nSalts so
  * every (key, salt) pair still finds its match. Join semantics are
  * unchanged; the hot key's rows spread over nSalts tasks. (AQE's skew
  * split handles sort-merge skew adaptively; explicit salting also covers
  * hash aggregation and older planners, and bounds the worst case
  * deterministically.)
  */
object Salting {

  /** Deterministic per-row salt in [0, nSalts): hash of the whole row's
    * key + a discriminator column (any high-cardinality column works —
    * determinism keeps results reproducible, unlike rand()).
    */
  def saltCol(discriminator: Column, nSalts: Int): Column =
    pmod(xxhash64(discriminator), lit(nSalts.toLong))

  /** Inner-join `fact` with `dim` on `key`, salted `nSalts` ways.
    * `factDiscriminator` drives the fact-side salt assignment.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factDiscriminator: Column,
      nSalts: Int
  ): DataFrame = {
    val saltedFact =
      fact.withColumn("__salt", saltCol(factDiscriminator, nSalts))
    // BIGINT sequence directly — a cast around explode() is a nested
    // generator, which the analyzer rejects
    val saltedDim = dim.withColumn(
      "__salt",
      explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${nSalts - 1} AS BIGINT))"))
    )
    saltedFact
      .join(saltedDim, Seq(key, "__salt"))
      .drop("__salt")
  }
}
