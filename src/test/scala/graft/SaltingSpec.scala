package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Salted-join semantics + skew-spreading evidence. */
class SaltingSpec extends SparkSpecBase {

  test("salted join returns exactly the unsalted join result on skewed data") {
    val session = spark
    import session.implicits._
    // 90% of fact rows share one hot key
    val fact = spark
      .range(10000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        col("id").as("payload")
      )
    val dim = (0L until 100L).map(k => (k, s"dim-$k")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum("payload")).collect()(0)
    val salted = Salting
      .saltedJoin(fact, dim, "k", col("payload"), nSalts = 8)
      .agg(count(lit(1)), sum("payload"))
      .collect()(0)
    assert(plain == salted)
  }

  test("salting spreads a hot key across all salt buckets") {
    val session = spark
    import session.implicits._
    val hot = spark.range(8000).select(lit(7L).as("k"), col("id").as("payload"))
    val dist = hot
      .withColumn("__salt", Salting.saltCol(col("payload"), 8))
      .groupBy("__salt")
      .count()
      .collect()
      .map(_.getLong(1))
    assert(dist.length == 8) // every bucket hit
    assert(dist.max < 8000 * 0.25) // no bucket holds the whole key
  }
}
