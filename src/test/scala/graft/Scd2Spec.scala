package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd2

/** Unit semantics of the SCD2 interval builder (`operators/Scd2`) on a
  * hand-built changelog — the driver oracle (`s_scd2_user_state`) checks
  * the aggregate view; this pins the interval rows themselves.
  */
class Scd2Spec extends SparkSpecBase {

  test("consecutive equal states collapse; versions chain valid_from -> valid_to") {
    import spark.implicits._
    val log = Seq(
      // key 1: A A B A  -> versions A[10,30) B[30,40) A[40,null)
      (1L, 10L, 1L, "A"),
      (1L, 20L, 2L, "A"),
      (1L, 30L, 3L, "B"),
      (1L, 40L, 4L, "A"),
      // key 2: single state -> one open-ended version
      (2L, 15L, 5L, "X")
    ).toDF("k", "ts", "id", "state")

    val out = Scd2
      .intervals(log, Seq("k"), Seq(col("ts"), col("id")), "state", "ts")
      .orderBy("k", "valid_from")
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))

    assert(out.toSeq == Seq(
      (1L, "A", 10L, 30L),
      (1L, "B", 30L, 40L),
      (1L, "A", 40L, -1L),
      (2L, "X", 15L, -1L)
    ))
  }

  test("ties in ts break deterministically on the id tie-break column") {
    import spark.implicits._
    // two state flips at the SAME timestamp: id order decides the chain
    val log = Seq(
      (1L, 10L, 1L, "A"),
      (1L, 10L, 2L, "B"),
      (1L, 10L, 3L, "C")
    ).toDF("k", "ts", "id", "state")
    val states = Scd2
      .intervals(log, Seq("k"), Seq(col("ts"), col("id")), "state", "ts")
      .orderBy("valid_from", "state")
      .select("state")
      .as[String]
      .collect()
      .toSeq
    assert(states == Seq("A", "B", "C"))
  }
}
