package graft

import scala.util.Random

import graft.etl.{Clean, Metrics}
import graft.model.{User, UserId, UserLocation, UserName, UserPicture, UserRegistered}

/** Property-style invariants for the clean/metrics stage over randomized
  * dirty corpora (missing keys/emails, invalid dates, duplicate keys —
  * FIXTURES.md A4), across several fixed seeds.
  */
class CleanPropertySpec extends SparkSpecBase {

  private def genCorpus(seed: Long, n: Int): Seq[User] = {
    val rnd = new Random(seed)
    (0 until n).map { _ =>
      val key = if (rnd.nextInt(5) == 0) null else "id-" + rnd.nextInt(30)
      val email = if (rnd.nextInt(7) == 0) null else "a@b.c"
      val date = rnd.nextInt(4) match {
        case 0 => "not-a-date"
        case 1 => null
        case _ =>
          java.time.LocalDate
            .of(2020, 1, 1)
            .plusDays(rnd.nextInt(3650))
            .toString + "T00:00:00.000Z"
      }
      val country = Seq(null, "USA", "Canada")(rnd.nextInt(3))
      User(
        UserId(key),
        UserName("F", "L"),
        email,
        "555",
        UserLocation(country, "City"),
        UserRegistered(date),
        UserPicture("t")
      )
    }
  }

  test("rows_out + dedup_removed == rows_in for arbitrary dirty corpora") {
    val session = spark
    import session.implicits._
    for (seed <- 1L to 5L) {
      val users = genCorpus(seed, 60)
      val df = users.toDF()
      val m = Metrics.compute(df).collect()(0)
      val in = m.getAs[Long]("rows_in")
      val out = m.getAs[Long]("rows_out")
      val removed = m.getAs[Long]("dedup_removed")
      assert(in == users.length, s"seed $seed")
      assert(out + removed == in, s"seed $seed")
      assert(Clean(df).count() == out, s"seed $seed: agg vs operator path")
      assert(m.getAs[Long]("countries") <= in, s"seed $seed")
    }
  }

  test("avg is unaffected by invalid-date rows (F2 semantics)") {
    val session = spark
    import session.implicits._
    val valid = genCorpus(11L, 40).map(u =>
      u.copy(
        id = UserId("k-" + Random.nextInt()),
        registered = UserRegistered("2021-06-01T00:00:00.000Z")
      )
    )
    val polluted = valid ++ genCorpus(12L, 20).map(
      _.copy(registered = UserRegistered("garbage"))
    )
    val a = Metrics
      .buildMetrics(valid.toDF())
      .collect()(0)
      .getAs[Double]("avgRegistrationYears")
    val b = Metrics
      .buildMetrics(polluted.toDF())
      .collect()(0)
      .getAs[Double]("avgRegistrationYears")
    assert(a == b)
  }
}
