package graft
import java.util.concurrent.{Callable, FutureTask, TimeUnit, TimeoutException}

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints per-query JSON lines as they complete, then one summary line.
  *
  * The action is a noop-format write (not `.count()`): a bare count lets
  * Catalyst prune every projection, under-measuring real queries; the noop
  * sink executes the full physical plan including all column work, while
  * writing nothing (VERDICT.md r1 "What's wrong").
  *
  * Fail-open design (VERDICT.md r2 "What's wrong" #3): a bench that prints
  * its only output after all queries finish yields NOTHING on a driver
  * timeout. So each query's time is printed the moment it's measured
  * (`{"metric":"query",...}`), each query is bounded by a wall-clock cap
  * (SPARK_GRAFT_BENCH_CAP seconds, default 60 — on expiry the query's Spark
  * jobs are cancelled, -1 is recorded, and the run moves on), and reps
  * default to 1 (SPARK_GRAFT_BENCH_REPS=3 restores warm-up + median-of-3
  * for stable local measurements on this stall-prone host).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val capSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "60").toLong

    def measure(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // Job-group tag set in the worker thread (setJobGroup is thread-local)
      // so a cap expiry can cancel exactly this query's jobs.
      val task = new FutureTask(new Callable[Double] {
        def call(): Double = {
          spark.sparkContext.setJobGroup(name, s"bench $name", interruptOnCancel = true)
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          if (reps <= 1) once()
          else { once(); val ts = Seq.fill(reps)(once()).sorted; ts(ts.size / 2) }
        }
      })
      val th = new Thread(task, s"bench-$name"); th.setDaemon(true); th.start()
      try task.get(capSec * math.max(1, reps + (if (reps > 1) 1 else 0)), TimeUnit.SECONDS)
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          System.err.println(s"[bench] $name exceeded ${capSec}s cap, cancelled")
          -1.0
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = measure(name, fn)
      // One parseable line per query, flushed immediately: a driver that
      // times out the whole run still gets every completed measurement.
      println(f"""{"metric":"query","name":"$name","value":$sec%.3f,"unit":"sec"}""")
      Console.out.flush()
      name -> sec
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val ok = results.map(_._2).filter(_ >= 0)
    val failed = results.size - ok.size
    println(
      s"""{"metric":"total","value":${f"${ok.sum}%.3f"},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    )
    Console.out.flush()
    spark.stop()
  }
}
