package graft

import org.apache.spark.sql.functions._

import graft.etl.Normalize
import graft.sources.MockUserSource

/** The DataSource V2 connector must generate exactly the FIXTURES.md A2
  * rows (same as MockUserSource), partition-parallel.
  */
class RandomUserSourceSpec extends SparkSpecBase {

  test("format(\"randomuser\") equals MockUserSource row-for-row") {
    // n=150 crosses the 3-digit index boundary (VERDICT r3 #4)
    val dsv2 = Normalize.flattenForCsv(
      spark.read.format("randomuser").option("n", 150).load()
    )
    val builtin = Normalize.flattenForCsv(MockUserSource.users(spark, 150))
    assert(dsv2.count() == 150)
    assert(dsv2.exceptAll(builtin).isEmpty && builtin.exceptAll(dsv2).isEmpty)
  }

  test("phone pads without truncating for index >= 100 (randomuser.js:15)") {
    // String(index).padStart(2,'0'): 5 → "05", 42 → "42", 149 → "149"
    val phones = spark.read.format("randomuser").option("n", 150).load()
      .select(col("id.value").as("id"), col("phone"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(phones("mock-id-5") == "555-0101-05")
    assert(phones("mock-id-42") == "555-0101-42")
    assert(phones("mock-id-149") == "555-0101-149")
  }

  test("scan splits into the requested partitions") {
    val df = spark.read
      .format("randomuser")
      .option("n", 1000)
      .option("partitions", 8)
      .load()
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    assert(df.select(count_distinct(col("id.value"))).collect()(0).getLong(0) == 1000)
  }

  /** Loopback stub of the Random User API (VERDICT r4 "What's missing" #1):
    * the sandbox has no egress, so the SUCCESS branch of HttpUserSource.load
    * — status check, envelope validation, projection, fallbackUsed=false —
    * is exercised against a JDK HttpServer on 127.0.0.1.
    */
  private def withHttpServer(status: Int, body: String)(f: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(
      "/api",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    )
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api")
    finally server.stop(0)
  }

  private val cannedEnvelope =
    """{"results":[
      |  {"id":{"value":"u-1"},"login":{"uuid":"uu-1"},
      |   "name":{"first":"Ada","last":"Lovelace"},
      |   "email":"ada@example.com","phone":"555-1","location":
      |   {"country":"UK","city":"London"},
      |   "registered":{"date":"2001-01-01T00:00:00.000Z"},
      |   "picture":{"thumbnail":"https://example.com/1.jpg"}},
      |  {"id":{"value":null},"login":{"uuid":"uu-2"},
      |   "name":{"first":"Alan","last":"Turing"},
      |   "email":"alan@example.com","phone":"555-2","location":
      |   {"country":"UK","city":"Wilmslow"},
      |   "registered":{"date":"2002-02-02T00:00:00.000Z"},
      |   "picture":{"thumbnail":"https://example.com/2.jpg"}},
      |  {"id":{"value":"u-3"},"login":{"uuid":"uu-3"},
      |   "name":{"first":"Grace","last":"Hopper"},
      |   "email":"grace@example.com","phone":"555-3","location":
      |   {"country":"USA","city":"NYC"},
      |   "registered":{"date":"2003-03-03T00:00:00.000Z"},
      |   "picture":{"thumbnail":"https://example.com/3.jpg"}}
      |]}""".stripMargin

  test("live HTTP success path: status check, envelope validation, projection, no fallback") {
    withHttpServer(200, cannedEnvelope) { url =>
      val r = graft.sources.HttpUserSource.load(spark, Some(url))
      assert(!r.fallbackUsed)
      assert(r.sourceUrl == url)
      val rows = r.users
        .select(
          col("id.value").as("key"),
          col("name.first").as("first"),
          col("location.country").as("country")
        )
        .orderBy("first")
        .collect()
      assert(rows.length == 3)
      // P2 null-coalescing key: the null id.value falls back to login.uuid
      assert(rows.map(_.getString(0)).toSeq == Seq("u-1", "uu-2", "u-3"))
      assert(rows.map(_.getString(1)).toSeq == Seq("Ada", "Alan", "Grace"))
      assert(rows.map(_.getString(2)).toSeq == Seq("UK", "UK", "USA"))
    }
  }

  test("non-200 status falls back to the mock source with the flag set") {
    withHttpServer(500, "oops") { url =>
      val r = graft.sources.HttpUserSource.load(spark, Some(url))
      assert(r.fallbackUsed)
      assert(r.users.count() == 50) // the deterministic mock corpus
    }
  }

  test("200 with a malformed envelope (results not an array) falls back") {
    withHttpServer(200, """{"results": "not-an-array"}""") { url =>
      val r = graft.sources.HttpUserSource.load(spark, Some(url))
      assert(r.fallbackUsed)
      assert(r.users.count() == 50)
    }
  }
}
