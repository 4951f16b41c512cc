package graft.sources

import graft.SparkSpec
import graft.sources.HttpIngest._
import org.apache.spark.sql.functions._

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** S1 connector contract: rate limit between requests, exponential
  * backoff on retry, circuit breaker open/half-open/reset, atomic
  * envelope landing readable by the batch/stream normalize path, and
  * the distributed fetchTable stage. Real HTTP against an in-process
  * `com.sun.net.httpserver` fixture (JDK stdlib).
  */
class HttpIngestSpec extends SparkSpec {

  private def withServer(routes: Map[String, () => (Int, String)])(
      body: Int => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress(0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
        val (code, resp) = handler()
        val bytes = resp.getBytes("UTF-8")
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try body(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def symbolBlock(sym: String, t0: Long): String =
    s"""{"symbol": "$sym", "resolution": "5",
        "candles": [[$t0, 100.0, 101.0, 99.0, 100.5, 1000]],
        "timestamp": "2025-10-08T04:00:00", "total_records": 1}"""

  test("fetch: success lands body with attempts=1; rate limiter sleeps BETWEEN calls only") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    withServer(Map("/a" -> (() => (200, """{"ok":1}""")))) { port =>
      val f = new HttpFetcher(rateLimitMs = 300L, sleeper = sleeps.append(_))
      val r1 = f.fetch(s"http://localhost:$port/a")
      val r2 = f.fetch(s"http://localhost:$port/a")
      assert(r1.status === 200 && r1.body === """{"ok":1}""" && r1.attempts === 1)
      assert(r2.attempts === 1)
      assert(sleeps.toSeq === Seq(300L)) // no sleep before the first call
    }
  }

  test("fetch: 500s retry with exponential backoff, then succeed; terminal failure keeps last error") {
    val calls = new AtomicInteger(0)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    withServer(Map(
      "/flaky" -> (() => if (calls.incrementAndGet() < 3) (500, "boom") else (200, """{"ok":1}""")),
      "/dead"  -> (() => (503, "down")))) { port =>
      val f = new HttpFetcher(
        rateLimitMs = 0L, maxAttempts = 3, backoffBaseMs = 1000L, sleeper = sleeps.append(_))
      val ok = f.fetch(s"http://localhost:$port/flaky")
      assert(ok.status === 200 && ok.attempts === 3)
      assert(sleeps.count(_ >= 1000L) === 2)
      assert(sleeps.filter(_ >= 1000L).toSeq === Seq(1000L, 2000L)) // 1·base, 2·base

      val dead = f.fetch(s"http://localhost:$port/dead")
      assert(dead.status === 0 && dead.attempts === 3)
      assert(dead.error.contains("HTTP 503"))
    }
  }

  test("fetch: HTTP 200 with a non-JSON body (captive portal / proxy page) is a FAILURE, not a landing") {
    withServer(Map("/portal" -> (() => (200, "<html>pay for wifi</html>")))) { port =>
      val f = new HttpFetcher(rateLimitMs = 0L, maxAttempts = 1, sleeper = _ => ())
      val r = f.fetch(s"http://localhost:$port/portal")
      assert(r.status === 0 && r.error.contains("non-JSON body"))
    }
  }

  test("circuit breaker: opens after threshold, rejects while OPEN, half-open probe resets on success") {
    var now = 0L
    val breaker = new CircuitBreaker(failureThreshold = 5, timeoutMs = 60000L, clock = () => now)
    val healthy = new AtomicInteger(0)
    withServer(Map(
      "/down" -> (() => (500, "x")),
      "/up"   -> (() => { healthy.incrementAndGet(); (200, "{}") }))) { port =>
      val f = new HttpFetcher(
        rateLimitMs = 0L, maxAttempts = 1, breaker = breaker, sleeper = _ => ())
      (1 to 5).foreach(_ => f.fetch(s"http://localhost:$port/down"))
      assert(breaker.state === "OPEN")
      // while OPEN, calls are rejected WITHOUT hitting the wire
      val rejected = f.fetch(s"http://localhost:$port/up")
      assert(rejected.error.contains("OPEN") && healthy.get() === 0)
      // past the timeout: HALF_OPEN probe goes through and resets
      now += 60001L
      assert(breaker.state === "HALF_OPEN")
      val probe = f.fetch(s"http://localhost:$port/up")
      assert(probe.status === 200 && healthy.get() === 1)
      assert(breaker.state === "CLOSED")
    }
  }

  test("ingestOnce lands ONE atomic envelope that the normalize path reads end-to-end") {
    val t0  = 1759895100L
    val tmp = java.nio.file.Files.createTempDirectory("graft-http").toString
    withServer(Map(
      "/sym/RELIANCE" -> (() => (200, symbolBlock("NSE:RELIANCE-EQ", t0))),
      "/sym/TCS"      -> (() => (200, symbolBlock("NSE:TCS-EQ", t0))),
      "/sym/FAIL"     -> (() => (500, "no")))) { port =>
      def url(s: String)  = s"http://localhost:$port/sym/$s"
      val symbolOf        = Map(
        url("RELIANCE") -> "NSE:RELIANCE-EQ", url("TCS") -> "NSE:TCS-EQ",
        url("FAIL") -> "NSE:FAIL-EQ")
      val f = new HttpFetcher(rateLimitMs = 0L, maxAttempts = 1, sleeper = _ => ())
      val results = HttpIngest.ingestOnce(
        Seq(url("RELIANCE"), url("TCS"), url("FAIL")), symbolOf, s"$tmp/land", f,
        nowIso = "2025-10-08T04:00:00Z")
      assert(results.count(_.error == null) === 2)

      // no temp files left behind; exactly one visible landing file
      val files = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/land"))
        .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (files.hasNext) names += files.next().getFileName.toString
      assert(names.size === 1 && !names.head.startsWith("."), names.mkString(","))

      // the landed envelope flows through the SAME normalize as batch
      val raw = graft.ohlcv.RawIngest.readRaw(spark, s"$tmp/land/*.json")
      val norm = graft.ohlcv.Normalize.normalize(
        graft.ohlcv.RawIngest.blocks(raw), processedAt = "p")
      val out = norm.select("symbol_clean", "timestamp_unix").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(out === Set(("RELIANCE", t0), ("TCS", t0)))
      // fetch-quality metadata preserved in the landed envelope text
      val landed = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/land"))
        .iterator().next()
      val txt = new String(java.nio.file.Files.readAllBytes(landed), "UTF-8")
      assert(txt.contains(""""successful_symbols": 2"""))
      assert(txt.contains(""""failed_symbols": ["NSE:FAIL-EQ"]"""))
    }
  }

  test("fetchTable: distributed fetch, one fetcher per partition, results stay partition-local") {
    val s = spark; import s.implicits._
    withServer(Map("/u" -> (() => (200, """{"b":1}""")))) { port =>
      val urls = (1 to 20).map(i => s"http://localhost:$port/u?i=$i").toDF("url").repartition(4)
      val out = HttpIngest.fetchTable(
        urls, "url", () => new HttpFetcher(rateLimitMs = 0L, sleeper = _ => ()))
      assert(out.count() === 20)
      assert(out.filter(col("status") === 200 && col("body") === """{"b":1}""").count() === 20)
      assert(out.rdd.getNumPartitions === 4) // no shuffle of fetched bodies
    }
  }
}
