package graft.sources

import graft.ohlcv.{Normalize, OhlcvSchemas, RawIngest}

import graft.SparkSpec
import graft.sources.HttpIngest._
import org.apache.spark.sql.functions._

class HttpIngestSpec extends SparkSpec {

  /** Config with pacing recorded instead of slept and zero jitter —
    * the loop's timing contract becomes assertable data. */
  private def pacedCfg(slept: scala.collection.mutable.ArrayBuffer[Long]): IngestConfig =
    IngestConfig(sleep = ms => slept += ms, jitterMs = (_, _) => 0L)

  private def candle(ts: Long): Array[Double] =
    Array(ts.toDouble, 100.0, 101.0, 99.0, 100.5, 1000.0)

  test("circuit breaker: CLOSED → OPEN after threshold, fast-fails, HALF_OPEN probe, reset") {
    var now = 0L
    val cb = new CircuitBreaker(failureThreshold = 3, timeoutSeconds = 300, clock = () => now)
    assert(cb.state === "CLOSED")
    def boom(): Int = cb.call(throw new RuntimeException("down"))
    (1 to 2).foreach(_ => intercept[RuntimeException](boom()))
    assert(cb.state === "CLOSED") // below threshold
    intercept[RuntimeException](boom())
    assert(cb.state === "OPEN")
    // OPEN fast-fails WITHOUT invoking the body
    var touched = false
    intercept[HttpIngest.OpenCircuitException](cb.call { touched = true; 1 })
    assert(!touched)
    // after the cooldown the next call probes (HALF_OPEN) and a
    // success resets to CLOSED
    now = 301 * 1000L
    assert(cb.call(42) === 42)
    assert(cb.state === "CLOSED")
    // and after the reset, failures accumulate from zero again
    intercept[RuntimeException](boom())
    intercept[RuntimeException](boom())
    intercept[RuntimeException](boom())
    assert(cb.state === "OPEN")
  }

  test("fetchSymbol: transient errors back off 2^attempt seconds then succeed; attempt recorded") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky: Transport = _ => {
      calls += 1
      if (calls < 3) throw new RuntimeException("timeout")
      Some(Seq(candle(1000)))
    }
    val out = fetchSymbol(flaky, FetchRequest("NSE:TCS-EQ", "5", 0, 600), pacedCfg(slept))
    assert(out.attempt === 3 && out.error.isEmpty && out.candles.length === 1)
    assert(slept.toSeq === Seq(1000L, 2000L)) // 2^0, 2^1 seconds, zero jitter
  }

  test("fetchSymbol: clean no-data reply returns immediately without retry; exhausted retries rethrow") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val empty: Transport = _ => { calls += 1; None }
    val out = fetchSymbol(empty, FetchRequest("X", "5", 0, 1), pacedCfg(slept))
    assert(calls === 1 && out.candles.isEmpty && out.error.isEmpty && slept.isEmpty)

    val dead: Transport = _ => throw new RuntimeException("503")
    intercept[RuntimeException](fetchSymbol(dead, FetchRequest("X", "5", 0, 1), pacedCfg(slept)))
    assert(slept.toSeq === Seq(1000L, 2000L)) // 3 attempts = 2 backoffs
  }

  test("fetchAll: batch pacing, success-rate accounting, failed symbols, breaker trips mid-run") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    // batch delay 2500 ≠ the 1000/2000 ms retry backoffs, so the
    // recorded sleeps disambiguate pacing from backoff
    val cfg = pacedCfg(slept).copy(batchSize = 2, rateLimitMs = 500, batchDelayMs = 2500)
    // A,B ok; C,D,E permanently down → C,D,E each exhaust retries and
    // trip the threshold-3 breaker; F fast-fails on the OPEN circuit
    val transport: Transport = req =>
      if (Set("A", "B")(req.symbol)) Some(Seq(candle(req.rangeFromUnix)))
      else throw new RuntimeException(s"${req.symbol} down")
    val rep = fetchAll(Seq("A", "B", "C", "D", "E", "F"), 0, 600, transport, cfg)
    assert(rep.totalRequested === 6 && rep.successful === 2)
    assert(rep.successRatePercent === 33.33)
    assert(rep.failedSymbols === Seq("C", "D", "E", "F"))
    assert(rep.breakerState === "OPEN")
    // F never touched the transport: attempt 0 marks the fast-fail
    assert(rep.fetched.find(_.symbol == "F").get.attempt === 0)
    // pacing: 6 × 500 ms request gaps + 2 × 2500 ms inter-batch gaps
    // (C,D,E's retry backoffs land as 1000/2000 ms entries)
    assert(slept.count(_ == 500L) === 6 && slept.count(_ == 2500L) === 2)
  }

  test("envelope: report assembles into the rawEnvelope schema and normalizes end-to-end") {
    val s = spark
    val rep = FetchReport(
      fetched = Seq(
        SymbolFetch("NSE:TCS-EQ", Seq(candle(600), candle(900)), 1, None),
        SymbolFetch("NSE:INFY-EQ", Seq(candle(600)), 2, None),
        SymbolFetch("NSE:SBIN-EQ", Nil, 1, None)), // no data → omitted
      failedSymbols = Nil, totalRequested = 3, successful = 2,
      successRatePercent = 66.67, breakerState = "CLOSED")
    val env = HttpIngest.envelope(s, rep, "2024-01-02T09:30:00")
    // schema-compatible with the declared raw envelope contract
    // catalogString comparison: literal-built columns are non-null
    // where the file-read contract is nullable — same wire shape
    val declared = OhlcvSchemas.rawEnvelope.fields.map(f => f.name -> f.dataType.catalogString).toMap
    env.schema.fields.foreach(f => assert(declared(f.name) === f.dataType.catalogString, f.name))
    val row = env.collect()(0)
    assert(row.getMap[String, Any](0).keySet === Set("NSE:TCS-EQ", "NSE:INFY-EQ"))
    // and the standard normalize path consumes it unchanged
    val norm = Normalize.normalize(RawIngest.blocks(env.withColumn("source_file", lit("mem"))), "2024-01-02T09:31:00")
    assert(norm.count() === 3)
    assert(norm.select("symbol_clean").distinct().collect().map(_.getString(0)).toSet
      === Set("TCS", "INFY"))
  }

  test("ingestTick: lands one raw JSON doc readable by batch AND stream scans; all-failed tick lands nothing") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("ingest_raw").toString
    val transport: Transport = req => Some(Seq(candle(300), candle(600)))
    val cfg = IngestConfig(sleep = _ => (), jitterMs = (_, _) => 0L)
    val rep = ingestTick(s, Seq("NSE:TCS-EQ", "NSE:WIPRO-EQ"), 0, 600, transport,
      dir, "2024-01-02T09:35:00", cfg)
    assert(rep.successful === 2)
    val raw = RawIngest.readRaw(s, dir)
    assert(RawIngest.blocks(raw).count() === 2)
    // a tick where every fetch fails must not land an empty envelope
    val deadRep = ingestTick(s, Seq("NSE:TCS-EQ"), 0, 600,
      _ => throw new RuntimeException("down"), dir, "2024-01-02T09:40:00", cfg)
    assert(deadRep.successful === 0)
    assert(RawIngest.blocks(RawIngest.readRaw(s, dir)).count() === 2) // unchanged
  }

  test("fetchDistributed: symbols fetched partition-parallel, per-partition breakers isolate failures") {
    val s = spark
    val syms = (1 to 20).map(i => s"NSE:S$i-EQ")
    val rows = fetchDistributed(
      s, syms, 0, 600,
      transportFactory = () => req =>
        if (req.symbol.stripPrefix("NSE:S").stripSuffix("-EQ").toInt % 5 == 0)
          throw new RuntimeException("down")
        else Some(Seq(Array(300.0, 1.0, 2.0, 0.5, 1.5, 10.0))),
      cfg = IngestConfig(sleep = _ => (), jitterMs = (_, _) => 0L),
      parallelism = 4)
    val got = rows.collect()
    assert(got.length === 20)
    val (ok, bad) = got.partition(_.isNullAt(3))
    assert(ok.length === 16 && bad.length === 4)
    assert(ok.forall(r => r.getSeq[Seq[Double]](1).nonEmpty))
  }

  test("httpTransport: live HTTP against an in-process server — candles, no-data, 5xx retry path") {
    // JDK-stdlib HttpServer on an ephemeral localhost port: the REAL
    // java.net.http transport end-to-end, zero egress
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/history", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val q = ex.getRequestURI.getRawQuery // raw: %-encoding preserved
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      val body =
        if (auth != "cid:token") """{"code":401,"message":"auth"}"""
        else if (q.contains("symbol=NSE%3ATCS-EQ"))
          """{"code":200,"candles":[[600,100.0,101.0,99.0,100.5,1000],[900,100.5,102.0,100.0,101.0,1200]]}"""
        else if (q.contains("FLAKY")) null // 503 below
        else """{"code":200,"candles":[]}"""
      if (body == null) {
        ex.sendResponseHeaders(503, -1); ex.close()
      } else {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val t = HttpIngest.httpTransport(base, authorization = Some("cid:token"))
      // real candles parsed from the wire
      val got = t(FetchRequest("NSE:TCS-EQ", "5", 0, 900))
      assert(got.get.map(_.toSeq) === Seq(
        Seq(600.0, 100.0, 101.0, 99.0, 100.5, 1000.0),
        Seq(900.0, 100.5, 102.0, 100.0, 101.0, 1200.0)))
      // clean empty reply → None, single request, no retry
      val before = hits.get()
      assert(t(FetchRequest("NSE:INFY-EQ", "5", 0, 900)).isEmpty)
      assert(hits.get() === before + 1)
      // 5xx throws → the retry loop hits the server exactly `attempts` times
      val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val b2 = hits.get()
      intercept[java.io.IOException](
        fetchSymbol(t, FetchRequest("FLAKY", "5", 0, 900), pacedCfg(slept)))
      assert(hits.get() === b2 + 3 && slept.size === 2)
      // app-level auth failure (HTTP 200, code 401) is no-data, not retry
      val tBad = HttpIngest.httpTransport(base, authorization = Some("wrong"))
      assert(tBad(FetchRequest("NSE:TCS-EQ", "5", 0, 900)).isEmpty)
    } finally server.stop(0)
  }

  test("httpTransportAuth: expired token → refresh → replay succeeds; 403 refreshes only once") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var valid = "cid:new" // the token the upstream accepts NOW
    server.createContext("/history", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      if (auth != valid) { ex.sendResponseHeaders(401, -1); ex.close() }
      else {
        val bytes = """{"code":200,"candles":[[600,1,2,0.5,1.5,10]]}""".getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val refreshes = new java.util.concurrent.atomic.AtomicInteger(0)
      val auth = new HttpIngest.TokenAuth("cid:old", () => {
        refreshes.incrementAndGet(); Some("cid:new")
      })
      val t = HttpIngest.httpTransportAuth(base, Some(auth))
      // expired token: 401 → refresh → transparent replay succeeds
      val got = t(FetchRequest("NSE:TCS-EQ", "5", 0, 900))
      assert(got.get.head.toSeq === Seq(600.0, 1.0, 2.0, 0.5, 1.5, 10.0))
      assert(refreshes.get() === 1 && hits.get() === 2 && auth.current === "cid:new")
      // token still valid: no further refresh, single request
      assert(t(FetchRequest("NSE:TCS-EQ", "5", 0, 900)).isDefined)
      assert(refreshes.get() === 1 && hits.get() === 3)
      // upstream rotates again: the NEXT 401 refreshes again (401 is
      // always treated as expiry, unlike 403)
      valid = "cid:new2"
      val auth2hits = hits.get()
      intercept[java.io.IOException](t(FetchRequest("NSE:TCS-EQ", "5", 0, 900)))
      assert(refreshes.get() === 2 && hits.get() === auth2hits + 2) // replayed with (stale) refresh result, still 401
      // 403 after a successful refresh is a REAL permission failure:
      // no refresh attempt, error surfaces directly
      assert(!auth.refreshFor(403))
      // static auth: 401 surfaces as IOException, no refresh machinery
      val tStatic = HttpIngest.httpTransport(base, authorization = Some("cid:stale"))
      intercept[java.io.IOException](tStatic(FetchRequest("NSE:TCS-EQ", "5", 0, 900)))
    } finally server.stop(0)
  }

  test("ingestStream: rate-source cron twin lands envelopes on trigger; restart resumes from checkpoint") {
    val s = spark
    val rawDir = java.nio.file.Files.createTempDirectory("ingest_stream_raw").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingest_stream_ckpt").toString
    val transport: Transport = req => Some(Seq(candle(req.rangeToUnix - 300), candle(req.rangeToUnix)))
    val cfg = IngestConfig(sleep = _ => (), jitterMs = (_, _) => 0L)
    val q = HttpIngest.ingestStream(s, Seq("NSE:TCS-EQ"), transport, rawDir, ckpt,
      cfg, windowSeconds = 600, triggerSeconds = 1, clock = () => 1704186000L)
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (RawIngest.readRaw(s, rawDir).isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
    } finally q.stop()
    val landed = RawIngest.blocks(RawIngest.readRaw(s, rawDir))
    assert(landed.count() >= 1)
    assert(landed.select("block.total_records").collect().forall(_.getLong(0) === 2L))
  }

  test("fetchTable: URL-corpus fetch stage — bytes out, per-row errors, partition-parallel") {
    val s = spark
    import s.implicits._
    val urls = (1 to 12).map(i => s"https://corpus.example/doc/$i").toDF("url")
    val out = HttpIngest.fetchTable(
      urls, "url",
      fetcherFactory = () => u =>
        if (u.endsWith("/7")) throw new RuntimeException("404")
        else s"body-of-$u".getBytes("UTF-8"),
      cfg = IngestConfig(sleep = _ => (), jitterMs = (_, _) => 0L))
    val rows = out.collect()
    assert(rows.length === 12)
    val bad = rows.filter(!_.isNullAt(2))
    assert(bad.map(_.getString(0)).toSeq === Seq("https://corpus.example/doc/7"))
    val ok = rows.filter(_.isNullAt(2))
    assert(ok.forall(r => new String(r.getAs[Array[Byte]](1), "UTF-8") == s"body-of-${r.getString(0)}"))
  }
}
