package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.ohlcv.{MockData, Normalize, RawIngest}
import org.apache.spark.sql.DataFrame

/** Live end-to-end test of the REST layer: JDK http client against the
  * in-process server, over a normalized mock-candle frame — the same
  * zero-egress pattern as HttpIngestSpec. */
class ApiServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val candles: DataFrame = {
    // two symbols × 10 five-minute candles starting 2025-10-08 03:45 UTC,
    // landed as raw JSON and re-read (blocks needs source_file)
    val tmp  = java.nio.file.Files.createTempDirectory("graft-apisrv").toString
    val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 10, 1759895100L)
    MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
    graft.ohlcv.Api.fromNormalized(
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw")), "spec")).cache()
  }

  private def get(server: ApiServer.Server, pathAndQuery: String): (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://127.0.0.1:${server.port}$pathAndQuery"))
        .GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def withServer(f: ApiServer.Server => Unit): Unit = {
    val server = ApiServer.start(
      () => candles,
      ApiServer.Config(clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")))
    try f(server)
    finally server.stop()
  }

  test("routes: /symbols, limit validation, 404 envelope") {
    withServer { s =>
      val (code, body) = get(s, "/symbols")
      assert(code === 200)
      val j = mapper.readTree(body)
      assert(j.get("count").asInt === 2)
      assert(j.get("symbols").get(0).asText === "NSE:RELIANCE-EQ")

      val (c2, b2) = get(s, "/symbols?limit=1")
      assert(c2 === 200 && mapper.readTree(b2).get("count").asInt === 1)

      val (c3, b3) = get(s, "/symbols?limit=nope")
      assert(c3 === 400 && mapper.readTree(b3).get("error").asText === "Invalid limit parameter")

      val (c4, b4) = get(s, "/nothing/here")
      assert(c4 === 404)
      assert(mapper.readTree(b4).get("available_endpoints").has("/ohlcv/{symbol}"))
    }
  }

  test("/ohlcv/{symbol}: bare symbol normalized, reference dict candles, limit, 404 on unknown") {
    withServer { s =>
      // bare lower-case symbol → NSE:TCS-EQ (reference normalize_symbol)
      val (code, body) = get(s, "/ohlcv/tcs")
      assert(code === 200)
      val j = mapper.readTree(body)
      assert(j.get("symbol").asText === "NSE:TCS-EQ")
      assert(j.get("count").asInt === 10)
      // dict-shaped candle with the reference's datetime field
      val c0 = j.get("data").get(0)
      assert(c0.isObject)
      assert(c0.get("timestamp").asLong === 1759895100L) // ascending from the first tick
      assert(c0.get("datetime").asText === "2025-10-08T03:45:00Z")
      assert(c0.has("open") && c0.has("high") && c0.has("low") && c0.has("close") && c0.has("volume"))
      // tail-limit: most recent 3, still ascending
      val j2 = mapper.readTree(get(s, "/ohlcv/tcs?limit=3")._2)
      assert(j2.get("count").asInt === 3)
      assert(j2.get("data").get(0).get("timestamp").asLong === 1759895100L + 7 * 300)
      // unknown symbol → reference 404 envelope
      val (c3, b3) = get(s, "/ohlcv/NOPE")
      assert(c3 === 404 && mapper.readTree(b3).get("error").asText === "No data found")
    }
  }

  test("/ohlcv interval resample + /alfaquantz period path and query styles agree") {
    withServer { s =>
      // 10 5-min candles → 15-min buckets: ceil boundaries give 4 buckets
      val j = mapper.readTree(get(s, "/ohlcv/tcs?interval=15m")._2)
      assert(j.get("count").asInt === 4)
      // limit applies AFTER resampling: most-recent 2 buckets, ascending
      val jl = mapper.readTree(get(s, "/ohlcv/tcs?interval=15m&limit=2")._2)
      assert(jl.get("count").asInt === 2)
      assert(jl.get("data").get(0).get("timestamp").asLong
        === j.get("data").get(2).get("timestamp").asLong)
      // alfaquantz path-style: comma triple, period 3m covers the data;
      // full reference key set, LIST-form candles
      val (ca, ba) = get(s, "/alfaquantz/price/get/tcs,15m,3m")
      assert(ca === 200)
      val ja = mapper.readTree(ba)
      assert(ja.get("symbol_requested").asText === "tcs")
      assert(ja.get("symbol_normalized").asText === "NSE:TCS-EQ")
      assert(ja.get("count").asInt === 4)
      assert(ja.get("to_date").asText === "2025-10-08")
      assert(ja.has("from_date") && ja.get("period").asText === "3m")
      assert(ja.get("candles").get(0).isArray && ja.get("candles").get(0).size === 6)
      // query-style returns the same candles
      val jq = mapper.readTree(get(s, "/alfaquantz/price/get?symbol=tcs&interval=15m&period=3m")._2)
      assert(jq.get("candles") === ja.get("candles"))
      // missing params → 400
      assert(get(s, "/alfaquantz/price/get")._1 === 400)
    }
  }

  test("CSV-backed provider serves identical answers (api_handler_csv.py parity)") {
    // the reference ships a CSV-reader twin of the API
    // (api/api_handler_csv.py) over the S7 partitioned CSV layout;
    // here the same server runs over Storage.writeCsv/readCsv and must
    // agree with the parquet-backed answers byte-for-byte
    val tmp = java.nio.file.Files.createTempDirectory("graft-apisrv-csv").toString
    val normalized = {
      val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 10, 1759895100L)
      MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw")), "spec")
    }
    graft.ohlcv.Storage.writeCsv(normalized, s"$tmp/csvtbl")
    val csvCandles = graft.ohlcv.Api.fromNormalized(
      graft.ohlcv.Storage.readCsv(spark, s"$tmp/csvtbl"))
    val server = ApiServer.start(
      () => csvCandles,
      ApiServer.Config(clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")))
    try {
      val fromCsv     = get(server, "/ohlcv/tcs?limit=3")._2
      val fromParquet = {
        val s2 = ApiServer.start(() => candles,
          ApiServer.Config(clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")))
        try get(s2, "/ohlcv/tcs?limit=3")._2 finally s2.stop()
      }
      assert(mapper.readTree(fromCsv) === mapper.readTree(fromParquet))
      assert(mapper.readTree(get(server, "/symbols")._2).get("count").asInt === 2)
    } finally server.stop()
  }

  test("startFromTable: partitioned-table serving agrees with the frame-backed server") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-apisrv-tbl").toString
    val normalized = {
      val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 10, 1759895100L)
      MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw")), "spec")
    }
    graft.ohlcv.Storage.writeParquet(normalized, s"$tmp/table", "overwrite")
    val clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")
    val tableSrv = ApiServer.startFromTable(spark, s"$tmp/table", ApiServer.Config(clock = clock))
    try withServer { frameSrv =>
      // /latest included: the table source answers from the newest day
      // partition only, which on this single-day fixture is the whole
      // history — envelope shape and values must agree with the frame
      // server exactly
      for (q <- Seq(
          "/ohlcv/tcs?from=2025-10-08&to=2025-10-08&limit=4",
          "/ohlcv/tcs?interval=15m",
          "/latest?symbols=tcs,reliance",
          "/historical?symbol=reliance&from=2025-10-08&to=2025-10-08",
          "/alfaquantz/price/get/tcs,15m,3m",
          // analytics: the table source runs the day-pruned rollups —
          // values must agree with the frame server exactly
          "/analytics?query_type=symbol_stats&symbol=TCS&date=2025-10-08",
          "/analytics?query_type=daily_summary&date=2025-10-08",
          "/analytics?query_type=date_range&symbol=TCS&start_date=2025-10-07&end_date=2025-10-09",
          "/analytics?query_type=top_movers&date=2025-10-08&limit=1")) {
        val (ct, bt) = get(tableSrv, q)
        val (cf, bf) = get(frameSrv, q)
        assert(ct === cf, q)
        assert(mapper.readTree(bt) === mapper.readTree(bf), s"table vs frame diverge on $q")
      }
    } finally tableSrv.stop()
  }

  test("table-backed /latest: garbage symbols answer 200 with no data; bare /latest lists newest-day symbols") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-apisrv-tbl2").toString
    val normalized = {
      val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 5, 1759895100L)
      MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw")), "spec")
    }
    graft.ohlcv.Storage.writeParquet(normalized, s"$tmp/table", "overwrite")
    val srv = ApiServer.startFromTable(spark, s"$tmp/table",
      ApiServer.Config(clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")))
    try {
      // a symbols value that cleans to "" or carries glob
      // metacharacters must answer like an unknown symbol (absent
      // from data -> count 0), never a thrown 500
      for (q <- Seq("/latest?symbols=", "/latest?symbols=FOO*", "/latest?symbols=%7Bbad%7D")) {
        val (code, body) = get(srv, q)
        assert(code === 200, s"$q -> $code: $body")
        assert(mapper.readTree(body).get("count").asInt === 0, q)
      }
      // bare /latest: default symbols come from the NEWEST day's
      // partitions (metadata-discovered), not a full-table distinct
      val (c, b) = get(srv, "/latest")
      assert(c === 200)
      val j = mapper.readTree(b)
      assert(j.get("count").asInt === 2)
      assert(j.get("data").has("NSE:RELIANCE-EQ") && j.get("data").has("NSE:TCS-EQ"))
    } finally srv.stop()
  }

  test("/analytics: the Lambda invoke surface — four query types, reference envelopes and error shapes") {
    withServer { s =>
      // symbol_stats (the default query_type): stats block + echo keys
      val (c1, b1) = get(s, "/analytics?query_type=symbol_stats&symbol=RELIANCE&date=2025-10-08")
      assert(c1 === 200)
      val j1 = mapper.readTree(b1)
      assert(j1.get("symbol").asText === "RELIANCE" && j1.get("date").asText === "2025-10-08")
      val st = j1.get("stats")
      assert(st.get("num_records").asLong === 10L)
      assert(math.abs(st.get("price_change").asDouble -
        (st.get("close").asDouble - st.get("open").asDouble)) < 1e-9)
      assert(st.has("avg_price") && st.has("volume") && st.has("price_change_pct"))
      // no data that day → the reference's 404 message
      val (c1b, b1b) = get(s, "/analytics?query_type=symbol_stats&symbol=RELIANCE&date=2025-10-09")
      assert(c1b === 404 && mapper.readTree(b1b).get("error").asText
        .contains("No data found for RELIANCE on 2025-10-09"))
      // missing params → 400
      assert(get(s, "/analytics?query_type=symbol_stats&symbol=RELIANCE")._1 === 400)

      // daily_summary: one row per symbol, desc by pct change
      val (c2, b2) = get(s, "/analytics?query_type=daily_summary&date=2025-10-08")
      assert(c2 === 200)
      val j2 = mapper.readTree(b2)
      assert(j2.get("total_symbols").asInt === 2)
      val sm = j2.get("summary")
      assert(sm.size === 2)
      assert(sm.get(0).get("price_change_pct").asDouble >=
        sm.get(1).get("price_change_pct").asDouble)
      assert(get(s, "/analytics?query_type=daily_summary")._1 === 400)
      // a POPULATED table on a day with no rows still answers 200 with
      // an empty summary (the reference's symbol prefixes exist; their
      // per-day reads just come back empty — lambda_analytics.py:235-249)
      val (c2e, b2e) = get(s, "/analytics?query_type=daily_summary&date=2025-10-09")
      assert(c2e === 200)
      val j2e = mapper.readTree(b2e)
      assert(j2e.get("total_symbols").asInt === 0 && j2e.get("summary").size === 0)

      // date_range: per-day rows ascending, the 31-day cap enforced
      val (c3, b3) = get(s,
        "/analytics?query_type=date_range&symbol=TCS&start_date=2025-10-07&end_date=2025-10-09")
      assert(c3 === 200)
      val j3 = mapper.readTree(b3)
      assert(j3.get("num_days").asInt === 1) // only the 8th has data
      assert(j3.get("data").get(0).get("date").asText === "2025-10-08")
      val (c3b, b3b) = get(s,
        "/analytics?query_type=date_range&symbol=TCS&start_date=2025-01-01&end_date=2025-03-01")
      assert(c3b === 400 &&
        mapper.readTree(b3b).get("error").asText === "Date range cannot exceed 31 days")

      // top_movers composes over daily_summary: gainers[0] is the
      // summary's first row, losers[0] its last
      val (c4, b4) = get(s, "/analytics?query_type=top_movers&date=2025-10-08&limit=1")
      assert(c4 === 200)
      val j4 = mapper.readTree(b4)
      assert(j4.get("gainers").size === 1 && j4.get("losers").size === 1)
      assert(j4.get("gainers").get(0).get("symbol").asText ===
        sm.get(0).get("symbol").asText)
      assert(j4.get("losers").get(0).get("symbol").asText ===
        sm.get(1).get("symbol").asText)
      assert(j4.get("gainers").get(0).has("close") && j4.get("gainers").get(0).has("volume"))

      // unknown query_type → the reference's 400 message
      val (c5, b5) = get(s, "/analytics?query_type=nope")
      assert(c5 === 400 &&
        mapper.readTree(b5).get("error").asText === "Unknown query_type: nope")
    }
  }

  test("daily_summary over a completely EMPTY source: the reference's 404 envelope, not a 200 with an empty array") {
    // lambda_analytics.py:213-224 — no symbol= prefixes listed at all
    // → 404 "No data found for <date>"
    val empty  = candles.limit(0)
    val server = ApiServer.start(
      () => empty,
      ApiServer.Config(clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")))
    try {
      val (c, b) = get(server, "/analytics?query_type=daily_summary&date=2025-10-08")
      assert(c === 404)
      assert(mapper.readTree(b).get("error").asText === "No data found for 2025-10-08")
    } finally server.stop()
  }

  test("concurrent requests: parallel Spark queries on the handler pool all answer correctly") {
    withServer { s =>
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val bodies = Await.result(
        Future.sequence(Seq.fill(8)(Future(get(s, "/ohlcv/tcs?limit=2")))), 120.seconds)
      bodies.foreach { case (code, body) =>
        assert(code === 200)
        assert(mapper.readTree(body).get("count").asInt === 2)
      }
    }
  }

  test("/latest and /historical (json + csv) envelopes") {
    withServer { s =>
      val j = mapper.readTree(get(s, "/latest?symbols=tcs")._2)
      assert(j.get("count").asInt === 1)
      // reference per-symbol shape: {symbol, latest_price,
      // total_candles, resolution, timestamp, last_candle}
      val last = j.get("data").get("NSE:TCS-EQ")
      assert(last.get("symbol").asText === "NSE:TCS-EQ")
      assert(last.get("total_candles").asLong === 10L)
      assert(last.get("resolution").asText === "5")
      assert(last.get("timestamp").asText === "2025-10-08T04:00:00Z") // envelope fetch ts
      val lc = last.get("last_candle")
      assert(lc.isArray && lc.size === 6)
      assert(lc.get(0).asLong === 1759895100L + 9 * 300)
      assert(last.get("latest_price").asDouble === lc.get(4).asDouble) // close of newest

      val jh = mapper.readTree(get(s, "/historical?symbol=tcs&from=2025-10-08&to=2025-10-08")._2)
      assert(jh.get("total_records").asInt === 10)
      assert(jh.get("from_date").asText === "2025-10-08")
      val sym = jh.get("data").get("NSE:TCS-EQ")
      assert(sym.get("symbol").asText === "NSE:TCS-EQ")
      assert(sym.get("count").asInt === 10)
      // dict candles with datetime, like /ohlcv
      assert(sym.get("candles").get(0).get("datetime").asText === "2025-10-08T03:45:00Z")
      // to/from omitted → explicit nulls, reference-style
      val jh2 = mapper.readTree(get(s, "/historical?symbol=tcs")._2)
      assert(jh2.get("from_date").isNull && jh2.get("to_date").isNull)

      val (cc, csv) = get(s, "/historical?symbol=tcs&format=csv")
      assert(cc === 200)
      val lines = csv.split("\n")
      assert(lines.head === "symbol,timestamp,datetime,open,high,low,close,volume")
      assert(lines.length === 11 && lines(1).startsWith("NSE:TCS-EQ,1759895100,2025-10-08T03:45:00Z,"))
    }
  }

  test("streaming-fed serving: a newly-landed file is visible on the NEXT request, no restart") {
    // The reference promises 15-minute freshness (api_config.json:119)
    // by re-listing S3 per request; here the chain is raw landing →
    // OhlcvStream upsertSink → partitioned table → startFromTable,
    // which re-reads the table path per request — so data landed after
    // the server started appears on the next GET.
    val tmp  = java.nio.file.Files.createTempDirectory("graft-apisrv-stream").toString
    val land = s"$tmp/land"; val table = s"$tmp/table"; val ckpt = s"$tmp/ckpt"
    def landFile(startTs: Long, sub: String): Unit = {
      val mock = MockData.candles(spark, Seq("NSE:TCS-EQ"), 3, startTs)
      MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$land/$sub")
    }
    def pump(): Unit = {
      val q = graft.streaming.OhlcvStream.upsertSink(
        graft.streaming.OhlcvStream.dedupedStream(
          graft.streaming.OhlcvStream.normalized(
            graft.streaming.OhlcvStream.readRawStream(spark, s"$land/*"), "stream"))
          .drop("event_time"),
        table, ckpt, partCols = Seq("day", "symbol_clean"), // serving layout: both filters prune
        keyCols = Seq("symbol_clean", "timestamp_unix"), version = "fetch_timestamp",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    landFile(1759895100L, "f1")
    pump()
    val server = ApiServer.startFromTable(
      spark, table,
      ApiServer.Config(clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")))
    try {
      assert(mapper.readTree(get(server, "/ohlcv/tcs")._2).get("count").asInt === 3)
      // new file lands AFTER the server started; the stream upserts it
      landFile(1759895100L + 3 * 300, "f2")
      pump()
      // next request sees the merged table — 6 candles, no restart
      val j = mapper.readTree(get(server, "/ohlcv/tcs")._2)
      assert(j.get("count").asInt === 6)
      val ts = (0 until 6).map(i => j.get("data").get(i).get("timestamp").asLong)
      assert(ts === (0 until 6).map(i => 1759895100L + i * 300))
    } finally server.stop()
  }

  test("null OHLCV fields degrade to JSON nulls, not a 500") {
    val s = spark; import s.implicits._
    val frame = Seq(
      ("NSE:NULLY-EQ", 1759895100L, Some(1.0), Some(2.0), Some(0.5), None: Option[Double], Some(10.0), "f1"),
      ("NSE:NULLY-EQ", 1759895400L, Some(1.1), Some(2.1), Some(0.6), Some(1.9), Some(11.0), "f1"),
      // a symbol whose EVERY close is null — its daily rollup's close
      // and derived columns are null end to end
      ("NSE:NULLZ-EQ", 1759895100L, Some(1.0), Some(2.0), Some(0.5), None: Option[Double], Some(10.0), "f1"))
      .toDF("symbol", "tsu", "open", "high", "low", "close", "volume", "fetch_timestamp")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds(
        org.apache.spark.sql.functions.col("tsu"))).drop("tsu")
    val server = ApiServer.start(
      () => frame,
      ApiServer.Config(clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z")))
    try {
      val (code, body) = get(server, "/ohlcv/nully")
      assert(code === 200)
      val j = mapper.readTree(body)
      assert(j.get("count").asInt === 2)
      assert(j.get("data").get(0).get("close").isNull) // null passes through
      assert(j.get("data").get(1).get("close").asDouble === 1.9)
      // /latest with a null close → latest_price null, still 200
      val (c2, b2) = get(server, "/latest?symbols=nully")
      assert(c2 === 200)
      assert(mapper.readTree(b2).get("data").get("NSE:NULLY-EQ").get("last_candle").get(0).asLong === 1759895400L)
      // /analytics over the same frame: NULLZ's every close is null,
      // so its rollup's close and derived columns are JSON nulls —
      // never a 500; NULLY's latest close (1.9) survives max_by
      val (c3, b3) = get(server,
        "/analytics?query_type=daily_summary&date=2025-10-08")
      assert(c3 === 200)
      val summary = mapper.readTree(b3).get("summary")
      val bySym = (0 until summary.size)
        .map(i => summary.get(i).get("symbol").asText -> summary.get(i)).toMap
      assert(bySym("NSE:NULLY-EQ").get("close").asDouble === 1.9)
      assert(bySym("NSE:NULLZ-EQ").get("close").isNull)
      assert(bySym("NSE:NULLZ-EQ").get("price_change_pct").isNull)
      val (c4, b4) = get(server,
        "/analytics?query_type=top_movers&date=2025-10-08&limit=2")
      assert(c4 === 200)
      val g = mapper.readTree(b4).get("gainers")
      assert(g.size === 2) // the null-pct row rides along as JSON null
      val (c5, b5) = get(server,
        "/analytics?query_type=symbol_stats&symbol=NSE:NULLZ-EQ&date=2025-10-08")
      assert(c5 === 200)
      assert(mapper.readTree(b5).get("stats").get("close").isNull)
    } finally server.stop()
  }

  test("/files inventory + /file/{key} detail: landed raw files listed newest-first with size/modified, detail parses the envelope") {
    val landDir = java.nio.file.Files.createTempDirectory("graft-files").toString
    val mock1 = MockData.candles(spark, Seq("NSE:TCS-EQ"), 3, 1759895100L)
    MockData.envelope(mock1, "2025-10-08T04:00:00Z").coalesce(1).write.json(s"$landDir/f1")
    Thread.sleep(1100) // distinct mtimes at FS resolution
    val mock2 = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 2, 1759898700L)
    MockData.envelope(mock2, "2025-10-08T05:00:00Z").coalesce(1).write.json(s"$landDir/f2")

    val server = ApiServer.start(
      () => candles,
      ApiServer.Config(
        clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z"),
        filesDir = Some(landDir)))
    try {
      val (code, body) = get(server, "/files")
      assert(code === 200)
      val j = mapper.readTree(body)
      assert(j.get("count").asInt === 2)
      val first = j.get("files").get(0)
      assert(first.get("key").asText.startsWith("f2/")) // newest first
      assert(first.get("size").asLong > 0L)
      assert(first.get("modified").asText.endsWith("Z"))
      assert(j.get("files").get(1).get("key").asText.startsWith("f1/"))

      val (cl, bl) = get(server, "/files?limit=1")
      assert(cl === 200 && mapper.readTree(bl).get("count").asInt === 1)

      // detail: both symbols parsed out of the newest envelope
      val key = first.get("key").asText
      val (cd, bd) = get(server, s"/file/$key")
      assert(cd === 200, bd)
      val d = mapper.readTree(bd)
      assert(d.get("key").asText === key)
      assert(d.get("metadata").get("total_symbols").asLong === 2L)
      val syms = (0 until d.get("symbols").size())
        .map(i => d.get("symbols").get(i).get("symbol").asText).sorted
      assert(syms === Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"))
      val c0 = d.get("symbols").get(0).get("candles").get(0)
      assert(c0.has("timestamp") && c0.has("datetime") && c0.has("open") && c0.has("volume"))

      // traversal rejected — dot-dot segments AND scheme-qualified
      // absolute URIs (Path(root, "file:/x") resolves to file:/x);
      // missing file is a clean 404
      assert(get(server, "/file/../etc/passwd")._1 === 400)
      assert(get(server, "/file/file:%2Fetc%2Fpasswd")._1 === 400)
      assert(get(server, "/file/f9/nope.json")._1 === 404)

      // server-side rails: an absurd ?limit= clamps instead of sizing
      // server memory (the response still answers with what exists)
      val (cBig, bBig) = get(server, "/files?limit=2000000000")
      assert(cBig === 200 && mapper.readTree(bBig).get("count").asInt === 2)
    } finally server.stop()
  }

  test("GET /dashboard: the HTML page carries the SAME numbers as the JSON endpoints (/latest table, /files inventory)") {
    val landDir = java.nio.file.Files.createTempDirectory("graft-dash").toString
    MockData.envelope(MockData.candles(spark, Seq("NSE:TCS-EQ"), 3, 1759895100L),
      "2025-10-08T04:00:00Z").coalesce(1).write.json(s"$landDir/f1")
    val server = ApiServer.start(
      () => candles,
      ApiServer.Config(
        clock = () => java.time.Instant.parse("2025-10-08T06:00:00Z"),
        filesDir = Some(landDir)))
    try {
      val (code, html) = get(server, "/dashboard")
      assert(code === 200)
      assert(html.contains("Stock Price Feed Dashboard"))

      // the symbol table rows mirror /latest's last_candle exactly
      val (_, latestBody) = get(server, "/latest")
      val latest = mapper.readTree(latestBody)
      val data = latest.get("data")
      assert(html.contains(
        s"""<div class="stat-value" id="total-symbols">${data.size()}</div>"""))
      val it = data.fields()
      while (it.hasNext) {
        val e  = it.next()
        val lc = e.getValue.get("last_candle")
        def r2(x: Double): String = // the server's plain-decimal rule
          java.math.BigDecimal.valueOf(math.rint(x * 100) / 100)
            .stripTrailingZeros.toPlainString
        val o = lc.get(1).asDouble; val c = lc.get(4).asDouble
        val row = html.linesIterator
          .find(_.contains(s"<strong>${e.getKey}</strong>")).getOrElse("")
        assert(row.nonEmpty, s"symbol ${e.getKey} missing from the dashboard table")
        // open, close, and the candle-local change all present verbatim
        assert(row.contains(s"<td>${r2(o)}</td>"), row)
        assert(row.contains(s"<td>${r2(c)}</td>"), row)
        assert(row.contains(s">${r2(math.rint((c - o) * 100) / 100)}</td>"), row)
      }

      // the recent-files block lists the same keys /files returns
      val (_, filesBody) = get(server, "/files?limit=5")
      val files = mapper.readTree(filesBody).get("files")
      (0 until files.size()).foreach { i =>
        val key = files.get(i).get("key").asText
        assert(html.contains(s"<strong>$key</strong>"), s"file $key missing from dashboard")
      }

      // the clock stamp the JSON endpoints carry is on the page too
      assert(html.contains("2025-10-08T06:00:00Z"))
    } finally server.stop()
  }

  test("/file/{key} refuses files over the configured byte cap with 413") {
    val landDir = java.nio.file.Files.createTempDirectory("graft-files-cap").toString
    MockData.envelope(MockData.candles(spark, Seq("NSE:TCS-EQ"), 3, 1759895100L),
      "2025-10-08T04:00:00Z").coalesce(1).write.json(s"$landDir/f1")
    val server = ApiServer.start(
      () => candles,
      ApiServer.Config(filesDir = Some(landDir), fileDetailMaxBytes = 10L))
    try {
      val (code, body) = get(server, "/files")
      val key = mapper.readTree(body).get("files").get(0).get("key").asText
      assert(code === 200)
      val (cd, bd) = get(server, s"/file/$key")
      assert(cd === 413, bd)
      val d = mapper.readTree(bd)
      assert(d.get("error").asText === "File too large")
      assert(d.get("max_bytes").asLong === 10L)
    } finally server.stop()
  }

  test("/files without a configured dir stays 404") {
    withServer { s =>
      val (code, body) = get(s, "/files")
      assert(code === 404)
      assert(mapper.readTree(body).get("error").asText === "Files surface not configured")
    }
  }
}
