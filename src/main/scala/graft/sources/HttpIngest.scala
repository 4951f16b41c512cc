package graft.sources

import graft.ohlcv.{Normalize, OhlcvSchemas, RawIngest}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Live ingestion connector (S1) — the engine's replacement for the
  * reference's Fyers fetch loop (ingestion/ingestion.py:156-282,
  * ingestion/lambda_ingestion.py:292-456): per-symbol fetch with
  * jittered exponential retry, a CLOSED/OPEN/HALF_OPEN circuit
  * breaker (ingestion/ingestion.py:31-66), request pacing, batch
  * accounting (success rate, failed symbols), and assembly into the
  * same raw snapshot envelope the rest of the pipeline consumes
  * ([[OhlcvSchemas.rawEnvelope]] → [[RawIngest]] → [[Normalize]]).
  *
  * The HTTP layer is a pluggable [[HttpIngest.Transport]] function: a
  * production deployment binds it to `java.net.http.HttpClient`
  * (stdlib — the request shape is documented on [[FetchRequest]]);
  * tests and this offline environment bind deterministic in-memory
  * transports. Everything around the socket — retry, breaker, pacing,
  * accounting, envelope assembly, raw-zone landing — is the real
  * production path and is what this module owns.
  *
  * Scale shape: the reference runs this loop single-node (a Lambda).
  * [[HttpIngest.fetchAll]] keeps that driver-side shape for parity;
  * [[HttpIngest.fetchDistributed]] is the 1000-executor form — symbols
  * partitioned across the cluster with mapPartitions, each partition
  * owning an independent breaker + pacer so the aggregate request
  * rate scales with (and is bounded by) partition count, and no
  * candle bytes ever funnel through the driver.
  */
object HttpIngest {

  /** Thrown by [[CircuitBreaker.call]] when the circuit is OPEN.
    * Object-level (not breaker-inner) so catch sites are a plain class
    * test — a path-dependent inner type can't be checked at runtime. */
  final class OpenCircuitException
    extends RuntimeException("circuit breaker is OPEN")

  /** One upstream request: fetch `resolution`-minute candles for
    * `symbol` over `[rangeFromUnix, rangeToUnix]` (epoch seconds) —
    * the parameter set of ingestion/ingestion.py:240-248. A real
    * transport GETs `/history` with these as query params and returns
    * the positional candle arrays from the JSON body. */
  final case class FetchRequest(
      symbol: String,
      resolution: String,
      rangeFromUnix: Long,
      rangeToUnix: Long)

  /** Upstream reply: `Some(candles)` with 6-slot positional rows
    * [ts, open, high, low, close, volume]; `None` for a well-formed
    * "no data for this symbol" reply (NOT retried — mirrors the
    * reference returning None without backoff). Transient transport
    * failures (timeouts, 5xx) are thrown and drive retry + breaker. */
  type Transport = FetchRequest => Option[Seq[Array[Double]]]

  /** Circuit breaker (ingestion/ingestion.py:31-66): after
    * `failureThreshold` consecutive failures the circuit OPENs and
    * calls fail fast without touching the transport; after
    * `timeoutSeconds` the next call probes HALF_OPEN — success resets
    * to CLOSED, failure re-OPENs. `clock` (epoch millis) is injected
    * so the state machine is deterministic under test. */
  final class CircuitBreaker(
      failureThreshold: Int = 3,
      timeoutSeconds: Long = 300,
      clock: () => Long = () => System.currentTimeMillis()) {

    private var failures = 0
    private var lastFailureMs = 0L
    private var st: String = "CLOSED"

    def state: String = st

    def call[A](f: => A): A = {
      if (st == "OPEN") {
        if (clock() - lastFailureMs > timeoutSeconds * 1000L) st = "HALF_OPEN"
        else throw new OpenCircuitException
      }
      try {
        val out = f
        failures = 0
        st = "CLOSED"
        out
      } catch {
        case scala.util.control.NonFatal(e) =>
          failures += 1
          lastFailureMs = clock()
          if (failures >= failureThreshold) st = "OPEN"
          throw e
      }
    }
  }

  /** Connector knobs, defaulted to the reference's constants:
    * 3 retry attempts with `2^attempt`-second backoff + sub-second
    * jitter (ingestion/ingestion.py:271-276), 500 ms between requests
    * and batches of 5 symbols with a 2 s inter-batch pause
    * (ingestion/ingestion.py:81,180,208), breaker threshold 3 /
    * cooldown 300 s (ingestion/ingestion.py:76-80). `sleep` is the
    * pacing effect (injected for test determinism); `jitterMs` maps
    * (symbol, attempt) to the jitter — deterministic by default
    * (hash-derived) where the reference uses wall-clock fraction. */
  final case class IngestConfig(
      resolution: String = "5",
      attempts: Int = 3,
      rateLimitMs: Long = 500,
      batchSize: Int = 5,
      batchDelayMs: Long = 2000,
      breakerThreshold: Int = 3,
      breakerTimeoutSeconds: Long = 300,
      sleep: Long => Unit = ms => Thread.sleep(ms),
      jitterMs: (String, Int) => Long = (s, a) =>
        math.abs(scala.util.hashing.MurmurHash3.stringHash(s"$s#$a")) % 1000L)

  /** One symbol's fetch outcome: candles (empty for no-data),
    * the 1-based attempt that succeeded, and the terminal error
    * message if all attempts failed. */
  final case class SymbolFetch(
      symbol: String,
      candles: Seq[Array[Double]],
      attempt: Int,
      error: Option[String])

  /** Whole-run report — the accounting envelope of
    * ingestion/ingestion.py:215-231. */
  final case class FetchReport(
      fetched: Seq[SymbolFetch],
      failedSymbols: Seq[String],
      totalRequested: Int,
      successful: Int,
      successRatePercent: Double,
      breakerState: String)

  /** Fetch one symbol with jittered exponential retry: transient
    * transport errors back off `2^attempt` seconds + jitter and
    * retry up to `cfg.attempts`; a clean empty reply returns
    * immediately (no retry — the upstream said "no data", reference
    * ingestion/ingestion.py:263-268). The LAST attempt's error is
    * rethrown (reference :270) so a wrapping breaker counts the
    * exhausted retry loop as one failure. */
  def fetchSymbol(transport: Transport, req: FetchRequest, cfg: IngestConfig): SymbolFetch = {
    var attempt = 1
    while (true) {
      try {
        transport(req) match {
          case Some(candles) => return SymbolFetch(req.symbol, candles, attempt, None)
          case None          => return SymbolFetch(req.symbol, Nil, attempt, None)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= cfg.attempts) throw e
          cfg.sleep((1000L << (attempt - 1)) + cfg.jitterMs(req.symbol, attempt))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Driver-side fetch loop at reference parity: symbols in batches
    * of `cfg.batchSize`, `cfg.rateLimitMs` pause after every request,
    * `cfg.batchDelayMs` between batches, every per-symbol fetch
    * routed through one shared circuit breaker; breaker-fast-fails
    * count as failed symbols without consuming retry backoff. */
  def fetchAll(
      symbols: Seq[String],
      rangeFromUnix: Long,
      rangeToUnix: Long,
      transport: Transport,
      cfg: IngestConfig = IngestConfig(),
      breaker: Option[CircuitBreaker] = None): FetchReport = {
    val cb = breaker.getOrElse(
      new CircuitBreaker(cfg.breakerThreshold, cfg.breakerTimeoutSeconds))
    val results = scala.collection.mutable.ArrayBuffer.empty[SymbolFetch]
    val batches = symbols.grouped(math.max(1, cfg.batchSize)).toSeq
    for ((batch, bi) <- batches.zipWithIndex) {
      for (sym <- batch) {
        val req = FetchRequest(sym, cfg.resolution, rangeFromUnix, rangeToUnix)
        // breaker-fast-fails record attempt 0 (the transport was
        // never touched); exhausted retry loops record the terminal
        // error AND count one breaker failure (rethrown above)
        val out =
          try cb.call(fetchSymbol(transport, req, cfg))
          catch {
            case e: OpenCircuitException =>
              SymbolFetch(sym, Nil, 0, Some(e.getMessage))
            case scala.util.control.NonFatal(e) =>
              SymbolFetch(sym, Nil, cfg.attempts, Some(String.valueOf(e.getMessage)))
          }
        results += out
        cfg.sleep(cfg.rateLimitMs)
      }
      if (bi < batches.size - 1) cfg.sleep(cfg.batchDelayMs)
    }
    val ok = results.count(r => r.error.isEmpty && r.candles.nonEmpty)
    FetchReport(
      fetched = results.toSeq,
      failedSymbols = results.collect { case r if r.error.isDefined => r.symbol }.toSeq,
      totalRequested = symbols.size,
      successful = ok,
      successRatePercent =
        if (symbols.isEmpty) 0.0
        else math.round(ok.toDouble / symbols.size * 10000.0) / 100.0,
      breakerState = cb.state)
  }

  /** Cluster-scale fetch: symbols become a Dataset, partitioned
    * `parallelism`-wide; each partition runs the SAME retry loop with
    * its OWN breaker + pacer (state is per-connection-pool, exactly
    * what a per-executor HTTP client would own). Aggregate request
    * rate = parallelism × (1000/rateLimitMs) req/s — throttle by
    * choosing parallelism, not by funneling through the driver. The
    * transport is constructed ON the executor via `transportFactory`
    * (an HTTP client is not serializable; a factory of config is). */
  def fetchDistributed(
      spark: SparkSession,
      symbols: Seq[String],
      rangeFromUnix: Long,
      rangeToUnix: Long,
      transportFactory: () => Transport,
      cfg: IngestConfig = IngestConfig(),
      parallelism: Int = 8): DataFrame = {
    import spark.implicits._
    val res = cfg.resolution
    spark
      .createDataset(symbols)
      .repartition(parallelism)
      .mapPartitions { syms =>
        val transport = transportFactory()
        val cb = new CircuitBreaker(cfg.breakerThreshold, cfg.breakerTimeoutSeconds)
        syms.map { sym =>
          val req = FetchRequest(sym, res, rangeFromUnix, rangeToUnix)
          val out =
            try cb.call(fetchSymbol(transport, req, cfg))
            catch {
              case e: OpenCircuitException => SymbolFetch(sym, Nil, 0, Some(e.getMessage))
              case scala.util.control.NonFatal(e) =>
                SymbolFetch(sym, Nil, cfg.attempts, Some(String.valueOf(e.getMessage)))
            }
          cfg.sleep(cfg.rateLimitMs)
          (out.symbol, out.candles.map(_.toSeq), out.attempt, out.error)
        }
      }
      .toDF("symbol", "candles", "attempt", "error")
  }

  /** Assemble a [[FetchReport]] into the raw snapshot envelope —
    * schema-identical to [[OhlcvSchemas.rawEnvelope]] (data map of
    * symbol blocks + fetch metadata, ingestion/lambda_ingestion.py:
    * 414-452) — ready for the raw JSON landing zone and the batch /
    * streaming normalize path. Symbols with no candles are omitted
    * from the map (the reference only stores successful blocks). */
  def envelope(spark: SparkSession, report: FetchReport, fetchTs: String,
      resolution: String = "5"): DataFrame = {
    import spark.implicits._
    // tiny driver-side assembly (one row per fetch tick, symbols ≤
    // thousands): build the rows, then shape them with the SAME Spark
    // expressions as the mock generator so the schemas cannot drift
    val flat = report.fetched
      .filter(_.candles.nonEmpty)
      .flatMap(sf => sf.candles.map(c => (sf.symbol, c.toSeq)))
      .toDF("symbol", "candle")
    flat
      .groupBy(col("symbol"))
      .agg(collect_list(col("candle")).as("candles"))
      .select(
        col("symbol"),
        struct(
          col("symbol"),
          lit(resolution).as("resolution"),
          col("candles"),
          lit(fetchTs).as("timestamp"),
          size(col("candles")).cast("long").as("total_records")).as("block"))
      .groupBy()
      .agg(map_from_entries(collect_list(struct(col("symbol"), col("block")))).as("data"))
      .select(
        col("data"),
        struct(
          lit(fetchTs).as("fetch_timestamp"),
          size(map_keys(col("data"))).cast("long").as("total_symbols"),
          lit("live").as("source")).as("metadata"))
  }

  /** One ingest tick: fetch → envelope → append ONE raw JSON document
    * to the landing zone `rawDir` — the unit the reference's
    * EventBridge cron fires every 5 minutes. The streaming pipeline
    * ([[graft.streaming.OhlcvStream.readRawStream]]) picks the file
    * up on its next trigger; batch replays read the same bytes. */
  def ingestTick(
      spark: SparkSession,
      symbols: Seq[String],
      rangeFromUnix: Long,
      rangeToUnix: Long,
      transport: Transport,
      rawDir: String,
      fetchTs: String,
      cfg: IngestConfig = IngestConfig()): FetchReport = {
    val report = fetchAll(symbols, rangeFromUnix, rangeToUnix, transport, cfg)
    if (report.successful > 0)
      envelope(spark, report, fetchTs, cfg.resolution)
        .coalesce(1)
        .write.mode("append").json(rawDir)
    report
  }

  /** The 5-minute-cron twin as a stream (S1's EventBridge schedule,
    * infra cron → `rate` source): one row per `triggerSeconds` drives
    * a `foreachBatch` that runs [[ingestTick]] over the trailing
    * `windowSeconds` (the reference fetches a 10-min window every
    * 5 min for overlap — the downstream watermarked dedup absorbs the
    * overlap, streaming/OhlcvStream T4). `clock` injected (epoch
    * seconds) so tests pin the fetch windows. Stop via the returned
    * query handle; checkpointed, so a restart resumes the cadence. */
  def ingestStream(
      spark: SparkSession,
      symbols: Seq[String],
      transport: Transport,
      rawDir: String,
      checkpointDir: String,
      cfg: IngestConfig = IngestConfig(),
      windowSeconds: Long = 600,
      triggerSeconds: Long = 300,
      clock: () => Long = () => System.currentTimeMillis() / 1000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerSeconds * 1000L))
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        val now = clock()
        ingestTick(spark, symbols, now - windowSeconds, now, transport, rawDir,
          fetchTs = java.time.Instant.ofEpochSecond(now).toString, cfg)
        ()
      }
      .start()

  // ---------------------------------------------------------------
  // Real HTTP transport (java.net.http, JDK stdlib)
  // ---------------------------------------------------------------

  /** Mutable Authorization-header holder with the reference's token
    * lifecycle (ingestion/lambda_ingestion.py:339-360): an HTTP 401
    * ALWAYS attempts a refresh (expiry can recur within a long run); a
    * 403 attempts one only if no refresh has succeeded yet this run —
    * after that, a 403 is a real permission failure, not expiry (the
    * reference's `token_refreshed` flag). `refreshFn` is the analogue
    * of `refresh_fyers_access_token` + the SSM write-back (:246-290):
    * it returns the NEW header value, persisting it wherever the
    * caller keeps credentials, or None when refresh is impossible (no
    * refresh token — reference :249). Thread-safe: one instance may
    * back every connection in a [[fetchDistributed]] partition. */
  final class TokenAuth(initial: String, refreshFn: () => Option[String]) {
    @volatile private var token: String = initial
    @volatile private var refreshedOnce = false
    def current: String = token
    /** Called on an auth-rejected response; true iff a new token was
      * installed and the request should be retried once. */
    def refreshFor(status: Int): Boolean = synchronized {
      if (status == 403 && refreshedOnce) false
      else refreshFn() match {
        case Some(t) => token = t; refreshedOnce = true; true
        case None    => false
      }
    }
  }

  /** Static-token auth: refresh is impossible, 401s surface as-is. */
  def staticAuth(authorization: String): TokenAuth =
    new TokenAuth(authorization, () => None)

  /** Production [[Transport]] over `java.net.http.HttpClient`: GET
    * `{baseUrl}/history?symbol=…&resolution=…&date_format=1&
    * range_from=…&range_to=…&cont_flag=1` with the `Authorization`
    * header — the exact request shape of ingestion/ingestion.py:
    * 240-254 — and parse `{code: 200, candles: [[…], …]}` from the
    * JSON body (jackson-databind, already on Spark's classpath).
    * Status ≥ 500 and I/O errors THROW (retryable → drives backoff +
    * breaker); a well-formed body without candles, or an application
    * code ≠ 200, returns None (no retry — upstream said no data).
    * An auth-rejected response (401/403) consults [[TokenAuth]] and
    * replays the request ONCE with the refreshed header (reference
    * lambda_ingestion.py:339-365); if the replay is rejected too, the
    * error throws like any other 4xx (→ retry loop + breaker). */
  def httpTransport(
      baseUrl: String,
      authorization: Option[String] = None,
      timeoutSeconds: Long = 30): Transport =
    httpTransportAuth(baseUrl, authorization.map(staticAuth), timeoutSeconds)

  /** [[httpTransport]] with a refreshable [[TokenAuth]]. */
  def httpTransportAuth(
      baseUrl: String,
      auth: Option[TokenAuth],
      timeoutSeconds: Long = 30): Transport = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    req => {
      val q = s"symbol=${java.net.URLEncoder.encode(req.symbol, "UTF-8")}" +
        s"&resolution=${req.resolution}&date_format=1" +
        s"&range_from=${req.rangeFromUnix}&range_to=${req.rangeToUnix}&cont_flag=1"
      def send(): java.net.http.HttpResponse[String] = {
        val b = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"$baseUrl/history?$q"))
          .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
          .GET()
        auth.foreach(a => b.header("Authorization", a.current))
        client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      var resp = send()
      if ((resp.statusCode() == 401 || resp.statusCode() == 403) &&
        auth.exists(_.refreshFor(resp.statusCode())))
        resp = send()
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} for ${req.symbol}")
      val root = mapper.readTree(resp.body())
      if (root.path("code").asInt(0) != 200 || !root.path("candles").isArray) None
      else {
        val it = root.path("candles").elements()
        val out = Seq.newBuilder[Array[Double]]
        while (it.hasNext) {
          val row = it.next()
          out += Array.tabulate(row.size())(i => row.get(i).asDouble())
        }
        val candles = out.result()
        if (candles.isEmpty) None else Some(candles)
      }
    }
  }

  // ---------------------------------------------------------------
  // Generic URL-corpus fetch stage (LLM-pipeline ingestion)
  // ---------------------------------------------------------------

  /** Distributed fetch over a TABLE of URLs — the ingestion stage of
    * a web-corpus pipeline (crawl lists, image/audio URL manifests):
    * each partition constructs one fetcher (connection pool) +
    * breaker + pacer, and emits `(url, body, error, attempt)` rows
    * with the body as raw bytes for downstream decode
    * ([[graft.operators.Multimodal]]) or parse. Same scale contract
    * as [[fetchDistributed]]: aggregate request rate =
    * partitions × 1000/rateLimitMs, no bytes through the driver, a
    * dead host trips only its partitions' breakers. Repartition the
    * url table BY HOST first when politeness-per-host matters. */
  def fetchTable(
      urls: DataFrame,
      urlCol: String,
      fetcherFactory: () => String => Array[Byte],
      cfg: IngestConfig = IngestConfig()): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls
      .select(col(urlCol).cast("string").as("url"))
      .as[String]
      .mapPartitions { us =>
        val fetch = fetcherFactory()
        val cb = new CircuitBreaker(cfg.breakerThreshold, cfg.breakerTimeoutSeconds)
        // same breaker granularity as fetchSymbol: ONE exhausted
        // retry loop = ONE breaker failure (not one per attempt)
        def fetchOne(u: String): (Array[Byte], Int) = {
          var attempt = 1
          while (true) {
            try return (fetch(u), attempt)
            catch {
              case scala.util.control.NonFatal(e) =>
                if (attempt >= cfg.attempts) throw e
                cfg.sleep((1000L << (attempt - 1)) + cfg.jitterMs(u, attempt))
                attempt += 1
            }
          }
          throw new IllegalStateException("unreachable")
        }
        us.map { u =>
          val out =
            try { val (body, att) = cb.call(fetchOne(u)); (u, body, Option.empty[String], att) }
            catch {
              case e: OpenCircuitException => (u, null, Some(e.getMessage), 0)
              case scala.util.control.NonFatal(e) =>
                (u, null, Some(String.valueOf(e.getMessage)), cfg.attempts)
            }
          cfg.sleep(cfg.rateLimitMs)
          out
        }
      }
      .toDF("url", "body", "error", "attempt")
  }
}
