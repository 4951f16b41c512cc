package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.util.{Failure, Success, Try}

/** S1: live HTTP ingestion — the engine replacement for the
  * reference's fetch loop (`ingestion/ingestion.py:156-282`,
  * `ingestion/lambda_ingestion.py:292-456`): per-request rate
  * limiting, retry with exponential backoff, and a circuit breaker,
  * landing raw envelopes where [[graft.streaming.OhlcvStream]]'s file
  * source picks them up.
  *
  * Two shapes, matching two scales:
  *  - [[ingestOnce]] / the cron loop: a DRIVER-side fetch of a small
  *    symbol list per trigger (the reference's Lambda shape — tens of
  *    URLs every 5 minutes; parallelism would be waste).
  *  - [[fetchTable]]: a DISTRIBUTED fetch stage over a URL Dataset —
  *    `mapPartitions`, one client + rate limiter per partition — the
  *    shape a 100 TB pipeline uses for web-scale corpus fetch, where
  *    the URL list itself is a table and per-executor politeness is
  *    the rate contract. No shuffle: results stay on the partition
  *    that fetched them.
  *
  * All time/sleep effects are injected (`clock`, `sleeper`) so specs
  * assert the rate/backoff/breaker CONTRACT without wall-clock waits.
  */
object HttpIngest {

  /** Raised (inside a `Failure`, never thrown) when the breaker
    * rejects a call without touching the wire — its own type so the
    * retry loop can distinguish "endpoint known-down" from a transport
    * error that happens to be an IllegalStateException. */
  final class CircuitOpenException extends IllegalStateException("circuit breaker is OPEN")

  /** Circuit breaker (CLOSED → OPEN after `failureThreshold`
    * consecutive failures → HALF_OPEN probe after `timeoutMs`),
    * mirror of `ingestion/ingestion.py:30-66`. Thread-confined: each
    * fetcher (= one partition or the driver loop) owns its own. */
  final class CircuitBreaker(
      failureThreshold: Int = 5,
      timeoutMs: Long = 60000L,
      clock: () => Long = () => System.currentTimeMillis()) {
    private var failures = 0
    private var lastFailureAt = 0L
    private var open = false

    def state: String =
      if (!open) "CLOSED"
      else if (clock() - lastFailureAt > timeoutMs) "HALF_OPEN"
      else "OPEN"

    def call[A](f: => Try[A]): Try[A] = state match {
      case "OPEN" => Failure(new CircuitOpenException)
      case _ => // CLOSED or HALF_OPEN probe
        f match {
          case ok @ Success(_) => failures = 0; open = false; ok
          case err @ Failure(_) =>
            failures += 1; lastFailureAt = clock()
            if (failures >= failureThreshold) open = true
            err
        }
    }
  }

  /** One fetch result row (also the [[fetchTable]] output schema). */
  case class FetchResult(
      url: String,
      status: Int,
      body: String,
      attempts: Int,
      error: String)

  /** Rate-limited, retrying HTTP fetcher. `get` is the transport —
    * injectable for tests and for swapping auth/clients; the default
    * is `java.net.http.HttpClient` with a 30 s timeout (the
    * reference's `requests.get(..., timeout=30)`). */
  final class HttpFetcher(
      rateLimitMs: Long = 300L,
      maxAttempts: Int = 3,
      backoffBaseMs: Long = 1000L,
      breaker: CircuitBreaker = new CircuitBreaker(),
      sleeper: Long => Unit = Thread.sleep,
      get: String => (Int, String) = HttpFetcher.defaultGet) {

    private var calledBefore = false

    private def rateLimit(): Unit = {
      if (calledBefore) sleeper(rateLimitMs)
      calledBefore = true
    }

    /** Fetch with retry (exponential backoff 1·base, 2·base, …
      * between attempts — `ingestion/ingestion.py:271-276`) inside the
      * circuit breaker; never throws, returns the terminal outcome.
      * A 2xx whose body is not well-formed JSON counts as a FAILURE:
      * captive portals and proxy error pages answer 200 with HTML, and
      * one such body interpolated into the envelope would corrupt the
      * whole landing file. */
    def fetch(url: String): FetchResult = {
      rateLimit()
      var attempt = 0
      var last: FetchResult = null
      while (attempt < maxAttempts) {
        attempt += 1
        breaker.call {
          Try(get(url)).flatMap {
            case (code, body) if code >= 200 && code < 300 =>
              if (HttpFetcher.isWellFormedJson(body)) Success((code, body))
              else Failure(new RuntimeException(s"HTTP $code with non-JSON body: ${body.take(80)}"))
            case (code, body) => Failure(new RuntimeException(s"HTTP $code: ${body.take(200)}"))
          }
        } match {
          case Success((code, body)) =>
            return FetchResult(url, code, body, attempt, error = null)
          case Failure(e) =>
            // breaker-open short-circuits remaining attempts: the
            // endpoint is known-down, hammering it defeats the breaker.
            // When the breaker opened on THIS call's own failure, keep
            // the transport error (the root cause) and skip both the
            // pointless backoff sleep and the guaranteed-rejected retry.
            if (e.isInstanceOf[CircuitOpenException])
              return FetchResult(url, 0, null, attempt, error = e.getMessage)
            last = FetchResult(url, 0, null, attempt, error = e.getMessage)
            if (breaker.state == "OPEN") return last
            if (attempt < maxAttempts) sleeper(backoffBaseMs * (1L << (attempt - 1)))
        }
      }
      last
    }
  }

  object HttpFetcher {
    /** Well-formedness check via Jackson (already on the Spark
      * classpath) — full parse, not a prefix sniff. ObjectMapper is
      * thread-safe after configuration; one shared instance. */
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def isWellFormedJson(body: String): Boolean =
      try { mapper.readTree(body); body.trim.nonEmpty }
      catch { case _: Exception => false }

    def defaultGet: String => (Int, String) = {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(30)).build()
      url => {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(30)).GET().build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
    }
  }

  /** Assemble the raw landing envelope from per-symbol fetch results —
    * the same shape `lambda_ingestion.py:414-452` writes and
    * [[graft.ohlcv.OhlcvSchemas.rawEnvelope]] reads: symbol blocks
    * under `data`, fetch-quality metrics under `metadata`. Bodies must
    * be the per-symbol block JSON (`{"symbol":…,"candles":[[…]]}`). */
  def envelopeJson(results: Seq[FetchResult], symbolOf: String => String, nowIso: String): String = {
    val ok     = results.filter(r => r.error == null)
    val failed = results.filter(r => r.error != null)
    val data = ok
      .map(r => s""""${symbolOf(r.url)}": ${r.body}""")
      .mkString("{", ", ", "}")
    val failedList = failed.map(r => s""""${symbolOf(r.url)}"""").mkString("[", ", ", "]")
    val rate =
      if (results.isEmpty) 0.0 else math.round(10000.0 * ok.size / results.size) / 100.0
    s"""{"data": $data, "metadata": {
       |  "total_symbols_requested": ${results.size},
       |  "successful_symbols": ${ok.size},
       |  "failed_symbols": $failedList,
       |  "success_rate_percent": $rate,
       |  "ingestion_timestamp": "$nowIso"
       |}}""".stripMargin
  }

  /** One cron tick: fetch every symbol (rate-limited, retried,
    * breaker-guarded), land ONE envelope file atomically (write to a
    * dot-prefixed temp, then rename — the file stream source must
    * never list a half-written file). Returns the results for
    * logging/metrics. */
  def ingestOnce(
      urls: Seq[String],
      symbolOf: String => String,
      landingDir: String,
      fetcher: HttpFetcher,
      nowIso: String = java.time.Instant.now().toString): Seq[FetchResult] = {
    val results = urls.map(fetcher.fetch)
    val dir = java.nio.file.Paths.get(landingDir)
    java.nio.file.Files.createDirectories(dir)
    val name = s"envelope_${nowIso.replaceAll("[:.]", "-")}.json"
    val tmp  = dir.resolve(s".$name.tmp")
    java.nio.file.Files.write(tmp, envelopeJson(results, symbolOf, nowIso).getBytes("UTF-8"))
    java.nio.file.Files.move(
      tmp, dir.resolve(name), java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    results
  }

  /** The 5-minute ingestion loop as a streaming query: a `rate`
    * source ticks, `foreachBatch` runs [[ingestOnce]] on the driver —
    * the EventBridge-cron twin, checkpointable and stoppable like any
    * other query. Downstream, [[graft.streaming.OhlcvStream.readRawStream]]
    * tails `landingDir` — ingest and normalize stay decoupled exactly
    * like the reference's Lambda → S3 → ETL hop. */
  def ingestStream(
      spark: SparkSession,
      urls: Seq[String],
      symbolOf: String => String,
      landingDir: String,
      mkFetcher: () => HttpFetcher,
      intervalSeconds: Long = 300L): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$intervalSeconds seconds"))
      .foreachBatch { (_: DataFrame, _: Long) =>
        ingestOnce(urls, symbolOf, landingDir, mkFetcher()); ()
      }
      .start()

  /** Distributed fetch over a URL table: one fetcher (client, rate
    * limiter, breaker) per PARTITION, results stay where they were
    * fetched. Partition the input by politeness domain upstream
    * (`repartition(col("domain"))`) so per-partition rate limiting is
    * per-host rate limiting. This is the corpus-fetch stage shape; the
    * driver loop above is its small-N degenerate case. */
  def fetchTable(
      urls: DataFrame,
      urlCol: String,
      mkFetcher: () => HttpFetcher): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    urls
      .select(col(urlCol).cast("string"))
      .as[String]
      .mapPartitions { it =>
        val fetcher = mkFetcher()
        it.map(fetcher.fetch)
      }
      .toDF()
  }
}
