package graft.sinks

import graft.ohlcv.{MockData, Normalize, RawIngest}

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NotifySpec extends SparkSpec {

  private def recorder(): (scala.collection.mutable.ArrayBuffer[(String, String)], Notify.Notifier) = {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    (sent, (subj, msg) => sent += ((subj, msg)))
  }

  test("completionMessage: success carries the stats block, failure carries the error") {
    val (subj, msg) = Notify.completionMessage(
      success = true, totalRecords = 1234, symbolsCount = 30,
      resolution = "5", atIso = "2024-01-02T16:00:00")
    assert(subj === "ETL Job - Success")
    assert(msg.contains("Total records processed: 1234"))
    assert(msg.contains("Symbols processed: 30"))
    assert(msg.contains("Resolution: 5"))

    val (fs, fm) = Notify.completionMessage(
      success = false, 0, 0, "N/A", "2024-01-02T16:00:00",
      errorMsg = Some("schema drift in raw zone"))
    assert(fs === "ETL Job - FAILURE")
    assert(fm.contains("schema drift in raw zone") && fm.contains("failed at 2024-01-02T16:00:00"))
  }

  test("notifyCompletion: stats aggregated from the normalized frame; publish errors are swallowed") {
    val s = spark
    val candles = MockData.candles(s, Seq("NSE:TCS-EQ", "NSE:INFY-EQ"), 5, 1704186000L)
    val norm = Normalize.normalize(
      RawIngest.blocks(MockData.envelope(candles, "2024-01-02T09:30:00").withColumn("source_file", lit("mem"))),
      "2024-01-02T09:31:00")

    val (sent, notifier) = recorder()
    Notify.notifyCompletion(notifier, norm, "2024-01-02T16:00:00")
    assert(sent.size === 1)
    val (subj, msg) = sent.head
    assert(subj.endsWith("Success"))
    assert(msg.contains("Total records processed: 10") && msg.contains("Symbols processed: 2"))

    // failure path does not touch the frame at all
    val (fsent, fnotifier) = recorder()
    Notify.notifyCompletion(fnotifier, norm, "2024-01-02T16:00:00", errorMsg = Some("boom"))
    assert(fsent.head._1.endsWith("FAILURE"))

    // a throwing channel must not propagate (reference swallows SNS errors)
    Notify.notifyCompletion((_, _) => throw new RuntimeException("sns down"), norm,
      "2024-01-02T16:00:00")
  }

  test("onBatchComplete: one notification per non-empty batch, batchId embedded; empty batch is silent") {
    val s = spark
    val candles = MockData.candles(s, Seq("NSE:SBIN-EQ"), 3, 1704186000L)
    val norm = Normalize.normalize(
      RawIngest.blocks(MockData.envelope(candles, "2024-01-02T09:30:00").withColumn("source_file", lit("mem"))),
      "2024-01-02T09:31:00")

    val (sent, notifier) = recorder()
    Notify.onBatchComplete(notifier, norm, batchId = 7, atIso = "2024-01-02T09:35:00")
    assert(sent.size === 1)
    assert(sent.head._1 === "Stream ETL - Batch 7")
    assert(sent.head._2.contains("Batch id: 7")) // receiver-side dedup key

    Notify.onBatchComplete(notifier, norm.limit(0), batchId = 8, atIso = "2024-01-02T09:40:00")
    assert(sent.size === 1) // empty batch → no notification
  }

  test("fileNotifier appends readable delivery lines; fromRunMetadata shares the A11 rollup") {
    val s = spark
    val candles = MockData.candles(s, Seq("NSE:TCS-EQ", "NSE:INFY-EQ", "NSE:SBIN-EQ"), 4, 1704186000L)
    val norm = Normalize.normalize(
      RawIngest.blocks(MockData.envelope(candles, "2024-01-02T09:30:00")
        .withColumn(("source_file"), org.apache.spark.sql.functions.lit("mem"))),
      "2024-01-02T09:31:00")
    val meta = graft.ohlcv.Storage.runMetadata(norm, "nightly-etl")
    val (subj, msg) = Notify.fromRunMetadata(meta, resolution = "5", atIso = "2024-01-02T16:00:00")
    assert(subj === "nightly-etl - Success")
    assert(msg.contains("Total records processed: 12") && msg.contains("Symbols processed: 3"))

    val log = java.nio.file.Files.createTempDirectory("notify").resolve("sns.log").toString
    val n = Notify.fileNotifier(log)
    n(subj, msg)
    n("second", "line")
    val lines = scala.io.Source.fromFile(log).getLines().toSeq
    assert(lines.size === 2 && lines.head.startsWith("nightly-etl - Success\t"))
    assert(lines.head.contains("\\n- Symbols processed: 3")) // newline-escaped payload
  }

  test("webhookNotifier: live POST to an in-process server — delivery, 5xx retry, 4xx permanent, swallow rule") {
    // failure-injection server: responds from a programmable status
    // queue (empty queue → 200), recording every request body
    val statuses = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val bodies   = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (ex: com.sun.net.httpserver.HttpExchange) => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      val sc = Option(statuses.poll()).getOrElse(200)
      ex.sendResponseHeaders(sc, -1)
      ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/hook"
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val n = Notify.webhookNotifier(url, attempts = 3, sleep = slept += _)

      // clean delivery: one POST, JSON body carries subject + message
      n("ETL Job - Success", "stats\nline2")
      assert(bodies.size === 1)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val sentJson = mapper.readTree(bodies.poll())
      assert(sentJson.get("subject").asText === "ETL Job - Success")
      assert(sentJson.get("message").asText === "stats\nline2")

      // transient 5xx retries with exponential backoff then delivers
      statuses.add(500)
      n("s", "m")
      assert(bodies.size === 2 && slept.toSeq === Seq(1000L))
      bodies.clear(); slept.clear()

      // exhausted 5xx throws (at-least-once gave up) — exactly
      // `attempts` requests hit the server
      statuses.add(500); statuses.add(503); statuses.add(500)
      intercept[java.io.IOException] { n("s", "m") }
      assert(bodies.size === 3 && slept.toSeq === Seq(1000L, 2000L))
      bodies.clear(); slept.clear()

      // 4xx is a PERMANENT rejection: one request, no retry
      statuses.add(404)
      intercept[Notify.WebhookRejected] { n("s", "m") }
      assert(bodies.size === 1 && slept.isEmpty)
      bodies.clear()

      // an endpoint moved behind a 308 is FOLLOWED, not misreported
      // as a permanent configuration error
      server.createContext("/moved", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getResponseHeaders.add("Location", url)
        ex.sendResponseHeaders(308, -1)
        ex.close()
      })
      val nMoved = Notify.webhookNotifier(
        s"http://127.0.0.1:${server.getAddress.getPort}/moved",
        attempts = 3, sleep = slept += _)
      nMoved("moved", "payload")
      assert(bodies.size === 1 && slept.isEmpty) // delivered at the target, no retry burned
      assert(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bodies.poll()).get("subject").asText === "moved")
      bodies.clear()

      // a 301 preserves METHOD + BODY (the JDK's Redirect.NORMAL
      // would degrade the POST to a bodyless GET — the regression
      // the manual follower exists to prevent)
      val methods = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      server.createContext("/hook301", (ex: com.sun.net.httpserver.HttpExchange) => {
        methods.add(ex.getRequestMethod)
        bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        ex.sendResponseHeaders(200, -1)
        ex.close()
      })
      server.createContext("/moved301", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        ex.getResponseHeaders.add(
          "Location", s"http://127.0.0.1:${server.getAddress.getPort}/hook301")
        ex.sendResponseHeaders(301, -1)
        ex.close()
      })
      val n301 = Notify.webhookNotifier(
        s"http://127.0.0.1:${server.getAddress.getPort}/moved301",
        attempts = 1)
      n301("moved301", "payload intact")
      assert(methods.poll() === "POST")
      assert(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bodies.poll()).get("message").asText === "payload intact")
      bodies.clear()

      // cross-origin redirect: Authorization/Cookie are STRIPPED at
      // the foreign origin (different port = different origin) while
      // non-auth headers and the body still arrive
      val server2 = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      val foreignAuth = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      server2.createContext("/foreign", (ex: com.sun.net.httpserver.HttpExchange) => {
        bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        foreignAuth.add(
          (if (ex.getRequestHeaders.containsKey("Authorization")) "auth" else "-") + "|" +
          (if (ex.getRequestHeaders.containsKey("Cookie")) "cookie" else "-") + "|" +
          Option(ex.getRequestHeaders.getFirst("X-Run-Id")).getOrElse("-"))
        ex.sendResponseHeaders(200, -1)
        ex.close()
      })
      server2.start()
      try {
        server.createContext("/movedx", (ex: com.sun.net.httpserver.HttpExchange) => {
          ex.getRequestBody.readAllBytes()
          ex.getResponseHeaders.add(
            "Location", s"http://127.0.0.1:${server2.getAddress.getPort}/foreign")
          ex.sendResponseHeaders(302, -1)
          ex.close()
        })
        val nX = Notify.webhookNotifier(
          s"http://127.0.0.1:${server.getAddress.getPort}/movedx",
          headers = Map(
            "Authorization" -> "Bearer s3cret",
            "Cookie" -> "sid=1",
            "X-Run-Id" -> "r42"),
          attempts = 1)
        nX("cross", "origin")
        assert(foreignAuth.poll() === "-|-|r42") // auth gone, benign header kept
        assert(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(bodies.poll()).get("subject").asText === "cross")
        bodies.clear()

        // 303 See Other WITH auth, cross-origin: the RFC's
        // "switch-to-GET" convention is deliberately NOT applied (the
        // payload IS the notification) — the foreign target must see a
        // POST with the intact body and NO auth-bearing headers
        val foreign303 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        server2.createContext("/foreign303", (ex: com.sun.net.httpserver.HttpExchange) => {
          bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          foreign303.add(ex.getRequestMethod + "|" +
            (if (ex.getRequestHeaders.containsKey("Authorization")) "auth" else "-") + "|" +
            (if (ex.getRequestHeaders.containsKey("Cookie")) "cookie" else "-"))
          ex.sendResponseHeaders(200, -1)
          ex.close()
        })
        server.createContext("/moved303", (ex: com.sun.net.httpserver.HttpExchange) => {
          ex.getRequestBody.readAllBytes()
          ex.getResponseHeaders.add(
            "Location", s"http://127.0.0.1:${server2.getAddress.getPort}/foreign303")
          ex.sendResponseHeaders(303, -1)
          ex.close()
        })
        val n303x = Notify.webhookNotifier(
          s"http://127.0.0.1:${server.getAddress.getPort}/moved303",
          headers = Map("Authorization" -> "Bearer s3cret", "Cookie" -> "sid=1"),
          attempts = 1)
        n303x("see-other", "still a post")
        assert(foreign303.poll() === "POST|-|-") // method preserved, auth stripped
        assert(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(bodies.poll()).get("message").asText === "still a post")
      } finally server2.stop(0)
      bodies.clear()

      // 303 WITH auth, SAME-origin: the strip is scoped to foreign
      // origins only — a same-origin hop (path move behind one host)
      // must keep the bearer token, or every redirect behind an
      // authenticated webhook breaks
      val same303 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      server.createContext("/hook303same", (ex: com.sun.net.httpserver.HttpExchange) => {
        bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        same303.add(ex.getRequestMethod + "|" +
          Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("-"))
        ex.sendResponseHeaders(200, -1)
        ex.close()
      })
      server.createContext("/moved303same", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        ex.getResponseHeaders.add(
          "Location", s"http://127.0.0.1:${server.getAddress.getPort}/hook303same")
        ex.sendResponseHeaders(303, -1)
        ex.close()
      })
      val n303same = Notify.webhookNotifier(
        s"http://127.0.0.1:${server.getAddress.getPort}/moved303same",
        headers = Map("Authorization" -> "Bearer s3cret"),
        attempts = 1)
      n303same("same-origin", "auth kept")
      assert(same303.poll() === "POST|Bearer s3cret")
      assert(new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(bodies.poll()).get("message").asText === "auth kept")
      bodies.clear()

      // a 3xx with no Location is PERMANENT (a retry re-POSTs the
      // identical request to the identical endpoint — e.g. a 304
      // legitimately never carries one): WebhookRejected, zero
      // backoffs burned even with retry budget available
      val nolocHits = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/noloc", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        nolocHits.incrementAndGet()
        ex.sendResponseHeaders(304, -1)
        ex.close()
      })
      val nNoLoc = Notify.webhookNotifier(
        s"http://127.0.0.1:${server.getAddress.getPort}/noloc",
        attempts = 3, sleep = slept += _)
      val noLocEx = intercept[Notify.WebhookRejected] { nNoLoc("s", "m") }
      assert(noLocEx.getMessage.contains("304"))
      assert(nolocHits.get === 1 && slept.isEmpty) // one POST, no retries
      slept.clear()

      // a self-redirect loop is cut off and treated as TRANSIENT
      val loopUrl = s"http://127.0.0.1:${server.getAddress.getPort}/loop"
      val loopHits = new java.util.concurrent.atomic.AtomicInteger(0)
      server.createContext("/loop", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        loopHits.incrementAndGet()
        ex.getResponseHeaders.add("Location", loopUrl)
        ex.sendResponseHeaders(301, -1)
        ex.close()
      })
      val nLoop = Notify.webhookNotifier(loopUrl, attempts = 1)
      intercept[java.io.IOException] { nLoop("s", "m") }
      assert(loopHits.get === 6) // initial + 5 followed hops, then cut

      // caller-supplied Content-Type REPLACES the default instead of
      // being sent alongside it (no duplicate header values)
      val seenCt = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      server.createContext("/ct", (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.getRequestBody.readAllBytes()
        seenCt.add(String.join("|", ex.getRequestHeaders.get("Content-Type")))
        ex.sendResponseHeaders(200, -1)
        ex.close()
      })
      val nCt = Notify.webhookNotifier(
        s"http://127.0.0.1:${server.getAddress.getPort}/ct",
        headers = Map("content-type" -> "application/json; charset=utf-8"))
      nCt("s", "m")
      assert(seenCt.poll() === "application/json; charset=utf-8")

      // the swallow rule: a failing channel never fails the job —
      // notifyCompletion logs and continues (reference
      // glue_job.py:315-317)
      val candles = MockData.candles(spark, Seq("NSE:TCS-EQ"), 3, 1704186000L)
      val norm = Normalize.normalize(
        RawIngest.blocks(MockData.envelope(candles, "2024-01-02T09:30:00")
          .withColumn("source_file", org.apache.spark.sql.functions.lit("mem"))),
        "2024-01-02T09:31:00")
      statuses.add(500); statuses.add(500); statuses.add(500)
      Notify.notifyCompletion(n, norm, "2024-01-02T16:00:00") // must not throw
      assert(bodies.size === 3)
      bodies.clear()

      // at-least-once per batch: a replayed batch re-POSTs the same
      // batch-id message; the receiver dedups on the embedded id
      Notify.onBatchComplete(n, norm, batchId = 7, atIso = "2024-01-02T09:35:00")
      Notify.onBatchComplete(n, norm, batchId = 7, atIso = "2024-01-02T09:35:00")
      assert(bodies.size === 2)
      val replayed = bodies.toArray(Array.empty[String]).map(mapper.readTree)
      assert(replayed.forall(_.get("message").asText.contains("Batch id: 7")))
    } finally server.stop(0)

    // connect-refused (server down) is transient: retries then throws;
    // the completion hook still swallows it
    val deadUrl = url
    val sleptDead = scala.collection.mutable.ArrayBuffer.empty[Long]
    val nDead = Notify.webhookNotifier(deadUrl, attempts = 2, sleep = sleptDead += _)
    intercept[java.io.IOException] { nDead("s", "m") }
    assert(sleptDead.toSeq === Seq(1000L))
  }
}
