package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class DocStreamSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("docstream").toString

  test("streaming ingest: exact-dup suppressed within watermark, quality gate scores like batch") {
    val s = spark; import s.implicits._
    // f1 lands three docs; f2 re-lands doc 0 verbatim (exact dup, new
    // id) plus a fresh doc. The long docs pass the gate; doc 2 is too
    // short to score 0.3.
    val longText = ("the data value " * 40).trim
    val f1 = Seq(
      (0L, longText, "en", "s0", "2025-10-08 10:00:00"),
      (1L, "the quick brown fox jumps over the lazy dog " * 20 + "end", "en", "s0", "2025-10-08 10:00:10"),
      (2L, "tiny", "en", "s0", "2025-10-08 10:00:20"))
    val f2 = Seq(
      (3L, longText, "en", "s1", "2025-10-08 10:01:00"), // dup of 0 within watermark
      (4L, ("of the table " * 40).trim, "en", "s1", "2025-10-08 10:01:10"))
    def land(rows: Seq[(Long, String, String, String, String)], dir: String, bumpMs: Long): Unit = {
      rows.toDF("doc_id", "text", "lang", "source", "ts")
        .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
        .coalesce(1).write.json(s"$tmp/$dir")
      val now = System.currentTimeMillis()
      Files.walk(java.nio.file.Paths.get(s"$tmp/$dir")).forEach { p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(now + bumpMs))
      }
    }
    land(f1, "land/f1", 0L)
    land(f2, "land/f2", 60000L)

    val stream = DocStream.readDocStream(spark, s"$tmp/land/*", maxFilesPerTrigger = 1)
    val q = DocStream.ingest(stream, minScore = 0.3).writeStream
      .format("memory")
      .queryName("doc_out")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.table("doc_out")
    // doc 3 (re-land of 0) suppressed by fingerprint; doc 2 gated out
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L, 1L, 4L))
    // stream scoring is bit-identical to the batch expression
    val batchScores = graft.operators.TextAnalysis
      .qualityMetrics(
        (f1 ++ f2).toDF("doc_id", "text", "lang", "source", "ts"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    out.select("doc_id", "quality_score").collect().foreach { r =>
      assert(r.getDouble(1) === batchScores(r.getLong(0)))
    }
    assert(out.filter(col("predicted_lang") =!= "en").count() === 0)
  }

  test("streaming ingest redacts PII with the batch patterns after scoring") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-pii").toString
    val withPii = ("the data value " * 30).trim +
      " contact me at alice@example.com or call 555-0142 thanks"
    Seq((0L, withPii, "en", "s0", "2025-10-08 10:00:00"))
      .toDF("doc_id", "text", "lang", "source", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
      .coalesce(1).write.json(s"$dir/land/f1")

    val q = DocStream.ingest(DocStream.readDocStream(spark, s"$dir/land/*"), minScore = 0.3)
      .writeStream
      .format("memory").queryName("doc_pii_out").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val r = spark.table("doc_pii_out").collect().head
    assert(r.getAs[Long]("n_pii_spans") === 2)
    val red = r.getAs[String]("text")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
    assert(!red.contains("alice@example.com") && !red.contains("555-0142"))
    // the quality score was computed on the ORIGINAL text
    val batch = graft.operators.TextAnalysis.qualityScore(col("text"))
    val expected = Seq(withPii).toDF("text").select(batch).collect().head.getDouble(0)
    assert(r.getAs[Double]("quality_score") === expected)
  }

  test("historyGated: docs already in the history corpus are dropped, novel docs pass") {
    val s = spark; import s.implicits._
    val knownA = "previously ingested document alpha"
    val knownB = "previously ingested document beta"
    val history = Seq(knownA, knownB)
      .toDF("text")
      .select(graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"))
      .cache()
    val rows = Seq(
      (10L, knownA, "en", "s0", "2025-10-08 10:00:00"), // in history → dropped
      (11L, "a genuinely new document", "en", "s0", "2025-10-08 10:00:05"),
      (12L, knownB, "en", "s1", "2025-10-08 10:00:10"), // in history → dropped
      (13L, "another novel arrival", "en", "s1", "2025-10-08 10:00:15"))
    rows.toDF("doc_id", "text", "lang", "source", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
      .coalesce(1).write.json(s"$tmp/hland/f1")

    val stream = DocStream.readDocStream(spark, s"$tmp/hland/*")
    val q = DocStream.historyGated(DocStream.dedupedDocs(stream), history).writeStream
      .format("memory")
      .queryName("doc_hist_out")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/hckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val out = spark.table("doc_hist_out")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(11L, 13L))
    // batch/stream agreement: the batch gate's verdicts match
    val batchVerdicts = graft.operators.TextDedup.bloomDedupGate(
      rows.toDF("doc_id", "text", "lang", "source", "ts"),
      col("doc_id"), graft.operators.TextAnalysis.fingerprint(col("text")), history)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batchVerdicts === Map(10L -> true, 11L -> false, 12L -> true, 13L -> false))
  }

  test("bloomGatedBatchSink: growing history index — cross-batch dup dropped, novel kept, replay-safe") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-bloom").toString
    val histDir = s"$dir/history"
    def docs(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
        .withColumn("ingest_ts", to_timestamp(lit("2025-10-08 10:00:00")))
    val sink = DocStream.bloomGatedBatchSink(histDir)

    // batch 0: two docs — both novel, both land in the index
    sink(docs(Seq(0L -> "first document body", 1L -> "second document body")), 0L)
    val afterB0 = spark.read.parquet(histDir)
    assert(afterB0.select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L, 1L))

    // batch 1: re-lands doc 0's CONTENT under a new id (cross-batch
    // duplicate → dropped) plus a genuinely novel doc (→ kept)
    sink(docs(Seq(2L -> "first document body", 3L -> "third document body")), 1L)
    val afterB1 = spark.read.parquet(histDir)
    assert(afterB1.select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L, 1L, 3L))
    assert(afterB1.filter(col("batch_id") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(3L))

    // REPLAY of batch 1 (foreachBatch redelivery after a failure): its
    // own partition is invisible to the gate and gets overwritten in
    // place — same rows, no double-append, no self-suppression
    sink(docs(Seq(2L -> "first document body", 3L -> "third document body")), 1L)
    val afterReplay = spark.read.parquet(histDir)
    assert(afterReplay.select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L, 1L, 3L))
    assert(afterReplay.count() === 3)

    // batch 2 sees batch 1's novel rows as history too (the GROWING contract)
    sink(docs(Seq(4L -> "third document body", 5L -> "fourth document body")), 2L)
    assert(spark.read.parquet(histDir).filter(col("batch_id") === 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(5L))

    // end-to-end: the same sink wired through a real streaming query on
    // a FRESH index (the stream's checkpoint owns batch numbering —
    // one index dir per stream): two files → two micro-batches; the
    // second batch's re-land of batch 1's content must gate against
    // the index rows batch 1 just wrote
    val landDir = s"$dir/land"
    val histDir2 = s"$dir/history2"
    def land(rows: Seq[(Long, String)], sub: String, bumpMs: Long): Unit = {
      docs(rows).coalesce(1).write.json(s"$landDir/$sub")
      val now = System.currentTimeMillis()
      Files.walk(java.nio.file.Paths.get(s"$landDir/$sub")).forEach { p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(now + bumpMs))
      }
    }
    land(Seq(6L -> "stream alpha body", 7L -> "stream beta body"), "f1", 0L)
    land(Seq(8L -> "stream alpha body", 9L -> "stream gamma body"), "f2", 60000L)
    val q = DocStream.startBloomGatedIngest(
      DocStream.readDocStream(spark, s"$landDir/*", maxFilesPerTrigger = 1),
      histDir2, s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    val finalIds = spark.read.parquet(histDir2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(finalIds === Set(6L, 7L, 9L)) // 8 re-lands 6's content across batches
  }

  test("CHAOS: batch dies AFTER its index append; restart redelivers it — no duplicate admits, no self-suppression") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-chaos").toString
    def docs(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
        .withColumn("ingest_ts", to_timestamp(lit("2025-10-08 10:00:00")))
    def land(rows: Seq[(Long, String)], sub: String, bumpMs: Long): Unit = {
      docs(rows).coalesce(1).write.json(s"$dir/land/$sub")
      val now = System.currentTimeMillis()
      Files.walk(java.nio.file.Paths.get(s"$dir/land/$sub")).forEach { p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(now + bumpMs))
      }
    }
    land(Seq(1L -> "chaos alpha body", 2L -> "chaos beta body"), "f1", 0L)
    land(Seq(3L -> "chaos alpha body", 4L -> "chaos gamma body"), "f2", 60000L)
    val histDir = s"$dir/history"
    val ckpt    = s"$dir/ckpt"

    // wrap the REAL sink: the first delivery of batch 0 completes its
    // index append, then the query dies BEFORE the batch can commit —
    // the exact torn state a crash between table write and checkpoint
    // commit leaves behind
    val real = DocStream.bloomGatedBatchSink(histDir)
    @volatile var crashed = false
    val chaotic: (org.apache.spark.sql.DataFrame, Long) => Unit = { (b, id) =>
      real(b, id)
      if (id == 0L && !crashed) {
        crashed = true
        throw new RuntimeException("injected: died after index append")
      }
    }
    val q1 = DocStream.readDocStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1)
      .writeStream.option("checkpointLocation", ckpt).foreachBatch(chaotic).start()
    val died = intercept[Throwable] { q1.processAllAvailable(); q1.awaitTermination() }
    assert(String.valueOf(died.getMessage).contains("injected") ||
      Option(died.getCause).exists(c => String.valueOf(c.getMessage).contains("injected")))
    q1.stop()
    // the append DID land before the crash — batch 0's partition exists
    assert(spark.read.parquet(histDir).filter(col("batch_id") === 0).count() === 2)

    // restart on the same checkpoint: batch 0 is redelivered (offset
    // logged, never committed) and must overwrite itself in place,
    // then batch 1 gates against it normally
    val q2 = DocStream.startBloomGatedIngest(
      DocStream.readDocStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1), histDir, ckpt)
    q2.processAllAvailable(); q2.stop()
    val hist = spark.read.parquet(histDir)
    assert(hist.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    assert(hist.count() === 3) // exactly once each: no double-append, no drop
    assert(hist.filter(col("batch_id") === 0).count() === 2)
  }

  test("driftMonitor: off-profile source alerts, in-profile source does not, oov share exact") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-drift").toString
    // reference corpus: the vocabulary live traffic SHOULD look like
    val ref = Seq("the data value table row", "the value row data the")
      .toDF("text")
    val refProfile = graft.operators.TextAnalysis.tokenProfile(ref, col("text"))
    // source s0 speaks the reference language; s1 is pure OOV gibberish
    Seq(
      (0L, "the data value row", "en", "s0", "2025-10-08 10:00:00"),
      (1L, "table the value data", "en", "s0", "2025-10-08 10:00:30"),
      (2L, "zzq qqx vvk bbn", "en", "s1", "2025-10-08 10:00:40"))
      .toDF("doc_id", "text", "lang", "source", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
      .coalesce(1).write.json(s"$dir/land/f1")
    val q = DocStream.driftMonitor(
      DocStream.readDocStream(spark, s"$dir/land/*"),
      refProfile, windowDur = "5 minutes", alertBelowPpm = 1000L)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("drift_out")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("mean_ref_ppm"), r.getAs[Long]("oov_ppm"), r.getAs[Boolean]("alert"))).toMap
    val (s0Mean, s0Oov, s0Alert) = out("s0")
    val (s1Mean, s1Oov, s1Alert) = out("s1")
    assert(!s0Alert && s0Oov == 0L && s0Mean > 1000L)
    assert(s1Alert && s1Mean == 0L && s1Oov == 1000000L)
  }

  test("heavyHitterMonitor: depth mass equals occurrences; a batch probe of the stream's sketch is exact on a tiny vocab") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-cms").toString
    // token stream: x ×3, y ×1, z ×1 inside one 5-minute window
    Seq(
      (0L, "x x y", "en", "s0", "2025-10-08 10:00:00"),
      (1L, "x z", "en", "s0", "2025-10-08 10:00:30"))
      .toDF("doc_id", "text", "lang", "source", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
      .coalesce(1).write.json(s"$dir/land/f1")
    val q = DocStream.heavyHitterMonitor(
      DocStream.readDocStream(spark, s"$dir/land/*"), windowDur = "5 minutes")
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val counters = spark.table("hh_out")
      .collect().map(r => (r.getAs[Int]("j"), r.getAs[Long]("b")) -> r.getAs[Long]("c")).toMap
    // every occurrence lands in exactly ONE bucket per depth
    (0 until 4).foreach { j =>
      assert(counters.collect { case ((`j`, _), c) => c }.sum === 5L, s"depth $j mass")
    }
    // batch-side probe of the STREAM's sketch (same cmsBuckets
    // definition): min over depths == exact count on this tiny vocab
    val probe = Seq("x", "y", "z").toDF("t")
      .select(col("t"), graft.operators.TextAnalysis.cmsTokenHash(col("t")).as("hp"))
      .select(col("t"), explode(graft.operators.TextAnalysis.cmsBuckets(col("hp"), 4, 512)).as("jb"))
      .collect().map(r => r.getAs[String]("t") ->
        ((r.getAs[org.apache.spark.sql.Row]("jb").getAs[Int]("j"),
          r.getAs[org.apache.spark.sql.Row]("jb").getAs[Long]("b"))))
    val est = probe.groupBy(_._1).map { case (t, rows) =>
      t -> rows.map { case (_, jb) => counters.getOrElse(jb, 0L) }.min
    }
    assert(est === Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
  }

  test("distinctTokenMonitor: stream registers equal the batch hllBucketRho registers on the same window") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-hll").toString
    Seq(
      (0L, "alpha beta gamma alpha", "en", "s0", "2025-10-08 10:00:00"),
      (1L, "delta beta epsilon", "en", "s0", "2025-10-08 10:00:30"))
      .toDF("doc_id", "text", "lang", "source", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
      .coalesce(1).write.json(s"$dir/land/f1")
    val q = DocStream.distinctTokenMonitor(
      DocStream.readDocStream(spark, s"$dir/land/*"), windowDur = "5 minutes")
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamRegs = spark.table("hll_out")
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Int]("register")).toMap
    // batch side: the SAME hllBucketRho definition over the same tokens
    val batchRegs = Seq("alpha", "beta", "gamma", "delta", "epsilon").toDF("t")
      .select(graft.operators.Profile.hllBucketRho(
        graft.functions.Portable.hash60(col("t")), 8).as("br"))
      .groupBy(col("br.b").as("b")).agg(max(col("br.rho")).as("register"))
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Int]("register")).toMap
    assert(streamRegs === batchRegs)
    assert(streamRegs.size <= 5 && streamRegs.nonEmpty) // <= 2^p, one per hit bucket
    streamRegs.values.foreach(r => assert(r >= 1 && r <= 53))
  }

  test("domainCellMonitor: a window's streamed partials equal the batch (source, cell) relation") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-mix").toString
    val rows = Seq(
      (0L, "alpha beta gamma alpha", "en", "s0", "2025-10-08 10:00:00"),
      (1L, "delta beta epsilon", "en", "s1", "2025-10-08 10:00:30"),
      (2L, "alpha alpha", "en", "s1", "2025-10-08 10:01:00"))
    rows.toDF("doc_id", "text", "lang", "source", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
      .coalesce(1).write.json(s"$dir/land/f1")
    val q = DocStream.domainCellMonitor(
      DocStream.readDocStream(spark, s"$dir/land/*"), windowDur = "5 minutes")
      .writeStream.format("memory").queryName("mix_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("mix_out").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("b")) -> r.getAs[Long]("cnt"))
      .toMap
    // batch side: the SAME domainCell definition over the same rows —
    // i.e. exactly the relation Profile.domainReweight aggregates first
    val batch = rows.map { case (_, text, _, src, _) => (src, text) }.toDF("source", "text")
      .select(col("source"), explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .select(col("source"), graft.operators.Profile.domainCell(col("t"), 256).as("b"))
      .groupBy(col("source"), col("b")).agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("b")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(streamed === batch)
    assert(streamed.values.sum === 9L) // every token occurrence counted once
  }

  test("lengthSketchMonitor: streamed buckets equal the batch ddBucketKey histogram") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("docstream-ddq").toString
    val texts = Seq(
      "one two three four",                       // 4 tokens
      "a b c d e f g h i j k l m n o p q r s t", // 20 tokens
      "single")                                   // 1 token
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s0", s"2025-10-08 10:0$i:00")
    }.toDF("doc_id", "text", "lang", "source", "ts")
      .withColumn("ingest_ts", to_timestamp(col("ts"))).drop("ts")
      .coalesce(1).write.json(s"$dir/land/f1")
    val q = DocStream.lengthSketchMonitor(
      DocStream.readDocStream(spark, s"$dir/land/*"), windowDur = "15 minutes")
      .writeStream.format("memory").queryName("ddq_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ddq_out").collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Long]("cnt")).toMap
    val batch = Seq(4L, 20L, 1L).toDF("v")
      .select(graft.operators.Profile.ddBucketKey(col("v"), 4).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getAs[Long]("key") -> r.getAs[Long]("cnt")).toMap
    assert(streamed === batch)
    assert(streamed.values.sum === 3L)
  }
}
