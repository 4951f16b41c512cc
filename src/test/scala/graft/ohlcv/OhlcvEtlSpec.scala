package graft.ohlcv

import graft.SparkSpec
import graft.operators.Analytics
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end ETL slice (SURVEY §7.2): mock generator → raw JSON on
  * disk → schema'd read → normalize → partitioned parquet → analytics
  * query — the reference's own canonical demo path.
  */
class OhlcvEtlSpec extends SparkSpec {
  private lazy val tmp = Files.createTempDirectory("graft-etl").toString

  private lazy val symbols = Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ", "NSE:INFY-EQ")
  // 2025-10-08 09:15 IST = 03:45 UTC
  private val t0 = 1759895100L

  test("mock → envelope → readRaw → normalize roundtrip") {
    val mock = MockData.candles(spark, symbols, n = 10, startUnix = t0)
    MockData.envelope(mock, "2025-10-08T03:50:00Z").write.mode("overwrite").json(s"$tmp/raw")

    val raw = RawIngest.readRaw(spark, s"$tmp/raw")
    assert(raw.count() === 1)
    val norm = Normalize.normalize(RawIngest.blocks(raw), processedAt = "2025-10-08T10:30:00Z")
    assert(norm.count() === 30)
    assert(norm.columns.toSeq === OhlcvSchemas.normalized.fieldNames.toSeq)
    val syms = norm.select("symbol_clean").distinct().collect().map(_.getString(0)).toSet
    assert(syms === Set("RELIANCE", "TCS", "INFY"))
    // P9 invariants hold on mock data
    assert(norm.filter(col("high") < col("low") || col("close") <= 0 || col("volume") < 0).count() === 0)
    // P4/P5: calendar parts derive from the timestamp
    val r = norm.filter(col("symbol_clean") === "RELIANCE" && col("timestamp_unix") === t0).collect().head
    assert(r.getAs[Int]("year") === 2025)
    assert(r.getAs[Int]("month") === 10)
    assert(r.getAs[Int]("day") === 8)
    assert(r.getAs[String]("timestamp_iso") === "2025-10-08T03:45:00")
  }

  test("new-format envelope (blocks at top level) parses identically") {
    // rewrite the old-format docs as new-format JSON text
    val old = RawIngest.readRaw(spark, s"$tmp/raw")
    val blocks = RawIngest.blocks(old)
    val oldNorm = Normalize.normalize(blocks, "x").orderBy("symbol_clean", "timestamp_unix")

    // transform the on-disk old-format docs textually:
    // {"data":{BLOCKS},"metadata":{M}} → {BLOCKS,"metadata":{M}}
    import scala.jdk.CollectionConverters._
    val docs = Files.walk(java.nio.file.Paths.get(s"$tmp/raw")).iterator().asScala
      .filter(p => p.toString.endsWith(".json") && Files.isRegularFile(p))
      .map(p => new String(Files.readAllBytes(p)).trim)
      .filter(_.nonEmpty)
      .toSeq
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/raw_new"))
    docs.zipWithIndex.foreach { case (s, i) =>
      val metaIdx = s.indexOf(",\"metadata\"")
      assert(s.startsWith("{\"data\":{") && metaIdx > 0, s"unexpected envelope shape: ${s.take(60)}")
      val blocks = s.substring("{\"data\":{".length, metaIdx - 1) // drop data's closing }
      val doc    = "{" + blocks + s.substring(metaIdx)
      Files.write(java.nio.file.Paths.get(s"$tmp/raw_new/doc$i.json"), doc.getBytes)
    }

    val newNorm = Normalize.normalize(
      RawIngest.readRawNewFormat(spark, s"$tmp/raw_new"), "x")
      .orderBy("symbol_clean", "timestamp_unix")
    assert(newNorm.count() === oldNorm.count())
    assert(newNorm.exceptAll(oldNorm).count() === 0)
  }

  test("partitioned parquet write → partition-pruned read → symbolStats") {
    val raw  = RawIngest.readRaw(spark, s"$tmp/raw")
    val norm = Normalize.normalize(RawIngest.blocks(raw), "2025-10-08T10:30:00Z")
    Storage.writeParquet(norm, s"$tmp/table", mode = "overwrite")

    val back = Storage.readParquet(spark, s"$tmp/table")
    assert(back.count() === 30)
    // partition pruning visible in the plan when filtering partition cols
    val pruned = back.filter(col("symbol_clean") === "RELIANCE" && col("day") === 8)
    assert(pruned.count() === 10)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))

    val stats = Analytics.symbolStats(
      Normalize.asCandles(back), "RELIANCE", "2025-10-08", col("fetch_timestamp")).collect()
    assert(stats.length === 1)
    assert(stats.head.getAs[Long]("num_records") === 10)
  }

  test("partitioned ORC write → round trip + partition pruning (parquet sibling)") {
    val raw  = RawIngest.readRaw(spark, s"$tmp/raw")
    val norm = Normalize.normalize(RawIngest.blocks(raw), "2025-10-08T10:30:00Z")
    Storage.writeOrc(norm, s"$tmp/orc_table", mode = "overwrite")

    val back = Storage.readOrc(spark, s"$tmp/orc_table")
    assert(back.count() === norm.count())
    // identical logical content to the parquet path (modulo row order)
    assert(back.select(norm.columns.map(col): _*).exceptAll(norm).count() === 0)
    val pruned = back.filter(col("symbol_clean") === "RELIANCE" && col("day") === 8)
    assert(pruned.count() === 10)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("P17: recency filter skips stale files at listing time; newest-K cap composes") {
    // flat landing layout — one json file per fetch, exactly what
    // HttpIngest.ingestOnce produces (write via staging dir, then move
    // the part file up as a flat landing file)
    val dir = s"$tmp/recency"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val mock = MockData.candles(spark, symbols, n = 2, startUnix = t0)
    Seq("f1", "f2", "f3").foreach { f =>
      val stage = s"$tmp/recency-stage/$f"
      MockData.envelope(mock, s"2025-10-08T04:00:00Z").coalesce(1).write.json(stage)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(stage))
        .filter(p => p.getFileName.toString.endsWith(".json")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$dir/$f.json"))
    }
    // stagger modification times: f1 oldest … f3 newest
    val now = System.currentTimeMillis()
    Seq("f1" -> 0L, "f2" -> 60000L, "f3" -> 120000L).foreach { case (f, bump) =>
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(s"$dir/$f.json"),
        java.nio.file.attribute.FileTime.fromMillis(now + bump))
    }
    def distinctSources(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("source_file").distinct().collect()
        .map(_.getString(0)).map(s => Seq("f1", "f2", "f3").find(s.contains).get).toSet

    // recency alone: cutoff between f1 and f2 keeps the two newer files
    val cutoff = java.time.Instant.ofEpochMilli(now + 30000L).toString
    val recent = Storage.readRecentRaw(spark, dir, modifiedAfterIso = Some(cutoff))
    assert(distinctSources(recent) === Set("f2", "f3"))
    // cap alone: newest 2 of 3
    val capped = Storage.readRecentRaw(spark, dir, capNewest = Some(2))
    assert(distinctSources(capped) === Set("f2", "f3"))
    // composed: cutoff excludes f1, cap 1 keeps only the newest
    val both = Storage.readRecentRaw(
      spark, dir, modifiedAfterIso = Some(cutoff), capNewest = Some(1))
    assert(distinctSources(both) === Set("f3"))
    // cutoff in the future + cap → empty frame with the right schema
    val none = Storage.readRecentRaw(
      spark, dir,
      modifiedAfterIso = Some(java.time.Instant.ofEpochMilli(now + 999999L).toString),
      capNewest = Some(5))
    assert(none.count() === 0 && none.columns.contains("source_file"))
    // the recency path feeds the SAME normalize as every other scan
    assert(Normalize.normalize(RawIngest.blocks(both), "p").count() === 6)

    // newestInventory (the /files bounded-heap walk) agrees with the
    // full sort-then-take inventory at every k, filters included
    val conf = spark.sparkContext.hadoopConfiguration
    val full = Storage.fileInventory(conf, dir)
    (1 to 4).foreach { k =>
      assert(Storage.newestInventory(conf, dir, k) === full.take(k), s"k=$k")
    }
    assert(Storage.newestInventory(conf, dir, 2, modifiedAfterIso = Some(cutoff))
      === Storage.fileInventory(conf, dir, Some(cutoff)).take(2))
    assert(Storage.newestInventory(conf, dir, 3, _.contains("f1")).map(_._1)
      === full.map(_._1).filter(_.contains("f1")))
  }

  test("S6: availableDates lists a symbol's partition dates newest-first from the directory layout only") {
    val dir  = s"$tmp/avail-dates"
    // two days for RELIANCE, one for TCS — via the real ETL write
    val mock = MockData.candles(spark, symbols, n = 2, startUnix = t0)
      .unionByName(
        MockData.candles(spark, Seq("NSE:RELIANCE-EQ"), n = 2, startUnix = t0 + 86400L))
    MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$dir/raw")
    Storage.writeParquet(
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$dir/raw")), "p"),
      s"$dir/table", "overwrite")
    val conf = spark.sparkContext.hadoopConfiguration
    assert(Storage.availableDates(conf, s"$dir/table", "RELIANCE")
      === Seq("2025-10-09", "2025-10-08")) // newest first
    assert(Storage.availableDates(conf, s"$dir/table", "RELIANCE", limit = 1)
      === Seq("2025-10-09"))
    assert(Storage.availableDates(conf, s"$dir/table", "TCS") === Seq("2025-10-08"))
    assert(Storage.availableDates(conf, s"$dir/table", "NOPE") === Seq.empty)
  }

  test("dedup contract: overlapping fetches collapse to latest fetch_timestamp") {
    val m1 = MockData.candles(spark, symbols, n = 5, startUnix = t0)
    // second fetch re-downloads the same window (T4) with same values
    MockData.envelope(m1, "2025-10-08T04:00:00Z").write.mode("overwrite").json(s"$tmp/raw2/a")
    MockData.envelope(m1, "2025-10-08T04:05:00Z").write.mode("overwrite").json(s"$tmp/raw2/b")
    val norm = Normalize.normalize(
      RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw2/*")), "x")
    assert(norm.count() === 30) // 2 files × 15
    val deduped = Storage.dedupContract(norm)
    assert(deduped.count() === 15)
    assert(deduped.select("fetch_timestamp").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("2025-10-08T04:05:00Z"))
  }

  test("csv roundtrip preserves the normalized table") {
    val raw  = RawIngest.readRaw(spark, s"$tmp/raw")
    val norm = Normalize.normalize(RawIngest.blocks(raw), "p")
    Storage.writeCsv(norm, s"$tmp/csv", mode = "overwrite")
    val back = Storage.readCsv(spark, s"$tmp/csv")
    assert(back.count() === norm.count())
    // values survive the text roundtrip
    val a = norm.agg(sum("volume"), sum("close")).collect().head
    val b = back.agg(sum("volume"), sum("close")).collect().head
    assert(a.getLong(0) === b.getLong(0))
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
  }

  test("P12: alias fallback + normalizeFlat mirror the defensive close-only ETL") {
    val s = spark; import s.implicits._
    // all alias columns present; Python-falsy values (empty string,
    // numeric zero) must fall through to the next alias
    val flat = Seq(
      ("", "RELIANCE", 0L, 1759895100L, 0.0, 2875.5, 1200L),
      ("TCS", "", 1759895400L, 0L, 3450.25, 0.0, 0L))
      .toDF("s", "ticker", "ts", "time", "c", "last", "v")
    val out = Normalize.normalizeFlat(flat, "2025-10-08T16:00:00Z")
    assert(out.columns.toSeq ===
      Seq("symbol", "timestamp", "close", "volume", "ingested_at", "year", "month", "day"))
    val rows = out.collect().map(r => r.getAs[String]("symbol") -> r).toMap
    assert(rows.keySet === Set("RELIANCE", "TCS"))
    assert(rows("RELIANCE").getAs[Double]("close") === 2875.5) // c=0.0 → last
    assert(rows("RELIANCE").getAs[Long]("volume") === 1200L)
    assert(rows("RELIANCE").getAs[java.sql.Timestamp]("timestamp").toInstant.getEpochSecond
      === 1759895100L) // ts=0 → time
    assert(rows("RELIANCE").getAs[Int]("year") === 2025)
    assert(rows("RELIANCE").getAs[Int]("day") === 8)
    assert(rows("TCS").getAs[Double]("close") === 3450.25)
    assert(rows("TCS").getAs[Long]("volume") === 0L) // v=0 falsy → default 0

    // string timestamps: ISO parses, ms-epoch heuristic applies,
    // unparseable close / missing symbol reject the row
    val dirty = Seq(
      ("A", "2025-10-08T03:45:00", "12.5", "7"),
      ("B", "1759895100000", "x", "7"), // ms epoch but close unparseable → reject
      ("C", "1759895100000", "9.0", "2.5"), // int('2.5') raises in Python → volume 0
      ("", "2025-10-08T03:45:00", "1.0", "1"), // no symbol → reject
      ("D", "not a time", "1.0", "1"), // unparseable ts → reject
      // parse to DOUBLE but are uncastable/absurd — must reject the
      // row, not throw ANSI CAST_OVERFLOW and kill the job
      ("E", "NaN", "1.0", "1"),
      ("F", "Infinity", "1.0", "1"),
      ("G", "9e306", "1.0", "1"))
      .toDF("symbol", "time", "last", "volume")
    val cleaned = Normalize.normalizeFlat(dirty, "x")
    val got = cleaned.collect().map(r => r.getAs[String]("symbol") -> r).toMap
    assert(got.keySet === Set("A", "C"))
    assert(got("A").getAs[java.sql.Timestamp]("timestamp").toInstant.getEpochSecond
      === 1759894800L + 300L) // 2025-10-08T03:45:00Z
    assert(got("C").getAs[java.sql.Timestamp]("timestamp").toInstant.getEpochSecond
      === 1759895100L) // >1e12 → milliseconds
    assert(got("C").getAs[Long]("volume") === 0L)

    // a well-formed canonical input passes through aliasFallback untouched
    val canon = Seq(("X", 1L, 2.0, 3L)).toDF("symbol", "timestamp", "close", "volume")
    assert(Normalize.aliasFallback(canon).columns.sorted.toSeq ===
      Seq("close", "symbol", "timestamp", "volume"))
  }

  test("S11: metadata row writes and reads back through real JDBC (embedded Derby)") {
    System.setProperty("derby.system.home", tmp) // keep derby.log out of the repo
    val url  = s"jdbc:derby:$tmp/metadb;create=true"
    val raw  = RawIngest.readRaw(spark, s"$tmp/raw")
    val norm = Normalize.normalize(RawIngest.blocks(raw), "p")
    val meta = Storage.rdsMetadata(
      norm, "s3://bucket/ohlcv/", "5", "2025-10-08T10:30:00")
    Storage.writeJdbc(meta, url, "ohlcv_metadata")
    val back = Storage.readJdbc(spark, url, "ohlcv_metadata").collect()
    assert(back.length === 1)
    val r = back.head
    assert(r.getAs[String]("s3_path") === "s3://bucket/ohlcv/")
    assert(r.getAs[Long]("row_count") === 30L)
    assert(r.getAs[Long]("file_size_bytes") === (30 * 0.1 * 1024 * 1024).toLong)
    assert(r.getAs[String]("ingested_at") === "2025-10-08T10:30:00")
    assert(r.getAs[String]("resolution") === "5")
    assert(r.getAs[Long]("symbols_count") === 3L)
    // append mode: a second run adds a second row (glue_job appends)
    Storage.writeJdbc(meta, url, "ohlcv_metadata")
    assert(Storage.readJdbc(spark, url, "ohlcv_metadata").count() === 2)
  }

  test("runMetadata rollup") {
    val raw  = RawIngest.readRaw(spark, s"$tmp/raw")
    val norm = Normalize.normalize(RawIngest.blocks(raw), "p")
    val md = Storage.runMetadata(norm, "test-run").collect().head
    assert(md.getAs[Long]("total_records") === 30)
    assert(md.getAs[Long]("distinct_symbols") === 3)
    assert(md.getAs[String]("job_name") === "test-run")
  }
}

class ApiSpec extends SparkSpec {
  import graft.operators.Dedup

  test("periodToDays reproduces the reference's approximate arithmetic") {
    assert(Api.periodToDays("30d") === 30)
    assert(Api.periodToDays("3m") === 90)
    assert(Api.periodToDays("2y") === 730)
    assert(Api.periodToDays("bogus") === 30)
    // bare-numeric token → int(token) days (api_handler.py:763 `days = int(token)`)
    assert(Api.periodToDays("45") === 45)
    assert(Api.periodToDays("5") === 5)
    // single-char unit, no digits: `int(token[:-1]) if len(token) > 1 else 0`
    assert(Api.periodToDays("d") === 0)
    // digits + unparseable prefix for a known unit → the catch-all 30
    assert(Api.periodToDays("xd") === 30)
  }

  test("intervalToMinutes parses m/h/d tokens") {
    assert(Api.intervalToMinutes("5m") === 5)
    assert(Api.intervalToMinutes("1h") === 60)
    assert(Api.intervalToMinutes("1d") === 1440)
    assert(Api.intervalToMinutes("??") === 5)
    // bare-numeric token → int(token) minutes (api_handler.py:784 `return int(token)`)
    assert(Api.intervalToMinutes("45") === 45)
    assert(Api.intervalToMinutes("15") === 15)
  }

  test("toExchangeSymbol normalizes to NSE:X-EQ (P7), inverse of cleanSymbol (P6)") {
    val s = spark; import s.implicits._
    val in  = Seq("reliance", "NSE:TCS-EQ", "Infy").toDF("sym")
    val out = in.select(Normalize.toExchangeSymbol(col("sym")).as("e")).collect().map(_.getString(0))
    assert(out.toSeq === Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ", "NSE:INFY-EQ"))
    val round = in.select(Normalize.cleanSymbol(Normalize.toExchangeSymbol(col("sym"))).as("c"))
      .collect().map(_.getString(0))
    assert(round.toSeq === Seq("RELIANCE", "TCS", "INFY"))
    // any symbol already carrying an exchange prefix is returned
    // unchanged — normalize_symbol (api_handler.py:592-612) never
    // re-prefixes or suffixes once ':' is present
    val pre = Seq("BSE:X", "BSE:X-EQ", "nse:tcs").toDF("sym")
      .select(Normalize.toExchangeSymbol(col("sym")).as("e")).collect().map(_.getString(0))
    assert(pre.toSeq === Seq("BSE:X", "BSE:X-EQ", "NSE:TCS"))
    // bare name already suffixed -EQ only gains the prefix
    val suf = Seq("tcs-eq").toDF("sym")
      .select(Normalize.toExchangeSymbol(col("sym")).as("e")).collect().map(_.getString(0))
    assert(suf.toSeq === Seq("NSE:TCS-EQ"))
  }

  test("getOhlcv: range filter, dedup, tail-limit, ascending output") {
    val s = spark; import s.implicits._
    val candles = Seq(
      ("A", "2025-10-08 09:15:00", 1.0, 1.0, 1.0, 1.0, 1L, "f1"),
      ("A", "2025-10-08 09:20:00", 2.0, 2.0, 2.0, 2.0, 1L, "f1"),
      ("A", "2025-10-08 09:20:00", 2.5, 2.5, 2.5, 2.5, 1L, "f2"), // dup ts
      ("A", "2025-10-09 09:15:00", 3.0, 3.0, 3.0, 3.0, 1L, "f3"),
      ("B", "2025-10-08 09:15:00", 9.0, 9.0, 9.0, 9.0, 1L, "f1"))
      .toDF("symbol", "tss", "open", "high", "low", "close", "volume", "fetch_timestamp")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")

    val out = Api.getOhlcv(candles, "A", Some("2025-10-08"), Some("2025-10-08"), limit = Some(1))
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("close") === 2.5) // dedup kept f2, tail kept latest
    val all = Api.getOhlcv(candles, "A", None, None, None).collect()
    assert(all.map(_.getAs[Double]("close")).toSeq === Seq(1.0, 2.5, 3.0)) // asc, deduped
  }

  test("getOhlcvResampled buckets by the interval token") {
    val s = spark; import s.implicits._
    val candles = Seq(
      ("A", "2025-10-08 09:15:00", 1.0, 1.5, 0.5, 1.2, 10L, "f1"),
      ("A", "2025-10-08 09:20:00", 1.2, 2.0, 1.0, 1.8, 20L, "f1"),
      ("A", "2025-10-08 10:15:00", 1.8, 2.5, 1.5, 2.0, 30L, "f1"))
      .toDF("symbol", "tss", "open", "high", "low", "close", "volume", "fetch_timestamp")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val out = Api.getOhlcvResampled(candles, "A", None, None, "1h").collect()
    assert(out.length === 2)
    assert(out.head.getAs[Double]("open") === 1.0)
    assert(out.head.getAs[Double]("close") === 1.8)
    assert(out.head.getAs[Double]("volume") === 30.0)
  }

  test("toCsvRows renders the reference's export line format") {
    val s = spark; import s.implicits._
    val candles = Seq(("A", "2025-10-08 09:15:00", 1.0, 1.5, 0.5, 1.2, 10L, "f1"))
      .toDF("symbol", "tss", "open", "high", "low", "close", "volume", "fetch_timestamp")
      .withColumn("ts", to_timestamp(col("tss"))).drop("tss")
    val line = Api.toCsvRows(candles).collect().head.getString(0)
    assert(line === "A,1759914900,2025-10-08T09:15:00Z,1.0,1.5,0.5,1.2,10")
  }
}
