package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class UrlStreamSpec extends SparkSpec {
  import spark.implicits._

  private def urls(rows: Seq[(Long, String)]) =
    rows.toDF("url_id", "url")
      .withColumn("ingest_ts", to_timestamp(lit("2025-10-08 10:00:00")))

  private def index(hist: String): Map[Long, String] =
    spark.read.parquet(hist).select("url_id", "canonical_url")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("frontierGatedBatchSink: within-batch canonical collapse, growing cross-run gate, replay-safe") {
    val hist = Files.createTempDirectory("urlstream").toString + "/index"
    val sink = UrlStream.frontierGatedBatchSink(hist)

    // batch 0: three spellings of ONE page + one distinct page —
    // the canonical collapse admits the min-id spelling only
    sink(urls(Seq(
      10L -> "https://a.com/p?b=2&a=1",
      11L -> "HTTPS://A.com:443/p?a=1&b=2&utm_source=x",
      12L -> "https://a.com/p?a=1&b=2#frag",
      13L -> "http://b.com/q")), 0L)
    assert(index(hist) === Map(
      10L -> "https://a.com/p?a=1&b=2",
      13L -> "http://b.com/q"))

    // batch 1: yet another spelling of the scheduled page (dropped by
    // the index gate) + a novel page (admitted)
    sink(urls(Seq(
      20L -> "https://a.com:443/p?a=1&b=2", // already scheduled → dropped
      21L -> "c.com/r")), 1L)               // scheme-less novel → admitted
    assert(index(hist) === Map(
      10L -> "https://a.com/p?a=1&b=2",
      13L -> "http://b.com/q",
      21L -> "http://c.com/r"))

    // REPLAY of batch 1: own partition invisible to the gate,
    // overwritten in place — same admit set, no duplicate rows
    sink(urls(Seq(
      20L -> "https://a.com:443/p?a=1&b=2",
      21L -> "c.com/r")), 1L)
    assert(index(hist).keySet === Set(10L, 13L, 21L))
    assert(spark.read.parquet(hist).count() === 3)

    // batch 2 gates against batch 1's admits too (the GROWING contract)
    sink(urls(Seq(
      30L -> "//c.com/r",                   // protocol-relative dup of 21 → dropped
      31L -> "https://d.com/s")), 2L)
    assert(spark.read.parquet(hist).filter(col("batch_id") === 2)
      .select("url_id").collect().map(_.getLong(0)).toSet === Set(31L))
  }

  test("streaming end-to-end: file-source frontier ingest with checkpoint") {
    val dir = Files.createTempDirectory("urlstream-e2e").toString
    def land(rows: Seq[(Long, String)], sub: String, bumpMs: Long): Unit = {
      urls(rows).coalesce(1).write.json(s"$dir/land/$sub")
      val now  = System.currentTimeMillis()
      val walk = Files.walk(java.nio.file.Paths.get(s"$dir/land/$sub"))
      try walk.forEach(p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(now + bumpMs)))
      finally walk.close()
    }
    land(Seq(1L -> "https://x.com/a", 2L -> "https://x.com/b"), "f1", 0L)
    land(Seq(3L -> "HTTPS://X.com/a?utm_source=t", 4L -> "https://x.com/c"), "f2", 60000L)
    val q = UrlStream.startFrontierIngest(
      UrlStream.readUrlStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1),
      s"$dir/index", s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    assert(index(s"$dir/index").keySet === Set(1L, 2L, 4L)) // 3 is a dup of 1
  }
}
