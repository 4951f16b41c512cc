package graft.ohlcv

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing = the co-located-join story at 100 TB: both sides
  * pre-hashed into the same bucket layout ⇒ the join plan has NO
  * shuffle exchange. */
class BucketedJoinSpec extends SparkSpec {

  test("join of two same-bucketed tables runs without a shuffle exchange") {
    val tmp = Files.createTempDirectory("graft-bucket").toString
    val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ", "NSE:INFY-EQ"), 30, 1759895100L)
    MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
    val norm = Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw")), "p")

    Storage.writeBucketed(norm, "graft_b1", s"$tmp/b1", buckets = 4)
    Storage.writeBucketed(
      norm.groupBy("symbol_clean").agg(avg("close").as("avg_close")),
      "graft_b2", s"$tmp/b2", buckets = 4, sortCols = Nil)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_b1")
          .join(spark.table("graft_b2"), "symbol_clean")
          .filter(col("close") > col("avg_close"))
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan.take(3000))
        assert(joined.count() > 0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b1")
      spark.sql("DROP TABLE IF EXISTS graft_b2")
    }
  }

  test("IVF layout: a cell-bucketed corpus scan prunes to the probed buckets only") {
    import graft.operators.Similarity
    val tmp = Files.createTempDirectory("graft-ivf").toString
    val e   = graft.Tables.embeddings(spark, sf())
    // assign each vector to its seed cell (the write-time IVF layout)
    val assigned = e.join(
      Similarity.kmeansAssignWith(e, Similarity.seedCentroids(e, 8))
        .select(col("vec_id"), col("cluster_id").as("cell")),
      "vec_id")
    Storage.writeBucketed(
      assigned, "graft_ivf", s"$tmp/ivf", buckets = 8, sortCols = Nil, bucketCol = "cell")
    try {
      // autoBucketedScan (default on) falls back to a plain scan when
      // no JOIN/AGG consumes the bucketing — pin the bucketed scan so
      // the IN filter prunes buckets, as a real probe query would
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val probe = spark.table("graft_ivf").filter(col("cell").isin(2L, 5L))
      probe.collect()
      val scan = probe.queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("SelectedBucketsCount")).getOrElse("")
      // nProbe = 2 of 8 cells → the scan must read 2 of 8 buckets
      assert(scan.contains("SelectedBucketsCount: 2 out of 8"), scan)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS graft_ivf")
    }
  }
}
