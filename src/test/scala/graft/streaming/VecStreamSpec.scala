package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VecStreamSpec extends SparkSpec {

  // two well-separated seed cells: x-axis and y-axis
  private lazy val codebook = {
    val s = spark; import s.implicits._
    Similarity.seedCentroids(
      Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding"), 2)
      .cache()
  }

  private def vecs(rows: Seq[(Long, Array[Float])]) = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
      .withColumn("label", lit(0L))
      .withColumn("ingest_ts", to_timestamp(lit("2025-10-08 10:00:00")))
  }

  test("semDedupGatedBatchSink: within-batch dedup + growing cross-run gate, replay-safe") {
    val dir = Files.createTempDirectory("vecstream").toString
    val hist = s"$dir/index"
    val sink = VecStream.semDedupGatedBatchSink(hist, codebook, tau = 0.9)

    // batch 0: two distinct directions PLUS a within-batch near-dup of
    // the first — the dup is collapsed before anything lands
    sink(vecs(Seq(
      10L -> Array(1.0f, 0.02f),
      11L -> Array(0.02f, 1.0f),
      12L -> Array(0.99f, 0.05f))), 0L) // within-batch dup of 10
    val b0 = spark.read.parquet(hist).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(b0 === Set(10L, 11L))

    // batch 1: near-dup of an INDEX member (dropped) + novel diagonal-ish
    // direction in cell 0 (kept)
    sink(vecs(Seq(
      20L -> Array(1.0f, 0.01f),   // semantic dup of 10 → dropped
      21L -> Array(0.8f, 0.55f))), 1L) // cell 0 but cos vs 10 ≈ 0.82 < 0.9 → kept
    val b1 = spark.read.parquet(hist).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(b1 === Set(10L, 11L, 21L))

    // REPLAY of batch 1: own partition invisible to the gate,
    // overwritten in place — same admit set, no double rows
    sink(vecs(Seq(
      20L -> Array(1.0f, 0.01f),
      21L -> Array(0.8f, 0.55f))), 1L)
    val replay = spark.read.parquet(hist)
    assert(replay.select("vec_id").collect().map(_.getLong(0)).toSet === Set(10L, 11L, 21L))
    assert(replay.count() === 3)

    // batch 2 gates against batch 1's admit too (the GROWING contract)
    sink(vecs(Seq(
      30L -> Array(0.81f, 0.54f),  // dup of 21 → dropped
      31L -> Array(0.02f, -1.0f))), 2L) // novel
    assert(spark.read.parquet(hist).filter(col("batch_id") === 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet === Set(31L))

    // stream/batch agreement: the cross-run gate is the SAME operator
    // the batch path runs (one definition of "semantic duplicate")
    val batchVerdicts = Similarity.semDedupAgainstIndex(
      vecs(Seq(20L -> Array(1.0f, 0.01f), 21L -> Array(0.8f, 0.55f))),
      spark.read.parquet(hist).filter(col("batch_id") === 0).select("vec_id", "embedding"),
      codebook, tau = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("verdict")).toMap
    assert(batchVerdicts === Map(20L -> "drop_semantic", 21L -> "keep"))
  }

  test("startSemDedupIngest end-to-end: two landed files, cross-batch semantic dup suppressed") {
    val dir = Files.createTempDirectory("vecstream-e2e").toString
    def land(rows: Seq[(Long, Array[Float])], sub: String, bumpMs: Long): Unit = {
      vecs(rows).coalesce(1).write.json(s"$dir/land/$sub")
      val now = System.currentTimeMillis()
      Files.walk(java.nio.file.Paths.get(s"$dir/land/$sub")).forEach { p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(now + bumpMs))
      }
    }
    land(Seq(40L -> Array(1.0f, 0.03f), 41L -> Array(0.03f, 1.0f)), "f1", 0L)
    land(Seq(42L -> Array(1.0f, 0.02f), 43L -> Array(-1.0f, 0.1f)), "f2", 60000L)
    val q = VecStream.startSemDedupIngest(
      VecStream.readVecStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1),
      s"$dir/index", s"$dir/ckpt", codebook, tau = 0.9)
    q.processAllAvailable(); q.stop()
    val ids = spark.read.parquet(s"$dir/index").select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(40L, 41L, 43L)) // 42 re-lands 40's direction across batches
  }

  test("cellDriftMonitor: live cell shares vs training baseline in exact ppm; shifted distribution alerts") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("vecstream-drift").toString
    // training corpus: balanced 2+2 across the two cells → 50/50 baseline
    val static = Seq(
      (100L, Array(1.0f, 0.01f)), (101L, Array(0.99f, 0.02f)),
      (102L, Array(0.01f, 1.0f)), (103L, Array(0.02f, 0.99f)))
      .toDF("vec_id", "embedding")
    val baseline = VecStream.cellBaseline(static, codebook)
    assert(baseline.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(0L -> 500000L, 1L -> 500000L))

    // live traffic: 3 x-ish + 1 y-ish in one window → 75/25, both
    // cells shifted by 250000 ppm ≥ the 200000 alert bar
    vecs(Seq(
      0L -> Array(1.0f, 0.0f), 1L -> Array(0.9f, 0.1f),
      2L -> Array(0.95f, 0.05f), 3L -> Array(0.0f, 1.0f)))
      .coalesce(1).write.json(s"$dir/land/f1")
    val q = VecStream.cellDriftMonitor(
      VecStream.readVecStream(spark, s"$dir/land/*"), codebook, baseline,
      alertBeyondPpm = 200000L)
      .writeStream.format("memory").queryName("vec_drift")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("vec_drift").collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("live_ppm"),
          r.getAs[Long]("baseline_ppm"), r.getAs[Boolean]("alert"))).toMap
    assert(out(0L) === ((3L, 750000L, 500000L, true)))
    assert(out(1L) === ((1L, 250000L, 500000L, true)))
  }

  test("cellDriftMonitor: zero-norm vectors excluded (shares stay a true partition); restart-on-refresh contract via codebook_version") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("vecstream-drift2").toString
    val baseline = VecStream.cellBaseline(
      Seq((100L, Array(1.0f, 0.01f)), (101L, Array(0.01f, 1.0f)))
        .toDF("vec_id", "embedding"),
      codebook)
    // a zero-norm TRAINING vector must not skew the baseline either —
    // same population rule on both sides of the drift comparison (it
    // would otherwise silently land in the lowest cell via the max_by
    // tie-break and fabricate a permanent drift delta)
    val baselineWithZero = VecStream.cellBaseline(
      Seq((100L, Array(1.0f, 0.01f)), (101L, Array(0.01f, 1.0f)),
        (102L, Array(0.0f, 0.0f)))
        .toDF("vec_id", "embedding"),
      codebook)
    assert(
      baselineWithZero.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        === Map(0L -> 500000L, 1L -> 500000L))
    // 2 x-ish + 1 y-ish + 1 ZERO vector: the zero vector has no cosine
    // to anything — it must appear in neither the total nor any cell,
    // so shares are 666666/333333 over n=3 (not n=4 summing to 750k)
    vecs(Seq(
      0L -> Array(1.0f, 0.0f), 1L -> Array(0.9f, 0.1f),
      2L -> Array(0.0f, 1.0f), 3L -> Array(0.0f, 0.0f)))
      .coalesce(1).write.json(s"$dir/land/f1")
    def run(cb: org.apache.spark.sql.DataFrame, version: Long, name: String) = {
      val q = VecStream.cellDriftMonitor(
        VecStream.readVecStream(spark, s"$dir/land/*"), cb, baseline,
        alertBeyondPpm = 200000L, codebookVersion = version)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", s"$dir/ckpt-$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.table(name).collect()
    }
    val v1 = run(codebook, 1L, "vec_drift_v1")
    assert(v1.map(_.getAs[Long]("n_vectors")).sum === 3L)
    assert(v1.map(_.getAs[Long]("live_ppm")).sum === 999999L) // 666666 + 333333
    assert(v1.forall(_.getAs[Long]("codebook_version") === 1L))

    // Refresh the codebook (q158's state→centroids path): the
    // documented contract is restart-on-refresh — a RUNNING monitor
    // keeps its literalized v1 centroids, and staleness is observable
    // because every row carries the build-time version for the serving
    // side to compare. A rebuilt monitor stamps the new version.
    val refreshed = Similarity.centroidsFromState(
      Similarity.codebookState(
        Seq((200L, Array(0.7f, 0.7f)), (201L, Array(0.02f, 1.0f)))
          .toDF("vec_id", "embedding"),
        codebook))
    val v2 = run(refreshed, 2L, "vec_drift_v2")
    assert(v2.forall(_.getAs[Long]("codebook_version") === 2L))
  }

  test("CHAOS: batch dies AFTER its index append; restart redelivers it — no duplicate admits, no self-suppression") {
    val dir = Files.createTempDirectory("vecstream-chaos").toString
    def land(rows: Seq[(Long, Array[Float])], sub: String, bumpMs: Long): Unit = {
      vecs(rows).coalesce(1).write.json(s"$dir/land/$sub")
      val now = System.currentTimeMillis()
      Files.walk(java.nio.file.Paths.get(s"$dir/land/$sub")).forEach { p =>
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(now + bumpMs))
      }
    }
    land(Seq(50L -> Array(1.0f, 0.03f), 51L -> Array(0.03f, 1.0f)), "f1", 0L)
    land(Seq(52L -> Array(1.0f, 0.02f), 53L -> Array(-1.0f, 0.1f)), "f2", 60000L)
    val histDir = s"$dir/index"
    val ckpt    = s"$dir/ckpt"

    // first delivery of batch 0: index append completes, then the
    // query dies BEFORE the batch commits — torn crash state
    val real = VecStream.semDedupGatedBatchSink(histDir, codebook, tau = 0.9)
    @volatile var crashed = false
    val chaotic: (org.apache.spark.sql.DataFrame, Long) => Unit = { (b, id) =>
      real(b, id)
      if (id == 0L && !crashed) {
        crashed = true
        throw new RuntimeException("injected: died after index append")
      }
    }
    val q1 = VecStream.readVecStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1)
      .writeStream.option("checkpointLocation", ckpt).foreachBatch(chaotic).start()
    val died = intercept[Throwable] { q1.processAllAvailable(); q1.awaitTermination() }
    assert(String.valueOf(died.getMessage).contains("injected") ||
      Option(died.getCause).exists(c => String.valueOf(c.getMessage).contains("injected")))
    q1.stop()
    assert(spark.read.parquet(histDir).filter(col("batch_id") === 0).count() === 2)

    // restart on the same checkpoint: batch 0 redelivered and rewritten
    // in place; batch 1 then gates against it (52 drops, 53 admits)
    val q2 = VecStream.startSemDedupIngest(
      VecStream.readVecStream(spark, s"$dir/land/*", maxFilesPerTrigger = 1),
      histDir, ckpt, codebook, tau = 0.9)
    q2.processAllAvailable(); q2.stop()
    val hist = spark.read.parquet(histDir)
    assert(hist.select("vec_id").collect().map(_.getLong(0)).toSet === Set(50L, 51L, 53L))
    assert(hist.count() === 3) // exactly once each across the crash/replay
    assert(hist.filter(col("batch_id") === 0).count() === 2)
  }
}
