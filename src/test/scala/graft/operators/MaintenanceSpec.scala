package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class MaintenanceSpec extends SparkSpec {

  private def fileList(path: String, sub: String): Seq[(String, Long)] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(path, sub))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(f => (f.getPath.getName, f.getModificationTime)).toIndexedSeq.sortBy(_._1)
  }

  test("upsertPartitions: merge semantics + untouched partitions keep their exact files") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert").toString + "/t"
    Seq(
      ("2024-01-01", 1L, "a", 10L), ("2024-01-01", 2L, "b", 10L),
      ("2024-01-02", 3L, "c", 10L),
      ("2024-01-03", 4L, "d", 10L))
      .toDF("day", "id", "payload", "v")
      .write.partitionBy("day").parquet(dir)
    val before = fileList(dir, "day=2024-01-03")

    // update id=1 (newer), stale-update id=2 (older version loses),
    // insert id=9, all in existing or new partitions; day=2024-01-03 untouched
    val updates = Seq(
      ("2024-01-01", 1L, "a2", 20L),
      ("2024-01-01", 2L, "stale", 5L),
      ("2024-01-02", 9L, "new", 20L),
      ("2024-01-04", 10L, "fresh", 20L))
      .toDF("day", "id", "payload", "v")
    val touched = Maintenance.upsertPartitions(spark, dir, updates, "day", Seq("id"), "v")
    assert(touched.map(_.toString).sorted === Seq("2024-01-01", "2024-01-02", "2024-01-04"))

    val got = spark.read.parquet(dir)
      .select("id", "payload", "v").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) === (("a2", 20L)))     // newer version wins
    assert(got(2L) === (("b", 10L)))      // stale update loses
    assert(got(3L) === (("c", 10L)))      // untouched partition intact
    assert(got(9L) === (("new", 20L)))    // insert into existing partition
    assert(got(10L) === (("fresh", 20L))) // new partition created
    // the untouched partition's FILES are byte-identical (same names, same mtimes)
    assert(fileList(dir, "day=2024-01-03") === before)
  }

  test("upsertPartitions: updates win version ties") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_tie").toString + "/t"
    Seq(("p1", 1L, "old", 10L)).toDF("day", "id", "payload", "v")
      .write.partitionBy("day").parquet(dir)
    Maintenance.upsertPartitions(
      spark, dir,
      Seq(("p1", 1L, "tied", 10L)).toDF("day", "id", "payload", "v"),
      "day", Seq("id"), "v")
    assert(spark.read.parquet(dir).select("payload").as[String].collect().toSeq === Seq("tied"))
  }

  test("upsertPartitions composite key: only touched (day, sym) tuples rewritten; other symbol same day untouched") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_comp").toString + "/t"
    Seq(
      ("2024-01-01", "A", 1L, "a", 10L),
      ("2024-01-01", "B", 2L, "b", 10L),
      ("2024-01-02", "A", 3L, "c", 10L))
      .toDF("day", "sym", "id", "payload", "v")
      .write.partitionBy("day", "sym").parquet(dir)
    val beforeB  = fileList(dir, "day=2024-01-01/sym=B")
    val beforeA2 = fileList(dir, "day=2024-01-02/sym=A")

    // touches ONLY the (2024-01-01, A) tuple — same-day symbol B and
    // same-symbol other-day partitions must keep their exact files
    val touched = Maintenance.upsertPartitions(
      spark, dir,
      Seq(("2024-01-01", "A", 1L, "a2", 20L)).toDF("day", "sym", "id", "payload", "v"),
      Seq("day", "sym"), Seq("id"), "v")
    assert(touched === Seq(Seq("2024-01-01", "A")))

    val got = spark.read.parquet(dir)
      .select("id", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
    assert(fileList(dir, "day=2024-01-01/sym=B") === beforeB)
    assert(fileList(dir, "day=2024-01-02/sym=A") === beforeA2)
  }

  test("compactPartitions: only fragmented partitions rewritten, contents preserved") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    // fragmented partition: 8 files; compact partition: 1 file
    (0L until 80L).map(i => ("hot", i)).toDF("part", "id")
      .repartition(8).write.partitionBy("part").parquet(dir)
    (0L until 10L).map(i => ("cold", i)).toDF("part", "id")
      .coalesce(1).write.mode("append").partitionBy("part").parquet(dir)

    val coldBefore = fileList(dir, "part=cold")
    val statsBefore = Maintenance.partitionFileStats(spark, dir, "part")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_files")).toMap
    assert(statsBefore("hot") === 8L && statsBefore("cold") === 1L)

    val done = Maintenance.compactPartitions(
      spark, dir, "part", maxFiles = 4, targetBytes = 1L << 30)
      .collect().map(r => (r.getString(0), r.getAs[Long]("files_target"))).toMap
    assert(done === Map("hot" -> 1L)) // only the fragmented partition, to 1 file

    val statsAfter = Maintenance.partitionFileStats(spark, dir, "part")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_files")).toMap
    assert(statsAfter("hot") === 1L)
    assert(fileList(dir, "part=cold") === coldBefore) // cold partition untouched
    // contents identical after rewrite
    val ids = spark.read.parquet(dir).filter(col("part") === "hot")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === (0L until 80L).toSeq)
  }

  test("compactPartitions composite key: only the fragmented (day, sym) tuple rewritten") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact_comp").toString + "/t"
    // fragmented tuple (d1, A): 6 files; compact tuples: 1 file each
    (0L until 60L).map(i => ("d1", "A", i)).toDF("day", "sym", "id")
      .repartition(6).write.partitionBy("day", "sym").parquet(dir)
    (0L until 10L).map(i => ("d1", "B", i)).toDF("day", "sym", "id")
      .coalesce(1).write.mode("append").partitionBy("day", "sym").parquet(dir)
    (0L until 10L).map(i => ("d2", "A", i)).toDF("day", "sym", "id")
      .coalesce(1).write.mode("append").partitionBy("day", "sym").parquet(dir)

    val beforeB  = fileList(dir, "day=d1/sym=B")
    val beforeD2 = fileList(dir, "day=d2/sym=A")
    val stats = Maintenance.partitionFileStats(spark, dir, Seq("day", "sym"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_files")).toMap
    assert(stats === Map("day=d1/sym=A" -> 6L, "day=d1/sym=B" -> 1L, "day=d2/sym=A" -> 1L))

    val done = Maintenance.compactPartitions(
      spark, dir, Seq("day", "sym"), maxFiles = 4, targetBytes = 1L << 30)
      .collect().map(r => (r.getString(0), r.getAs[Long]("files_target"))).toMap
    assert(done === Map("day=d1/sym=A" -> 1L))

    val after = Maintenance.partitionFileStats(spark, dir, Seq("day", "sym"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_files")).toMap
    assert(after("day=d1/sym=A") === 1L)
    assert(fileList(dir, "day=d1/sym=B") === beforeB)   // same day, other symbol untouched
    assert(fileList(dir, "day=d2/sym=A") === beforeD2)  // same symbol, other day untouched
    val ids = spark.read.parquet(dir)
      .filter(col("day") === "d1" && col("sym") === "A")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids === (0L until 60L).toSeq)
  }

  test("bounded planning at thousands of partitions: census is distributed, planner drains worst-first up to the cap") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact_cap").toString + "/t"
    val n = 2048
    (0 until n).map(i => (f"p$i%04d", i.toLong)).toDF("part", "id")
      .repartition(32, col("part"))
      .write.partitionBy("part").parquet(dir)
    // fragment six partitions with a second file each
    (0 until 6).map(i => (f"p$i%04d", (10000 + i).toLong)).toDF("part", "id")
      .repartition(6, col("part"))
      .write.mode("append").partitionBy("part").parquet(dir)

    // the census is a DataFrame (never a forced driver collection) and
    // covers every leaf
    val census = Maintenance.partitionFileStats(spark, dir, "part")
    assert(census.count() === n.toLong)
    assert(census.filter(col("n_files") > 1).count() === 6L)

    // cap 3 < 6 offenders: the planner materializes/rewrites only the
    // worst 3 (all tie at 2 files -> partition-asc tiebreak); the rest
    // wait for the next run
    val done = Maintenance.compactPartitions(
      spark, dir, "part", maxFiles = 1, targetBytes = 1L << 30, maxPartitionsPerRun = 3)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(done === Seq("p0000", "p0001", "p0002"))
    val after = Maintenance.partitionFileStats(spark, dir, "part")
      .filter(col("n_files") > 1)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(after === Seq("p0003", "p0004", "p0005")) // backlog intact for run 2
  }

  test("upsertPartitions: partition fan-out beyond the pruning-predicate budget is rejected loudly") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert_fanout").toString + "/t"
    Seq(("d0", 0L, "x", 1L)).toDF("day", "id", "payload", "v")
      .write.partitionBy("day").parquet(dir)
    val wide = (0 until Maintenance.MaxUpsertPartitionFanout + 1)
      .map(i => (f"d$i%05d", i.toLong, "y", 2L)).toDF("day", "id", "payload", "v")
    val e = intercept[IllegalArgumentException](
      Maintenance.upsertPartitions(spark, dir, wide, "day", Seq("id"), "v"))
    assert(e.getMessage.contains("split the batch"))
  }
}
