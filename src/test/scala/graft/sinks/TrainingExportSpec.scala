package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TrainingExportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(parts: Int) =
    spark.range(0, 200)
      .repartition(parts)
      .select(
        col("id").as("doc_id"),
        concat(lit("document body "), col("id")).as("text"),
        (col("id") % 3).cast("string").as("source"))

  test("writeJsonlShards: every doc exactly once, shards deterministic across input partitionings") {
    val out = Files.createTempDirectory("graft-export").toString
    TrainingExport.writeJsonlShards(corpus(3), col("doc_id"), shards = 4, s"$out/a")
    TrainingExport.writeJsonlShards(corpus(11), col("doc_id"), shards = 4, s"$out/b")

    val a = spark.read.text(s"$out/a").collect().map(_.getString(0)).sorted
    val b = spark.read.text(s"$out/b").collect().map(_.getString(0)).sorted
    assert(a.length === 200)
    assert(a.toSeq === b.toSeq, "shard content must not depend on input partitioning")

    // partition layout: exactly the 4 shard dirs
    val dirs = new java.io.File(s"$out/a").listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("shard=0", "shard=1", "shard=2", "shard=3"))

    // every doc exactly once, payload round-trips
    val parsed = spark.read.json(s"$out/a")
    assert(parsed.select("doc_id").distinct().count() === 200)
    assert(parsed.filter(col("text") === "document body 7").count() === 1)
  }

  test("jsonlLines: in-shard order follows pos and is a permutation (not input order)") {
    val lines = TrainingExport.jsonlLines(corpus(5), col("doc_id"), 2, "shuf")
    val byShard = lines.collect().map(_.getString(1))
    // pos strictly increasing within each output partition slice per shard
    val parsed = spark.read.json(lines.select("value").as[String])
    val shard0 = TrainingExport.jsonlLines(corpus(5), col("doc_id"), 2, "shuf")
      .filter(col("shard") === 0).collect().map(_.getString(1))
    val pos0 = shard0.map(l => l.split("\"pos\":")(1).takeWhile(_.isDigit).toLong)
    assert(pos0.toSeq === pos0.sorted.toSeq && pos0.head === 1L)
    // shuffled: the doc ids in pos order are not simply ascending
    val ids0 = parsed.filter(col("pos") <= 50).orderBy("pos").select("doc_id")
      .collect().map(_.getLong(0))
    assert(ids0.toSeq !== ids0.sorted.toSeq, "export order should be a shuffle, not input order")
    assert(byShard.nonEmpty)
  }

  test("payload columns named shard/doc_id survive; pos and __-names are rejected loudly") {
    // a payload column literally named `shard` must serialize ITS value
    // into the JSON and not collide with the export's shard column
    val withShard = corpus(3).withColumn("shard", lit("payload-shard"))
    val lines = TrainingExport.jsonlLines(withShard, col("doc_id"), 2, "shuf")
    assert(lines.schema.fieldNames.toSeq === Seq("shard", "value"))
    val parsed = spark.read.json(lines.select("value").as[String])
    assert(parsed.filter(col("shard") === "payload-shard").count() === 200)

    val ePos = intercept[IllegalArgumentException] {
      TrainingExport.jsonlLines(corpus(3).withColumn("pos", lit(1)), col("doc_id"), 2, "shuf")
    }
    assert(ePos.getMessage.contains("pos"))
    val eInternal = intercept[IllegalArgumentException] {
      TrainingExport.jsonlLines(corpus(3).withColumn("__did", lit(1)), col("doc_id"), 2, "shuf")
    }
    assert(eInternal.getMessage.contains("__did"))
  }
}
