package graft.sinks

import graft.operators.Profile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-corpus delivery: deterministic, globally-shuffled JSONL
  * shards — the artifact a training job actually consumes (one
  * `shard=N/` directory per shard, rows in a reproducible
  * pseudo-random order, one JSON object per line).
  *
  * Built on [[Profile.globalShuffle]]'s contract: shard and in-shard
  * position derive from a portable seeded hash of the doc id — never
  * `rand()` — so the SAME corpus + seed yields byte-identical shards
  * on any cluster size or input partitioning (re-runs are diffable,
  * and a resumed job can re-emit one shard without touching others).
  *
  * Scale shape: one exchange hash-partitioned on shard, one in-shard
  * sort, then a straight text write — exactly the plan a shard writer
  * wants. Each shard is written by one task, so `shards` is the
  * parallelism AND the file-size knob: pick shards ≈ corpus_bytes /
  * target_file_size (e.g. ~250 MB for training loaders). The payload
  * rides the shuffle once; nothing funnels through the driver.
  */
object TrainingExport {

  /** Shuffle `docs` into `shards` deterministic JSONL shards under
    * `outDir/shard=N/`. All non-id payload columns are serialized into
    * each line's JSON object along with the id; `pos` (1-based in-shard
    * order) is included so a reader can verify ordering. */
  def writeJsonlShards(
      docs: DataFrame,
      id: Column,
      shards: Int,
      outDir: String,
      seed: String = "shuf"): Unit =
    jsonlLines(docs, id, shards, seed)
      .write
      .partitionBy("shard")
      .mode("overwrite")
      .text(outDir)

  /** The write's input relation, exposed for tests and for sinks other
    * than the filesystem: (shard, value) with `value` the JSONL line,
    * one partition per shard hash, rows in shard order. */
  private[graft] def jsonlLines(
      docs: DataFrame,
      id: Column,
      shards: Int,
      seed: String): DataFrame = {
    val payloadCols = docs.columns.toSeq
    // Internal shuffle columns use collision-proof __-names so a
    // payload column called `shard` or `pos` can never be silently
    // shadowed by (or shadow) the shuffle's own columns; `pos` is also
    // a JSON key in every output line, so a payload `pos` would write
    // a duplicate key — rejected loudly instead.
    val reserved = payloadCols.filter(c => c == "pos" || c.startsWith("__"))
    require(
      reserved.isEmpty,
      s"payload column(s) ${reserved.mkString(", ")} collide with the export's " +
        "own keys: `pos` is the in-shard-order key in every JSONL line and " +
        "`__`-prefixed names are reserved for shuffle internals — rename them first")
    val order = Profile.globalShuffle(docs, id, shards, seed)
      .select(col("doc_id").as("__did"), col("shard").as("__shard"), col("pos").as("__pos"))
    docs
      .withColumn("__did", id)
      .join(order, Seq("__did"))
      // one partition per shard value (collisions only merge tasks,
      // never split a shard), then in-shard order by pos
      .repartition(shards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__pos"))
      .select(
        col("__shard").as("shard"),
        to_json(struct(col("__pos").as("pos") +: payloadCols.map(col): _*)).as("value"))
  }
}
