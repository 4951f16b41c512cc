package graft

import graft.operators.{Packing, Profile, TextAnalysis, TextDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end TRAINING-DATA CURATION demo — the LLM-pipeline
  * counterpart of [[graft.ohlcv.EtlDemo]]: one command takes a raw
  * document corpus through the full curation lifecycle this library
  * implements (every stage is an oracle-checked operator from the
  * q30–q172 family) and leaves a packed, sharded JSONL training set on
  * disk.
  *
  *   raw docs → exact+near dedup verdicts → heuristic quality gate
  *   → PII redaction → benchmark decontamination → temperature
  *   rebalance → sequence packing → deterministic JSONL shards
  *   → one-line dataset card
  *
  * Usage: `sbt "runMain graft.LlmDemo [sfDir] [outDir]"` (defaults:
  * /root/testdata/sf0.001, a temp dir). Prints one `DEMO` line per
  * stage with surviving doc counts — the q153 funnel, live.
  */
object LlmDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-llm-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    println(s"DEMO stage=raw docs=${docs.count()}")

    // 1. dedup: exact (normalized fingerprint) + near (LSH candidates
    //    rescored with exact Jaccard) → keep one survivor per group
    val shingles = TextDedup.shingleRows(docs, col("doc_id"), col("text"), 3)
    val pairs    = TextDedup.lshRescoredPairs(shingles, estThreshold = 0.5, threshold = 0.8)
    val verdicts = TextDedup.dedupVerdicts(
      docs, col("doc_id"), TextAnalysis.fingerprint(col("text")), pairs)
    val deduped = docs.join(
      verdicts.filter(col("verdict") === "keep").select("doc_id"), Seq("doc_id"), "left_semi")
    println(s"DEMO stage=dedup docs=${deduped.count()}")

    // 2. heuristic quality gate (C4/Gopher-style rules, map-only)
    val gated = deduped.join(
      TextAnalysis.heuristicGate(deduped, col("doc_id"), col("text"), minWords = 10)
        .filter(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    println(s"DEMO stage=quality_gate docs=${gated.count()}")

    // 3. PII redaction — rewrite the text column in place
    val scrubbed = gated.withColumn("text", TextAnalysis.redactPii(col("text")))

    // 4. decontamination: src0 stands in for the eval benchmark —
    //    drop it AND every doc sharing a word-5-gram with it
    val pool  = scrubbed.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val contaminated = TextDedup.contaminationFlags(
      pool, col("doc_id"), col("text"), bench, col("text"), 5)
    val cleanPool = pool.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
    println(s"DEMO stage=decontaminated docs=${cleanPool.count()}")

    // 5. temperature rebalance across sources (α = 0.5, sqrt rates)
    val mixed = Profile.temperatureSample(cleanPool, col("source"), col("doc_id"))
    println(s"DEMO stage=rebalanced docs=${mixed.count()}")
    mixed.groupBy(col("source")).agg(count(lit(1)).as("docs"),
      first(col("sample_rate_bps")).as("rate_bps"))
      .orderBy(col("source")).show(truncate = false)

    // 5b. DoReMi MW step (q190) over the rebalanced pool: the
    //     reweighted domain mixture the NEXT curation round samples
    //     by — rarity-proxy excess loss, one multiplicative-weights
    //     step, exact integer ppm end to end
    println(s"DEMO stage=doremi_weights")
    Profile.domainReweight(mixed, col("source"), col("text"))
      .select(col("source"), col("n_docs"), col("loss_ppm"),
        col("excess_ppm"), col("w0_ppm"), col("w1_ppm"))
      .orderBy(col("source")).show(truncate = false)

    // 5c. the FULL DoReMi loop (q199): two reweight→re-score rounds
    //     over the once-collapsed (source, cell) partials, then the
    //     round-2 mixture REALIZED as an epoch-expanded training list
    //     (reweight → resample, Xie et al.'s loop) — per-round cost is
    //     the bounded partial relation, the realization map-only
    println(s"DEMO stage=doremi_loop rounds=2")
    val doremi = Profile.doremiRounds(mixed, col("source"), col("text"), rounds = 2)
    doremi.orderBy(col("source"), col("round")).show(truncate = false)
    val realized = Profile.doremiRealize(
      mixed, col("source"), col("doc_id"),
      doremi.filter(col("round") === 2L).select(col("source"), col("w_ppm")))
    println(s"DEMO stage=doremi_realized epoch_rows=${realized.count()}")

    // 6. pack into 512-token training bins (whitespace token count)
    val packed = Packing.packSequences(
      mixed.withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))).cast("long")),
      col("doc_id"), col("n_tokens"), capacity = 512)
    val bins = packed.agg(
      countDistinct(col("bin_id")).as("bins"),
      sum(col("n_tokens")).as("tokens"),
      sum(when(col("n_bins") > 1, 1L).otherwise(0L)).as("boundary_splits")).collect()(0)
    println(s"DEMO stage=packed bins=${bins.getLong(0)} tokens=${bins.getLong(1)} " +
      s"boundary_splits=${bins.getLong(2)}")

    // 7. deterministic globally-shuffled JSONL shards
    graft.sinks.TrainingExport.writeJsonlShards(
      mixed.select(col("doc_id"), col("text"), col("source"), col("lang")),
      col("doc_id"), shards = 4, outDir = s"$out/shards")
    val shardFiles = spark.read.textFile(s"$out/shards").count()
    println(s"DEMO stage=exported jsonl_lines=$shardFiles dir=$out/shards")

    // 8. dataset card: one-row summary of what ships
    mixed
      .agg(
        count(lit(1)).as("docs"),
        countDistinct(col("source")).as("sources"),
        countDistinct(col("lang")).as("langs"),
        sum(col("n_chars")).as("chars"))
      .show(truncate = false)

    // 9. the NEXT crawl snapshot arrives: diff against it and
    //    re-curate ONLY the delta (q177/q182's contract) — at 100 TB
    //    the re-run touches |added+changed| docs, not the corpus.
    //    v2 here: some pages gone, every 5th revised.
    val v1 = docs.select(col("doc_id"), col("text"))
    val v2 = docs.filter(col("doc_id") % 11 =!= 3)
      .select(
        col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    val statuses = graft.operators.Snapshot.diff(v1, v2, col("doc_id"), col("text"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    val worklist = graft.operators.Snapshot
      .deltaWorklist(v1, v2, col("doc_id"), col("text"))
    val oldIndex = v1
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper_id"))
    val admitted = worklist
      .withColumn("fp", TextAnalysis.fingerprint(col("payload")))
      .join(oldIndex, Seq("fp"), "left")
      .filter(col("keeper_id").isNull)
      .count()
    println(s"DEMO stage=incremental $statuses re_curated=$admitted")

    println(s"DEMO outdir=$out")
    spark.stop()
  }
}
