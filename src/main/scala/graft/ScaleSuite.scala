package graft

import org.apache.spark.sql.SparkSession

/** The FULL-SUITE scale run as one repeatable command — round 12's ten
  * hand-driven chunks (env flags, substitution list, heap settings)
  * promoted into a main so a re-run cannot silently drop a
  * substitution or change protocol.
  *
  *   SPARK_GRAFT_ARTIFACT_LEVEL=DISK_ONLY \
  *   SPARK_DRIVER_MEM=24g \
  *   sbt "runMain graft.ScaleSuite [dir] [chunkSize]"
  *
  * `dir` defaults to /tmp/sfsuite100 (the hybrid ×100 corpus: sf0.1
  * relational tables + 500 k docs / 200 k vectors). Protocol per query
  * = the Bench one: GC, one cold pass, min of two warm passes; a
  * throwing query records −1 and the suite keeps going. Queries run in
  * name order in chunks (default 20) inside ONE JVM; between chunks
  * every [[graft.queries.DirCached]] shared artifact is RELEASED
  * ([[graft.queries.DirCached.releaseAll]]) — heap sizes to one
  * chunk's working set, not the union of every chunk's
  * corpus-proportional artifacts (the round-12 48 GB finding; with
  * DISK_ONLY artifacts + per-chunk release the suite holds in 24 GB).
  *
  * SHUFFLE PARTITIONS ARE PART OF THE PROTOCOL (round-13 finding):
  * q84's shuffle working set OOMs a 24 GB JVM at the default 32
  * partitions — the right dial is parallelism, not heap, and
  * 256 partitions size tasks to memory at ×100 (q84: 414.8 s at
  * 24 GB/256 vs 396.4 s at 32 GB/32; AQE coalesces the small shuffles
  * back down, so the rest of the suite is unaffected —
  * GraftSessionSpec pins the plan invariance). The suite therefore
  * DEFAULTS the dial to 256 when neither SPARK_GRAFT_SHUFFLE_PARTITIONS
  * nor -Dgraft.shufflePartitions is set, and echoes the effective
  * value in the output JSON — the documented command needs no extra
  * env var and a re-run cannot silently drop the sizing.
  *
  * FAILURE PROTOCOL: an ordinary throwing query records −1 and the
  * suite continues. A VirtualMachineError (OOM and kin) marks the
  * WHOLE REMAINING RUN tainted: the current query records −1, every
  * not-yet-run query records −1 unattempted, and the output carries a
  * `fatal` field — after a fatal the JVM's heap (and possibly the
  * SparkContext) is degraded, and timing the rest "as if clean" would
  * stamp garbage floors. Whenever any query records −1, the output's
  * `recovery` field carries the EXACT subset re-run command (env +
  * runMain + the failed names) so the operator runbook is mechanical
  * — the recorded artifact of a suite run plus its recovery runs is
  * complete without improvisation.
  *
  * The EXCLUSION LIST is part of the protocol, not an operator
  * choice: each entry names a registered query whose ×K cost is
  * quadratic in copy count BY CONSTRUCTION (pair/candidate OUTPUT or
  * exact-truth input ∝ K²) and the measured production dial that
  * replaces it. Exclusions are echoed in the output JSON so a silent
  * swap is impossible. The `--include-excluded` flag lifts the list —
  * ONLY meaningful against a DISTINCT-content corpus (ScaleData
  * mode=distinct), where cross-copy vocabularies/sign patterns are
  * disjoint so every exclusion's pair OUTPUT is linear in K by
  * construction; the lift is echoed as `exclusions_lifted` so a
  * copy-fixture artifact can never quietly claim the full list ran.
  *
  * Output: one `{"metric":"scale_suite",...}` JSON line (stdout, last)
  * with per-query warm seconds, failures, exclusions, recovery and
  * totals — the SCALING.md ×100 table's source of truth.
  */
object ScaleSuite {

  /** name → (reason, measured dial) — the round-12 substitution list. */
  private[graft] val Exclusions: Seq[(String, String)] = Seq(
    "q99_prefix_jaccard" ->
      "exact full-universe pair truth: shuffle spill prop. to K^2 bytes (hit the disk wall at x100, r12); dial = q216 rep-collapsed audit, in-run",
    "q112_lsh_recall_audit" ->
      "consumes q99's full truth relation; dial = q216 rep-collapsed audit, in-run",
    "q156_sampled_lsh_audit" ->
      "anchor sampling divides cost by the rate but each K-copy group still contributes ~rate*K^2 sampled true pairs — at the registered 50% fixture rate the x100 spill still exceeds this box's disk (measured r13, gate pushdown verified in-plan); dials = q217 two-sided gate (in-run at budget rates, pair mass rate_a*rate_b*K^2), q216 rep-collapsed audit (in-run, flat in K where dup mass is exact), ScaleBench q156_rate100 (cost prop. to rate)",
    "q215_sampled_truth_pairs" ->
      "q156's truth side as an export — same rate*K^2 sampled pair mass at the 50% fixture rate; same dials as q156",
    "q216_sampled_audit_reps" ->
      "exact collapse absorbs the fixture's EXACT copy half, but the xK generator's odd copies are one-word VARIANTS — genuine near-dups an audit must count — so at the 50% fixture rate rep-pair mass is still ~rate*base*(K/2)^2 (measured r13: 69 GB spill watermark at x100 before kill); dial = the RATE (ScaleBench q216_rate100 / q156_rate100, cost prop. to rate). On corpora whose duplicate mass is exact copies, q216 is additionally flat in K",
    "q217_two_sided_audit" ->
      "registered at the 50% oracle fixture rates, where two-sided pair mass (0.25*K^2 per group) still spills past this box at x100; the production posture scales BOTH rates 1/K for a FIXED pair budget at any K — measured flat x10->x100 in ScaleBench q217_budget rows",
    "q35_simhash_pairs" ->
      "full simhash pair EXPORT, output prop. to K^2; dial = q64 verdicts, in-run",
    "q144_triplet_mining" ->
      "positive-pair mass prop. to K^2 on the copy corpus; dial = ScaleBench q144_sqrtn (26.8 s at x100)",
    "q164_image_neardup" ->
      "within-group image pair export, output prop. to K^2; dial = q171 distinct (reps), in-run",
    "q166_image_probe" ->
      "probe EXPORT over the uncollapsed corpus; dial = the reps discipline (q171/q213), in-run",
    "q187_mutual_pairs" ->
      "uncapped mutual-pair export; dial = q196 capped, in-run",
    "q209_crossmodal_neardup" ->
      "full cross-modal id-pair export, output prop. to K^2; dial = q213 reps probe, in-run",
    "q210_paired_dataset_card" ->
      "consumes the uncapped mutual-pair relation (killed >30 min at x100, r12); dial = ScaleBench q210_pairs_capped (11.6 s)",
    "q212_pair_alignment" ->
      "same uncapped pair input as q210; dial = ScaleBench q212_alignment_capped (10.3 s)",
    "q214_crossmodal_decontamination" ->
      "same uncapped pair input as q210; dial = ScaleBench q214_decontamination_capped (11.4 s)",
    "q219_winnow_overlap_reps" ->
      "df-over-reps deliberately KEEPS fingerprints that exact-copy flooding would push past the cap — but the xK generator's odd copies are VARIANTS (distinct normalized texts with near-identical fp sets), so the kept per-base posting lists grow with the variant count and rep-level candidate volume is prop. to (K/2)^2 by construction (the q216 lesson: exact collapse cannot absorb variant mass). Dial = q57 (df-over-docs drops copy-flooded fps, in-run); on the DISTINCT-content axis q219 runs linear (measured, --include-excluded runs)")

  /** The suite body, seam-separated from `main` so ScaleSuiteSpec can
    * drive it with an injected query map (a throwing query, a fatal
    * query) and a captured log. Returns the final JSON line; chunk
    * progress lines go through `log`. */
  private[graft] def run(
      spark: SparkSession,
      dir: String,
      chunkSize: Int,
      only: Set[String],
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
      log: String => Unit = println,
      includeExcluded: Boolean = false): String = {
    require(chunkSize > 0, s"chunkSize must be positive (got $chunkSize)")
    val protocolExcluded = Exclusions.map(_._1).toSet
    val unknown          = protocolExcluded.diff(queries.keySet)
    require(unknown.isEmpty, s"exclusion list names unknown queries: $unknown")
    // `includeExcluded` lifts the exclusion list EXPLICITLY (echoed as
    // `exclusions_lifted` in the artifact) — for the DISTINCT-content
    // corpora (ScaleData mode=distinct) where every exclusion's
    // quadratic pair OUTPUT is linear by construction. On the copy
    // fixture the list stays mandatory: a subset run cannot smuggle an
    // excluded query back in without editing the protocol.
    val excluded    = if (includeExcluded) Set.empty[String] else protocolExcluded
    val unknownOnly = only.diff(queries.keySet)
    require(unknownOnly.isEmpty, s"unknown query name(s): $unknownOnly")
    require(only.intersect(excluded).isEmpty,
      s"subset names excluded queries: ${only.intersect(excluded)} — run their dials instead")
    val names = queries.keySet.diff(excluded)
      .filter(n => only.isEmpty || only.contains(n)).toSeq.sorted

    def loadAvg(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    // set on the first VirtualMachineError; from then on NOTHING else
    // runs — a post-OOM JVM times garbage even when the context lives
    var fatal: Option[String] = None
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { queries(name)(spark, dir).count() }
      catch {
        case e: VirtualMachineError =>
          fatal = Some(s"${e.getClass.getSimpleName} at $name: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
          System.err.println(s"[scale-suite] FATAL — ${fatal.get}; remaining queries " +
            "recorded -1 unattempted (see the recovery field)")
          return -1.0
        case e: Throwable =>
          System.err.println(s"[scale-suite] $name failed: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(200)}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    names.grouped(chunkSize).zipWithIndex.foreach { case (chunk, ci) =>
      val t0 = System.nanoTime()
      chunk.foreach { name =>
        if (fatal.isDefined) results += ((name, -1.0, -1.0))
        else {
          System.gc()
          val cold = once(name)
          val warm = if (cold >= 0) math.min(once(name), once(name)) else -1.0
          results += ((name, cold, warm))
        }
      }
      // release EVERY query pack's shared artifacts: the next chunk
      // rebuilds what it needs (the fresh-JVM-per-chunk isolation of
      // the hand-driven protocol, without the JVM)
      val released = graft.queries.DirCached.releaseAll(spark)
      System.gc()
      val secs = (System.nanoTime() - t0) / 1e9
      log(s"""{"scale_suite_chunk":$ci,"queries":${chunk.size},""" +
        s""""chunk_s":${math.rint(secs * 10) / 10},"artifacts_released":$released,""" +
        s""""load_now":${loadAvg()},"heap_max_g":${Runtime.getRuntime.maxMemory() >> 30}}""")
    }

    def r3(x: Double) = math.rint(x * 1000) / 1000
    val qs = results.map { case (k, _, w) => s""""$k":${r3(w)}""" }.mkString("{", ",", "}")
    val exJson = Exclusions
      .map { case (k, v) => s""""$k":"${v.replace("\"", "'")}"""" }.mkString("{", ",", "}")
    val failed = results.filter(_._3 < 0).map(_._1)
    val shufflePartitions =
      try spark.conf.get("spark.sql.shuffle.partitions") catch { case _: Throwable => "?" }
    // the mechanical re-run: same env knobs this run used, names = the
    // -1 rows — paste it, don't reconstruct it
    val recovery =
      if (failed.isEmpty) "null"
      else {
        val env = Seq(
          sys.env.get("SPARK_GRAFT_ARTIFACT_LEVEL").map(v => s"SPARK_GRAFT_ARTIFACT_LEVEL=$v"),
          sys.env.get("SPARK_DRIVER_MEM").map(v => s"SPARK_DRIVER_MEM=$v"),
          Some(s"SPARK_GRAFT_SHUFFLE_PARTITIONS=$shufflePartitions")).flatten.mkString(" ")
        val flag = if (includeExcluded) "--include-excluded " else ""
        val cmd =
          s"$env sbt 'runMain graft.ScaleSuite $dir $chunkSize $flag${failed.mkString(" ")}'"
        s""""${cmd.replace("\"", "'")}""""
      }
    s"""{"metric":"scale_suite","sf":"$dir","unit":"sec",""" +
      s""""value":${r3(results.map(_._3).filter(_ >= 0).sum)},""" +
      s""""total_cold":${r3(results.map(_._2).filter(_ >= 0).sum)},""" +
      s""""n_attempted":${results.size},"n_complete":${results.count(_._3 >= 0)},""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""fatal":${fatal.fold("null")(f => s""""${f.replace("\"", "'")}"""")},""" +
      s""""recovery":$recovery,""" +
      s""""chunk_size":$chunkSize,""" +
      s""""artifact_level":"${sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_LEVEL", "MEMORY_AND_DISK")}",""" +
      s""""shuffle_partitions":$shufflePartitions,""" +
      s""""heap_max_g":${Runtime.getRuntime.maxMemory() >> 30},""" +
      s""""exclusions_lifted":$includeExcluded,""" +
      s""""queries":$qs,"excluded":$exJson}"""
  }

  def main(args: Array[String]): Unit = {
    val dir       = args.lift(0).getOrElse("/tmp/sfsuite100")
    val chunkSize = args.lift(1).map(_.toInt).getOrElse(20)
    require(
      new java.io.File(s"$dir/documents.parquet").exists(),
      s"$dir does not look like a corpus dir (no documents.parquet) — " +
        "generate it with graft.ScaleData first")
    // optional trailing args = subset run (ad-hoc chunk re-measures /
    // the emitted recovery command); `--include-excluded` lifts the
    // exclusion list for distinct-content corpora (see `run`)
    val trailing        = args.drop(2)
    val includeExcluded = trailing.contains("--include-excluded")
    val only            = trailing.filterNot(_.startsWith("--")).toSet
    // the protocol's partition sizing: 256 unless the operator dialed
    // it explicitly (env or prop) — see the scaladoc heap law
    if (sys.props.get("graft.shufflePartitions").isEmpty &&
        sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").isEmpty)
      sys.props("graft.shufflePartitions") = "256"
    val spark = GraftSession.local()
    val line =
      run(spark, dir, chunkSize, only, SparkEntry.queries, includeExcluded = includeExcluded)
    println(line)
    spark.stop()
    if (line.contains(""""failed":[]""")) () else sys.exit(1)
  }
}
