package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Plan-quality gates: the physical plans the 100 TB design depends
  * on — filter/column pushdown into the parquet scan, broadcast of
  * small join sides, whole-stage codegen on hot paths, and no
  * accidental cartesian products. These assert the OPTIMIZED shape,
  * not just results, so a refactor that silently de-optimizes fails
  * the suite.
  */
class PlanSpec extends SparkSpec {

  // The shape pins below assert on FRESH plans — a shared DirCached
  // artifact left persisted by an earlier suite substitutes
  // InMemoryRelations into matching subtrees (swallowing the very
  // joins/filters being pinned) and the assertions go blind. Until
  // round 14 this suite ran clean only because DirCachedSpec happened
  // to run (and release) immediately before it in the full-suite
  // discovery order; an ad-hoc `testOnly` pairing could poison it.
  // Release everything up front so the pins are order-independent.
  graft.queries.DirCached.releaseAll(spark)

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("GLOBAL LINT: no query plans a cartesian product or a UDF") {
    // Suite-wide invariant over every registered query's physical plan:
    //  - CartesianProduct = a join neither broadcast nor keyed — always
    //    a 100-TB accident (broadcast cross joins show as
    //    BroadcastNestedLoopJoin and are the deliberate 1-row pattern);
    //  - Scala/Python UDFs block codegen — the house rule is native
    //    expressions only.
    // Analysis-only (no execution), so this covers all 126 plans fast.
    // sf0.01, not sf0.001: a few operators validate data-shape
    // invariants eagerly at build time and need the driver-gate corpus.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val s = planString(fn(spark, sf("sf0.01")))
      Seq("CartesianProduct", "BatchEvalPython", "ArrowEvalPython", "SQLAppUDF")
        .filter(s.contains)
        .map(tok => s"$name: $tok") ++
        (if (s.linesIterator.exists(l => l.contains("UDF(") || l.contains("udf("))) Seq(s"$name: udf") else Nil)
    }
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.mkString("\n")}")
  }

  test("getOhlcvFromTable: symbol prunes partitions, date range reaches parquet as timestamp_unix bounds") {
    import graft.ohlcv.{Api, MockData, Normalize, RawIngest, Storage}
    val tmp = java.nio.file.Files.createTempDirectory("graft-planapi").toString
    val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 5, 1759895100L)
    MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw")
    Storage.writeParquet(
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw")), "p"),
      s"$tmp/table", "overwrite")
    val df = Api.getOhlcvFromTable(
      spark.read.parquet(s"$tmp/table"), "NSE:TCS-EQ",
      Some("2025-10-08"), Some("2025-10-08"), limit = None)
    val s = planString(df)
    val scan = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scan.contains("PartitionFilters:") && scan.contains("symbol_clean"),
      s"symbol not pruning partitions:\n$scan")
    // the date range must prune DAY DIRECTORIES too (±1-day widened
    // year/month/day key), not just row groups — without it a 1-day
    // query foot-reads every day of the symbol (ServeScale ×100
    // measured 160 files vs 24). Inspect the PartitionFilters segment
    // specifically — year# also appears in the scan's column list.
    val partFilters = scan.substring(scan.indexOf("PartitionFilters:"))
      .takeWhile(_ != ']')
    assert(partFilters.contains("year"),
      s"date range not pruning day partitions:\n$scan")
    // plan strings truncate long filter lists — match the prefix
    assert(scan.contains("IsNotNull(timestamp_unix") && scan.contains("GreaterThanOrEqual(tim"),
      s"date range not pushed as timestamp_unix bounds:\n$scan")
    assert(df.count() === 5) // and it still answers
    // defensive guard: a frame WITHOUT the calendar partition columns
    // (e.g. a raw candles view) must still answer — the day-key
    // predicate only applies when year/month/day exist
    val noDayCols = spark.read.parquet(s"$tmp/table").drop("year", "month", "day")
    assert(Api.getOhlcvFromTable(
      noDayCols, "NSE:TCS-EQ", Some("2025-10-08"), Some("2025-10-08"), None).count() === 5)
  }

  test("latestSummaryFromTable: scan prunes to each symbol's newest day partition") {
    import graft.ohlcv.{Api, MockData, Normalize, RawIngest, Storage}
    val tmp = java.nio.file.Files.createTempDirectory("graft-planlatest").toString
    // two days per symbol: day 1 at t0, day 2 at t0+86400 — /latest
    // must scan ONLY day 2
    val mock = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 5, 1759895100L)
    val mock2 = MockData.candles(spark, Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"), 5, 1759895100L + 86400L)
    MockData.envelope(mock, "2025-10-08T04:00:00Z").write.json(s"$tmp/raw/f1")
    MockData.envelope(mock2, "2025-10-09T04:00:00Z").write.json(s"$tmp/raw/f2")
    Storage.writeParquet(
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw/*")), "p"),
      s"$tmp/table", "overwrite")
    val df = Api.latestSummaryFromTable(
      spark.read.parquet(s"$tmp/table"),
      spark.sparkContext.hadoopConfiguration, s"$tmp/table",
      Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ"))
    val rows = df.collect()
    // answers from day 2 only: 5 candles per symbol, newest t = last of day 2
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[Long]("total_candles") === 5L))
    assert(rows.forall(r =>
      r.getAs[org.apache.spark.sql.Row]("last").getAs[Long]("t") ===
        1759895100L + 86400L + 4 * 300))
    // the scan is pruned to the newest day DIRECTORIES: partition
    // filters carry the (year, month, day) key, and the executed scan
    // reads only the day-2 rows (5 per symbol), never day 1
    val s = planString(df)
    val scan = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    // the printed filter list truncates, so assert the calendar key is
    // there and let the scan-row metric below prove the full prune
    val partFilters = scan.substring(scan.indexOf("PartitionFilters:")).takeWhile(_ != ']')
    assert(partFilters.contains("year"),
      s"/latest not pruning to newest day partitions:\n$scan")
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    val scanRows = allNodes(df.queryExecution.executedPlan)
      .collect { case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
      .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    assert(scanRows === 10L, s"/latest scanned $scanRows rows — history not pruned")
  }

  test("analytics daily_summary/top_movers FromTable: scan prunes to the requested day, top-N is TakeOrdered") {
    import graft.ohlcv.{Api, MockData, Normalize, RawIngest, Storage}
    val tmp = java.nio.file.Files.createTempDirectory("graft-plananalytics").toString
    // three days × two symbols, 5 candles each; the query targets the
    // MIDDLE day only — scan rows must be symbols × that day's candles
    val t0 = 1759895100L // 2025-10-08 ~04:25 UTC
    val syms = Seq("NSE:RELIANCE-EQ", "NSE:TCS-EQ")
    val mock = (0 to 2).map(d =>
      MockData.candles(spark, syms, 5, t0 + d * 86400L)).reduce(_.unionByName(_))
    MockData.envelope(mock, "2025-10-11T04:00:00Z").write.json(s"$tmp/raw/f1")
    Storage.writeParquet(
      Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, s"$tmp/raw/*")), "p"),
      s"$tmp/table", "overwrite")
    val table = spark.read.parquet(s"$tmp/table")
    val df = Api.dailySummaryFromTable(table, "2025-10-09")
    val rows = df.collect()
    assert(rows.length === 2) // one rollup row per symbol, requested day only
    assert(rows.forall(_.getAs[Long]("num_records") === 5L))
    val s = planString(df)
    val scan = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    val partFilters = scan.substring(scan.indexOf("PartitionFilters:")).takeWhile(_ != ']')
    assert(partFilters.contains("year"),
      s"daily_summary not pruning day partitions:\n$scan")
    assert(scan.contains("GreaterThanOrEqual(tim"),
      s"exact day bounds not pushed as timestamp_unix:\n$scan")
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    // the ±1-day partition superset may LIST neighbor dirs, but the
    // pushed timestamp_unix bounds cut the scan's output to exactly
    // the requested day: symbols × 5 candles
    val scanRows = allNodes(df.queryExecution.executedPlan)
      .collect { case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc }
      .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    assert(scanRows === 10L,
      s"daily_summary scanned $scanRows rows — history not pruned to the day")
    // top_movers rides the same pruned rollup and takes its N with a
    // heap, never a materialized global sort of the rollup
    val tm = Api.topMoversFromTable(table, "2025-10-09", n = 1, gainers = true)
    assert(tm.collect().length === 1)
    assert(planString(tm).contains("TakeOrderedAndProject"), planString(tm).take(2000))
  }

  test("q02 filter+projection reach the parquet scan (PushedFilters, pruned ReadSchema)") {
    val df = SparkEntry.queries("q02_filter_project")(spark, sf())
    val s  = planString(df)
    assert(s.contains("PushedFilters: ["))
    // (plan strings truncate long lists — match the prefix)
    assert(s.contains("GreaterThanOrEqual(l_shipda"), s.take(2000))
    // pruned read: only the 6 needed columns in the scan output list
    val scanLine = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scanLine.contains("l_shipdate") && !scanLine.contains("l_returnflag"), scanLine)
  }

  test("q03 dimension joins broadcast (no shuffle of the fact side)") {
    val df = SparkEntry.queries("q03_join_broadcast")(spark, sf())
    df.collect() // execute THIS plan so AQE finalizes it
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"), "dim join degraded to SMJ")
  }

  test("q01 aggregation: map-side partial aggregation before the shuffle") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf())
    val s  = planString(df)
    // partial + final HashAggregate pair (map-side combine). NOTE: the
    // wide-decimal Det sums (precision 28-30 > 18) make HashAggregate
    // fall off whole-stage codegen — the documented price of bit-exact
    // cross-engine determinism (see graft.functions.Det).
    assert(s.contains("partial_sum"), s.take(2000))
    assert("HashAggregate".r.findAllIn(s).size >= 2, s.take(2000))
  }

  test("plain double aggregation stays inside whole-stage codegen") {
    val df = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
    df.collect() // execute THIS plan so AQE finalizes it (count() builds a different one)
    val s = planString(df)
    // codegen shows as "*(n)" in plan toString
    assert(s.contains("*("), s.take(2000))
  }

  test("q09 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("q09_topk_orders")(spark, sf())
    val s  = planString(df)
    assert(s.contains("TakeOrderedAndProject"), s.take(2000))
  }

  test("brute-force ANN broadcasts the query side") {
    val df = SparkEntry.queries("q36_cosine_topk")(spark, sf())
    val s  = planString(df)
    assert(s.contains("Broadcast"), s.take(2000))
  }

  test("ANN probes take a query RELATION: no In-list id expression in any retrieval plan") {
    // The registered retrieval queries all route through the
    // DataFrame-relation overloads — a query batch is data, joined
    // broadcast-side, never an `isin` expression whose literal list
    // would bloat the plan and task binaries at 10⁴–10⁵ ids. The
    // harness's 5-id probe set arrives as a pushed-down range filter.
    for (q <- Seq(
        "q36_cosine_topk", "q37_ann_lsh", "q88_ann_multiprobe", "q45_ann_ivf",
        "q63_ann_ivf_trained", "q102_pq_topk", "q120_hard_negatives",
        "q124_mmr_rerank", "q125_ann_recall_audit", "q127_pq_recall_audit",
        "q128_ivf_recall_curve", "q130_lsh_recall_curve")) {
      val s = planString(SparkEntry.queries(q)(spark, sf()))
      assert(!s.contains(" IN ("), s"$q still plans an In-list probe filter:\n${s.take(2000)}")
      assert(!s.contains("INSET"), s"$q plans an InSet probe filter:\n${s.take(2000)}")
    }
  }

  test("columnProfile: exact mode pays an Expand; approx mode fuses into one partial aggregate") {
    val df = Tables.documents(spark, sf())
    val exact  = planString(graft.operators.Profile.profileAggregate(df, exact = true))
    val approx = planString(graft.operators.Profile.profileAggregate(df, exact = false))
    // exact multi-column countDistinct → Expand (k× rows through the exchange)
    assert(exact.contains("Expand"), exact.take(2000))
    // approx → HLL sketches fold into a single partial/final pair, NO Expand
    assert(!approx.contains("Expand"), approx.take(2000))
    assert("HashAggregate".r.findAllIn(approx).size === 2, approx.take(2000))
  }

  test("q54 winnowing is a map-only pass: no Exchange, codegen'd selection") {
    // the operator, not the driver query — the latter serves q54/q57
    // from a shared persisted relation (InMemoryTableScan)
    val df = graft.operators.TextAnalysis.winnowingFingerprints(
      Tables.documents(spark, sf()), col("doc_id"), col("text"))
    val s = planString(df)
    assert(!s.contains("Exchange"), s.take(2000))
    assert(s.contains("winnow_select"), s.take(2000))
    // only the two needed columns reach the parquet scan
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("n_chars"), readSchema)
  }

  test("q210 paired-dataset pipeline: gate sets are SHARED ARTIFACTS — the composed plan reads persisted id relations, scans only embeddings, and contains no codec pass") {
    val df = SparkEntry.queries("q210_paired_dataset_card")(spark, sf("sf0.01"))
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case _                        => Seq.empty
      })
    // the walk does NOT descend into InMemoryRelation's cached build
    // plans — exactly the point: what executes PER RUN of q210 is the
    // node set below; the gate builds (text scan, image decode) ran
    // once into their persisted artifacts
    val nodes = allNodes(df.queryExecution.executedPlan)
    val imts = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
    assert(imts >= 3, s"expected codebook + caption set + image keep set as " +
      s"InMemoryTableScans, found $imts")
    // no codec / object pass in the composed plan: decode happened
    // ONCE inside the artifact build, never per downstream stage
    val objectish = nodes.filter(n =>
      n.getClass.getSimpleName.contains("MapPartitions") ||
        n.getClass.getSimpleName.contains("SerializeFromObject"))
    assert(objectish.isEmpty, s"codec pass leaked into the composed plan: " +
      objectish.map(_.getClass.getSimpleName).mkString(", "))
    // every file scan is the embeddings table — the documents corpus
    // and the media payloads are NEVER re-scanned by this plan
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.nonEmpty && scans.forall(_.contains("embeddings")),
      s"non-embeddings scan in the composed plan: $scans")
  }

  test("q214 cross-modal decontamination: probes read the SHARED persisted artifacts — no codec pass, scans only embeddings + documents (the gram side's text)") {
    val df = SparkEntry.queries("q214_crossmodal_decontamination")(spark, sf("sf0.01"))
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case _                        => Seq.empty
      })
    val nodes = allNodes(df.queryExecution.executedPlan)
    // image fingerprints + both gate sets + codebook + the eval-image
    // manifest come from the persisted artifacts, never a rebuild —
    // the image-leak probe reads ONLY persisted id relations
    val imts = nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
    assert(imts >= 5, s"expected codebook + caption set + image keep set + " +
      s"image hashes + eval-image manifest as InMemoryTableScans, found $imts")
    // the probe NEVER re-decodes an image: no codec/object pass
    val objectish = nodes.filter(n =>
      n.getClass.getSimpleName.contains("MapPartitions") ||
        n.getClass.getSimpleName.contains("SerializeFromObject"))
    assert(objectish.isEmpty, s"codec pass leaked into the composed plan: " +
      objectish.map(_.getClass.getSimpleName).mkString(", "))
    // file scans: embeddings (pair mining) and documents (the caption
    // gram gate needs text; the eval manifest needs source) — never a
    // media payload
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.nonEmpty &&
      scans.forall(p => p.contains("embeddings") || p.contains("documents")),
      s"unexpected scan in the composed plan: $scans")
  }

  test("q156 sampled audit: the anchor sample gate sits BELOW both pair-forming joins (anchor side only)") {
    // The round-12 ×100 lesson: the sampled audit is only affordable
    // if the doc_a gate reaches BELOW the quadratic pair-forming
    // self-joins (PPJoin prefix join + LSH band join). This pins the
    // optimized logical shape: exactly those two joins (condition
    // `a.doc_id < b.doc_id`), each with the deterministic sample gate
    // (pmod(hash, 10000)) filtering its LEFT (anchor) subtree and NOT
    // its right — the partner side must stay the full universe or the
    // relation silently becomes sample × sample.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    val df = SparkEntry.queries("q156_sampled_lsh_audit")(spark, sf("sf0.01"))
    val p  = df.queryExecution.optimizedPlan
    def hasGate(pl: LogicalPlan): Boolean =
      pl.collect {
        case f: Filter if f.condition.sql.contains("pmod") &&
          f.condition.sql.contains("10000") => f
      }.nonEmpty
    val pairJoins = p.collect {
      case j: Join if j.condition.exists(_.sql.contains("a.doc_id < b.doc_id")) => j
    }
    assert(pairJoins.size === 2,
      s"expected the PPJoin prefix join + the LSH band join, found ${pairJoins.size}")
    pairJoins.foreach { j =>
      assert(hasGate(j.left),
        s"anchor gate missing BELOW the pair join: ${j.condition.map(_.sql)}")
      assert(!hasGate(j.right),
        s"gate leaked into the partner (full-universe) side: ${j.condition.map(_.sql)}")
    }
  }

  test("q217 two-sided audit: the anchor gate sits below the LEFT and the partner gate below the RIGHT of both pair-forming joins — and neither leaks to the other side") {
    // The fixed-budget estimator only works if BOTH independent gates
    // reach below the quadratic pair-forming self-joins (PPJoin prefix
    // join + LSH band join) on their OWN side: anchor (seed 'audit')
    // gates the a-subtree, partner (seed 'partner') the b-subtree.
    // An anchor gate leaking into the right subtree (or vice versa)
    // would silently square the sampling rate on one side; a missing
    // partner gate degrades to q156's rate·K² pair mass. (q156's own
    // pin — partner side UNGATED — stays as-is; its semantics differ.)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    val df = SparkEntry.queries("q217_two_sided_audit")(spark, sf("sf0.01"))
    val p  = df.queryExecution.optimizedPlan
    def hasGate(pl: LogicalPlan, seed: String): Boolean =
      pl.collect {
        case f: Filter if f.condition.sql.contains("pmod") &&
          f.condition.sql.contains("10000") && f.condition.sql.contains(seed) => f
      }.nonEmpty
    val pairJoins = p.collect {
      case j: Join if j.condition.exists(_.sql.contains("a.doc_id < b.doc_id")) => j
    }
    assert(pairJoins.size === 2,
      s"expected the PPJoin prefix join + the LSH band join, found ${pairJoins.size}")
    pairJoins.foreach { j =>
      assert(hasGate(j.left, "audit"),
        s"anchor gate missing BELOW the pair join's left: ${j.condition.map(_.sql)}")
      assert(hasGate(j.right, "partner"),
        s"partner gate missing BELOW the pair join's right: ${j.condition.map(_.sql)}")
      assert(!hasGate(j.left, "partner"), "partner gate leaked into the anchor side")
      assert(!hasGate(j.right, "audit"), "anchor gate leaked into the partner side")
    }
  }

  test("q33/q84 reps-first: the band self-join sees only word-sequence REPS on both sides; the expansion join sits above") {
    // The round-14 collapse-then-expand discipline: on a copy-heavy
    // corpus the band self-join is quadratic in copies unless both of
    // its inputs are restricted to one rep per distinct word sequence
    // (doc_id = rep_id below the join). The expansion joins (members
    // re-attached, within-group `__da < __db` self-join) must sit
    // ABOVE the pair join — compute ∝ distinct content, output-bound
    // expansion.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.functions.col
    def hasRepRestriction(pl: LogicalPlan): Boolean =
      pl.collect {
        case f: Filter if f.condition.sql.contains("rep_id") => f
      }.nonEmpty
    // structural matcher: a join condition containing name1 < name2
    // between attribute references — alias qualifiers (`a.doc_id`) do
    // not survive into the optimized plan of the un-cached operator
    // form, so the pin matches the LessThan node, not its SQL text
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan}
    def hasLt(j: Join, name1: String, name2: String): Boolean =
      j.condition.exists(c => c.collect {
        case lt @ LessThan(x: AttributeReference, y: AttributeReference)
          if x.name == name1 && y.name == name2 => lt
      }.nonEmpty)
    def pinRepsFirst(q: String, p: LogicalPlan): Unit = {
      val bandJoins = p.collect {
        case j: Join if hasLt(j, "doc_id", "doc_id") => j
      }
      assert(bandJoins.size === 1, s"$q: expected exactly one band self-join, got ${bandJoins.size}")
      assert(hasRepRestriction(bandJoins.head.left), s"$q: rep restriction missing below the band join's left")
      assert(hasRepRestriction(bandJoins.head.right), s"$q: rep restriction missing below the band join's right")
      val withinJoins = p.collect {
        case j: Join if hasLt(j, "__da", "__db") => j
      }
      assert(withinJoins.size === 1, s"$q: expected the within-group expansion self-join")
    }
    pinRepsFirst("q33_minhash_lsh_pairs",
      SparkEntry.queries("q33_minhash_lsh_pairs")(spark, sf("sf0.01"))
        .queryExecution.optimizedPlan)
    // q84 is served from the sharedRescoredPairs artifact since r14
    // (compute-once, read by q84 + the q112 auditor): the registered
    // query's plan must be a pure artifact read (an InMemoryRelation,
    // NO band join above it — recomputing the pairs per run is the
    // regression this pin exists to catch), and the reps-first shape
    // is pinned on the operator form the artifact materializes.
    val q84Plan = SparkEntry.queries("q84_lsh_rescored")(spark, sf("sf0.01"))
      .queryExecution.optimizedPlan
    assert(q84Plan.collect { case r: InMemoryRelation => r }.nonEmpty,
      "q84: expected the sharedRescoredPairs artifact read (InMemoryRelation)")
    assert(q84Plan.collect {
      case j: Join if hasLt(j, "doc_id", "doc_id") => j
    }.isEmpty, "q84: band self-join above the artifact boundary — pairs recomputed per run")
    // Pin the artifact's BUILD shape on the same operator at thresholds
    // the registered artifact does not use: with identical thresholds
    // the CacheManager recognizes the whole expression as the cached
    // artifact (sameResult) and substitutes one InMemoryRelation —
    // correct behaviour, but it would hide the subtree this pin exists
    // to inspect. Threshold constants do not change the plan SHAPE.
    val docs01 = graft.Tables.documents(spark, sf("sf0.01"))
    val sh01   = graft.operators.TextDedup.shingleRows(docs01, col("doc_id"), col("text"), 3)
    pinRepsFirst("q84 build (sharedRescoredPairs shape)",
      graft.operators.TextDedup.lshRescoredPairsViaReps(
        docs01, col("doc_id"), col("text"), sh01,
        estThreshold = 0.55, threshold = 0.85)
        .queryExecution.optimizedPlan)
  }

  test("q43/q146 reps-first: the vector band self-join sees only distinct-vector REPS on both sides") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    def hasRepRestriction(pl: LogicalPlan): Boolean =
      pl.collect {
        case f: Filter if f.condition.sql.contains("rep_id") => f
      }.nonEmpty
    for (q <- Seq("q43_embedding_neardup", "q146_crosslabel_neardups")) {
      val p = SparkEntry.queries(q)(spark, sf("sf0.01")).queryExecution.optimizedPlan
      val bandJoins = p.collect {
        case j: Join if j.condition.exists(_.sql.contains("a.vec_id < b.vec_id")) => j
      }
      assert(bandJoins.size === 1, s"$q: expected exactly one vector band self-join, got ${bandJoins.size}")
      assert(hasRepRestriction(bandJoins.head.left), s"$q: rep restriction missing below the band join's left")
      assert(hasRepRestriction(bandJoins.head.right), s"$q: rep restriction missing below the band join's right")
    }
  }

  test("q219 reps-first winnow overlap: the df window and pair generation are rep-restricted; the expansion join sits above") {
    // q219's pair path has no self-join (map-side posting-list pair
    // generation), so the pin is on its two compute-heavy stages: every
    // Window (the fp df count) must sit above a LEFT SEMI join whose
    // build side carries the doc_id = rep_id keeper filter, and the
    // within-group expansion self-join must exist exactly once above.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Window => LWindow}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    def repSemiBelow(pl: LogicalPlan): Boolean =
      pl.collect {
        case j: Join if j.joinType == LeftSemi &&
          j.right.collect {
            case f: Filter if f.condition.sql.contains("rep_id") => f
          }.nonEmpty => j
      }.nonEmpty
    val p = SparkEntry.queries("q219_winnow_overlap_reps")(spark, sf("sf0.01"))
      .queryExecution.optimizedPlan
    val windows = p.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the fp-df window in the plan")
    windows.foreach(w =>
      assert(repSemiBelow(w.child), "a df window is not rep-restricted below"))
    val withinJoins = p.collect {
      case j: Join if j.condition.exists(_.sql.contains("__da < __db")) => j
    }
    assert(withinJoins.size === 1, "expected the within-group expansion self-join")
  }

  test("q56 stratified sample: pure filter before the aggregate, pruned scan") {
    val df = SparkEntry.queries("q56_stratified_sample")(spark, sf())
    val s  = planString(df)
    // one shuffle total (the groupBy) — the sampling itself adds none
    assert("Exchange".r.findAllIn(s).size === 1, s.take(2000))
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), readSchema) // widest column pruned away
  }

  test("q58 decontamination broadcasts the benchmark gram set") {
    val df = SparkEntry.queries("q58_decontamination")(spark, sf())
    df.collect() // let AQE finalize
    val s = planString(df)
    // the 100-TB corpus side must never shuffle for the join
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"), "benchmark join degraded to SMJ")
  }

  test("q31 shared jaccard path runs df-capped: the hot-shingle semi-join is in the executed plan") {
    val df = SparkEntry.queries("q31_ngram_jaccard_pairs")(spark, sf())
    df.collect() // let AQE finalize
    val s = planString(df)
    // the cap's keep-list filters the posting lists BEFORE the
    // self-join — a boilerplate trigram in half the corpus must never
    // reach the quadratic join (VERDICT r2 "What's wrong" #2)
    assert(s.contains("LeftSemi"), s.take(3000))
    assert(s.contains("jaccard_shingle_cap"),
      s.linesIterator.filter(_.contains("CollectMetrics")).mkString("\n"))
  }

  test("q33 band self-join exchanges are slim: no signature array crosses a shuffle") {
    val df = SparkEntry.queries("q33_minhash_lsh_pairs")(spark, sf())
    df.collect() // let AQE finalize
    // The r2 regression shipped the 16-slot sig array through the band
    // exchange 8× per doc per side (4.6 s at sf0.1). Pin the fix: any
    // exchange partitioned on the band key must not carry `sig`.
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    // AQE hides finished exchanges inside leaf QueryStageExec nodes —
    // walk through both wrappers explicitly. At tiny SF the band join
    // may be broadcast instead of shuffled; either way, whatever
    // exchange ships the banded relation must be the slim one.
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    val bandExchanges = allNodes(df.queryExecution.executedPlan)
      .collect { case e: Exchange if e.output.exists(_.name == "band_key") => e }
    assert(bandExchanges.nonEmpty, "expected a band-keyed exchange in the q33 plan")
    bandExchanges.foreach { e =>
      assert(!e.output.exists(_.name == "sig"),
        s"sig array rides the band exchange: ${e.output.map(_.name).mkString(",")}")
    }
  }

  test("q59 per-group top-k: map-side WindowGroupLimit before the group exchange") {
    val df = SparkEntry.queries("q59_lang_ngrams")(spark, sf())
    df.collect()
    val s = planString(df)
    // rank-limit pushdown: a Partial WindowGroupLimit caps each map
    // partition at k rows per group BEFORE the exchange — the per-group
    // sort funnel never sees the full vocabulary
    assert(s.contains("WindowGroupLimit"), s.take(2000))
    assert(s.contains("Partial"), s.take(2000))
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("doc_id") && !readSchema.contains("n_chars"), readSchema)
  }

  test("q94 source cap: WindowGroupLimit bounds each map partition to k rows per group") {
    val df = SparkEntry.queries("q94_source_cap")(spark, sf())
    df.collect()
    val s = planString(df)
    assert(s.contains("WindowGroupLimit"), s.take(2000))
    assert(s.contains("Partial"), s.take(2000))
  }

  test("q60 sequence packing: one shared shard shuffle (ReusedExchange), broadcast offsets") {
    val df = SparkEntry.queries("q60_seq_packing")(spark, sf())
    df.collect() // AQE stage reuse shows only in the final plan
    val s = planString(df).split("== Initial Plan ==").head
    // both prefix-sum phases must be served from ONE scan + shuffle
    assert(s.contains("ReusedExchange"), s.take(3000))
    assert("Exchange hashpartitioning\\(__shard".r.findAllIn(s).size === 2, s.take(3000)) // original + its reuse
    // shard offsets come back via broadcast, never a second data shuffle
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
  }

  test("q61 k-means: codebook is broadcast; assignment never shuffles vectors") {
    val df = SparkEntry.queries("q61_kmeans")(spark, sf())
    df.collect()
    val s = planString(df)
    assert(s.contains("BroadcastExchange"), s.take(3000))
    assert(!s.contains("CartesianProduct"), "codebook cross product degraded to a real cartesian")
    // the only row-data exchanges hash on slim keys (vec_id / cell), 32 partitions
    assert(!s.contains("SortMergeJoin"), s.take(3000))
  }

  test("q62 pii scrub is a single codegen'd map-only pass") {
    val df = SparkEntry.queries("q62_pii_scrub")(spark, sf())
    val s  = planString(df)
    assert(!s.contains("Exchange"), s.take(2000))
    assert(s.contains("*("), s.take(2000)) // whole-stage codegen
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("lang"), readSchema)
  }

  test("q69 anomaly screen broadcasts the per-symbol stats; ticks never shuffle") {
    val df = SparkEntry.queries("q69_anomalies")(spark, sf())
    df.collect()
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"), "stats join degraded to SMJ")
  }

  test("q71 ema/macd: exactly one exchange (the symbol repartition), then an in-partition scan") {
    val df = SparkEntry.queries("q71_ema_macd")(spark, sf())
    val s  = planString(df)
    assert("Exchange".r.findAllIn(s).size === 2, s.take(3000)) // daily-stats agg + repartition(symbol)
    assert(s.contains("MapPartitions") || s.contains("mapPartitions"), s.take(3000))
  }

  test("q74 temperature sample: rates broadcast back, corpus filtered map-only") {
    val df = graft.operators.Profile.temperatureSample(
      Tables.documents(spark, sf()), col("source"), col("doc_id"))
    df.collect()
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"), s.take(2000))
  }

  test("q75 centroid outliers: centroids broadcast; corpus scored without a data shuffle") {
    val df = graft.operators.Similarity.centroidOutliers(
      Tables.embeddings(spark, sf()), col("label"), 3)
    df.collect()
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"), s.take(2000))
  }

  test("q72 tfidf: per-doc top-3 gets the WindowGroupLimit pushdown; df join broadcasts") {
    val df = SparkEntry.queries("q72_tfidf")(spark, sf())
    df.collect()
    val s = planString(df)
    assert(s.contains("WindowGroupLimit"), s.take(3000))
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
    assert(!s.contains("SortMergeJoin"), s.take(3000))
  }

  test("q73 bm25: df and corpus stats broadcast; no sort-merge joins") {
    val df = SparkEntry.queries("q73_bm25")(spark, sf())
    df.collect()
    val s = planString(df)
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2, s.take(3000))
    assert(!s.contains("SortMergeJoin"), s.take(3000))
  }

  test("q96 semdedup: codebook broadcast for assignment; pairwise join is cell-keyed, never cartesian") {
    val df = SparkEntry.queries("q96_semdedup")(spark, sf())
    df.collect()
    val s = planString(df)
    // nearestCell's codebook cross product is broadcast (tiny k rows)
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s.take(3000))
    // the within-cluster self-join is an equi-join on cell — the
    // blocking contract; a CartesianProduct here is the quadratic bug
    assert(!s.contains("CartesianProduct"), s.take(3000))
    assert(s.contains("cell"), s.take(3000))
  }

  test("q81 deciles: the data relation never crosses an unpartitioned window") {
    val df = SparkEntry.queries("q81_volume_deciles")(spark, sf())
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    // descend through AQE stage wrappers: a materialized
    // QueryStageExec exposes its subtree via .plan, not .children
    def flat(p: SparkPlan): Seq[SparkPlan] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: flat(q.plan)
      case _ => p +: (p.children ++ p.subqueries).flatMap(flat)
    }
    val unpart = flat(finalPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    // globalNtile's one unpartitioned window is the shard-offset prefix
    // sum over a per-shard AGGREGATE (≤ shards rows, constant at any
    // data scale) — anything else under it would be the one-reducer bug
    assert(unpart.nonEmpty, "expected the constant-size offsets window")
    unpart.foreach { w =>
      assert(
        flat(w.child).exists(
          _.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec]),
        w.toString.take(500))
    }
  }

  test("q66 drawdown: no single-partition window anywhere in the plan") {
    val df = SparkEntry.queries("q66_drawdown")(spark, sf())
    val s  = planString(df)
    assert(!s.contains("Exchange SinglePartition"), s.take(3000))
    assert(s.contains("Window"), s.take(3000))
  }

  test("q97 DSIR: corpus exploded once — consumers reuse the (doc,bucket) exchange; dict broadcast") {
    val df = SparkEntry.queries("q97_dsir_weights")(spark, sf())
    df.collect() // let AQE finalize
    val s = planString(df)
    // three consumers (target dist, raw dist, per-doc score) must hang
    // off ONE occurrence-grain aggregate, not re-explode the corpus
    assert(s.contains("ReusedExchange"), s.take(3000))
    // the buckets-row dictionary joins broadcast — the collapsed corpus
    // side never shuffles for the score join
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
  }

  test("q98 source drift: one (source,token) pass — downstream relations reuse its exchange") {
    val df = SparkEntry.queries("q98_source_drift")(spark, sf())
    df.collect() // let AQE finalize
    val s = planString(df)
    // totg / vocabulary / grid all derive from the single (source,token)
    // hash-agg — the exploded token relation is scanned once
    assert(s.contains("ReusedExchange"), s.take(3000))
  }

  test("partitioned OHLCV reads prune partitions on (symbol, date) predicates") {
    // covered end-to-end in OhlcvEtlSpec; here assert the testdata scan
    // prunes columns for a 2-column projection
    val df = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val readSchema = planString(df).linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
  }

  test("q106 paragraph dedup: one corpus exchange (reused), banned list broadcast, doc_id partitioning reused by both aggs") {
    val df = SparkEntry.queries("q106_paragraph_dedup")(spark, sf())
    df.collect() // AQE finalizes — exchange reuse only appears at runtime
    // executedPlan.toString prints Final AND Initial plans — judge the final only
    val s = planString(df).split("== Initial Plan ==").head
    // banned segments join back via broadcast, never a corpus shuffle
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"), "banned-list join degraded to SMJ")
    // the token-scale exchange feeds both the main path and the df
    // branch — the second consumer must reuse it, not reshuffle
    assert(s.contains("ReusedExchange") || s.contains("ReusedQueryStage"),
      "segs subtree reshuffled the corpus instead of reusing the doc_id exchange:\n" + s.take(3000))
    // total shuffle exchanges: doc_id tokens + segment-hash df agg only
    val shuffles = s.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
    assert(shuffles <= 2, s"expected ≤2 shuffle exchanges, found $shuffles:\n" + s.take(3000))
  }

  test("q107 chunking is map-only: no Exchange, pruned scan") {
    val df = SparkEntry.queries("q107_chunking")(spark, sf())
    val s  = planString(df)
    assert(!s.contains("Exchange"), s.take(2000))
    assert(s.contains("Generate"), s.take(2000)) // the window-start explode
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("n_chars"), readSchema)
  }

  test("q108 global shuffle: ONE hash exchange on shard, no global sort funnel") {
    val df = SparkEntry.queries("q108_global_shuffle")(spark, sf())
    val s  = planString(df)
    val shuffles = s.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
    assert(shuffles === 1, s"expected exactly 1 shuffle:\n" + s.take(3000))
    assert(!s.contains("Exchange SinglePartition"), s.take(3000))
    assert(!s.contains("rangepartitioning"), s.take(3000)) // per-shard sort, not a global one
  }

  test("q111 semantic decontamination: benchmark broadcast, corpus never shuffled before the agg") {
    val df = SparkEntry.queries("q111_semantic_decontamination")(spark, sf())
    val s  = planString(df)
    assert(s.contains("BroadcastExchange"), s.take(3000))
    assert(!s.contains("SortMergeJoin"), s.take(3000))
    // the only non-broadcast exchange is the final per-vec_id hash agg
    val shuffles = s.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
    assert(shuffles <= 1, s"corpus must not shuffle before the max-cos agg:\n" + s.take(3000))
  }

  test("q115 realized epochs: plan broadcast back, expansion is a map-side Generate") {
    val df = SparkEntry.queries("q115_realized_epochs")(spark, sf())
    val s  = planString(df)
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
    assert(s.contains("Generate"), s.take(3000))
    assert(!s.contains("SortMergeJoin"), s.take(3000))
  }

  test("q104 bloom gate: only the bloom-hit sliver reaches the history join; novel rows never join") {
    val df = SparkEntry.queries("q104_bloom_dedup_gate")(spark, sf())
    df.collect()
    val s = planString(df)
    // the history join must sit ABOVE the bloom-membership filter:
    // every join operator's subtree contains the UDF hit-filter, so
    // bloom-miss (provably novel) rows bypass the join entirely
    val joins = s.linesIterator.zipWithIndex.filter(_._1.contains("HashJoin")).map(_._2).toSeq
    assert(joins.nonEmpty, s.take(2000))
    val lines = s.linesIterator.toIndexedSeq
    joins.foreach { j =>
      val subtree = lines.drop(j).take(15).mkString("\n")
      assert(subtree.contains("Filter") && subtree.contains("might_contain"),
        s"history join not gated by the bloom filter:\n$subtree")
    }
    // membership is the native codegen'd expression, not a Scala UDF:
    // the gate filter must carry the whole-stage-codegen `*(n)` marker.
    // AQE's toString appends an un-annotated "Initial Plan" section —
    // only the final plan's operators carry codegen markers.
    assert(!s.contains("UDF"), "bloom gate regressed to a Scala UDF:\n" + s.take(2000))
    val finalPlan = lines.takeWhile(!_.contains("== Initial Plan =="))
    val gate = finalPlan.filter(l => l.contains("Filter") && l.contains("might_contain"))
    assert(gate.nonEmpty, s.take(2000))
    gate.foreach(l => assert(
      l.indexOf("*(") >= 0 && l.indexOf("*(") < l.indexOf("Filter"),
      s"bloom gate filter not codegen'd: $l"))
  }

  test("q117 char stats: map-only — no Exchange, scan pruned to (doc_id, text)") {
    val df = SparkEntry.queries("q117_char_stats")(spark, sf())
    val s  = planString(df)
    assert(!s.contains("Exchange"), "char stats must not shuffle — the explode form would:\n" + s.take(2000))
    val scanLine = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scanLine.contains("doc_id") && !scanLine.contains("lang"), scanLine)
  }

  test("q119 dedup token yield: one fingerprint exchange feeds window AND rollup (no second corpus shuffle)") {
    val df = SparkEntry.queries("q119_dedup_token_yield")(spark, sf())
    df.collect()
    val s = planString(df)
    // exactly one exchange of the doc relation (on fp) plus the final
    // |sources|-row agg exchange — nothing else (count only the final
    // plan; AQE's toString repeats the initial plan below it)
    val finalPlan = s.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 2, s"expected ≤2 hash exchanges (fp window + source agg), got $exchanges:\n${s.take(3000)}")
  }

  test("q120 hard negatives: query side broadcast, rank is WindowGroupLimit, corpus never shuffles pre-join") {
    val df = SparkEntry.queries("q120_hard_negatives")(spark, sf())
    df.collect()
    val s = planString(df)
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"), s.take(2000))
    assert(s.contains("WindowGroupLimit"), "top-k must prune before the full sort:\n" + s.take(2000))
    assert(!s.contains("SortMergeJoin"), s.take(2000))
  }

  test("q122 risk stats: composite joined broadcast-shaped; both aggs have map-side partials") {
    val df = SparkEntry.queries("q122_risk_stats")(spark, sf())
    df.collect()
    val s = planString(df)
    assert(s.contains("partial_sum"), s.take(2000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("q123 donchian: both window frames share ONE sort — a single exchange on symbol") {
    val df = SparkEntry.queries("q123_donchian")(spark, sf())
    val s  = planString(df)
    // rolling extrema + lag must ride the same (symbol, bucket_start)
    // sort: one hashpartitioning(symbol) exchange for the window stage
    // (upstream candle agg has its own); never a global single-partition
    // window
    assert(!s.contains("SinglePartition"), "unpartitioned window leaked in:\n" + s.take(2000))
    val windowSorts = "Sort \\[symbol".r.findAllIn(s).size
    assert(windowSorts <= 1, s"window frames did not share a sort:\n${s.take(3000)}")
  }

  test("q137/q138 rule gates are map-only passes: no Exchange, scan pruned to (doc_id, text)") {
    for (q <- Seq("q137_heuristic_gate", "q138_script_profile")) {
      val s = planString(SparkEntry.queries(q)(spark, sf()))
      assert(!s.contains("Exchange"), s"$q must not shuffle:\n${s.take(2000)}")
      val scanLine = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
      assert(scanLine.contains("doc_id") && !scanLine.contains("lang"), s"$q scan not pruned: $scanLine")
    }
  }

  test("q135 SQ8 encode: per-dim scales join back as a broadcast, never a shuffle join") {
    val df = SparkEntry.queries("q135_sq8_codes")(spark, sf())
    val s  = planString(df)
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin"), "scales (|dims| rows) must broadcast:\n" + s.take(2000))
  }

  test("q142 IVFADC serving: distance tables broadcast onto the code lists") {
    val df = SparkEntry.queries("q142_ivfpq_topk")(spark, sf())
    df.collect()
    val s = planString(df)
    // the (cell, sub, code) table join is the serving hot path — it
    // must be a broadcast of the |queries|·nProbe·m·k table, and
    // nothing in the plan may fall back to a cartesian product
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("q144 triplet mining: no corpus-fraction broadcast — probes and pairs ride keyed shuffles, only the 8-row codebook broadcasts") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val df = SparkEntry.queries("q144_triplet_mining")(spark, sf())
    df.collect()
    val s = planString(df)
    // negatives are mined through the IVF index: the anchor/probe
    // relation (corpus-fraction) must meet the cell-assigned corpus in
    // a SHUFFLE hash join, and the pair↔negative stitch likewise —
    // never a broadcast of anything that scales with the corpus
    assert(s.contains("ShuffledHashJoin"),
      "probe/pair joins must be keyed shuffles:\n" + s.take(3000))
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    val bcasts = allNodes(df.queryExecution.executedPlan)
      .collect { case b: BroadcastExchangeExec => b }
    assert(bcasts.nonEmpty, "expected the codebook broadcast in the q144 plan")
    bcasts.foreach { b =>
      val rows = b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      assert(rows <= 8L,
        s"corpus-fraction relation broadcast ($rows rows): ${b.simpleStringWithNodeId()}\n${s.take(3000)}")
    }
  }

  test("q102/q142/q159 serve from MATERIALIZED codes: the persisted code relation feeds the plan") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    for (q <- Seq("q102_pq_topk", "q142_ivfpq_topk", "q159_pq_rerank")) {
      val df = SparkEntry.queries(q)(spark, sf())
      df.collect()
      // encode once, serve forever: the serving/audit plan reads the
      // shared persisted code relation instead of re-encoding the
      // corpus — a refactor that silently re-derives codes fails here
      assert(
        allNodes(df.queryExecution.executedPlan).exists(_.isInstanceOf[InMemoryTableScanExec]),
        s"$q must serve from the materialized code relation:\n" + planString(df).take(2000))
    }
  }

  test("q116 RRF fusion: the qid×lexical-list cross join broadcasts the top-k side pre-AQE") {
    val df = SparkEntry.queries("q116_hybrid_rrf")(spark, sf())
    // sparkPlan = the INITIAL physical plan, before any AQE re-plan:
    // the ≤ topK-row lexical list must broadcast because the hint says
    // so, not because AQE happened to notice the size at runtime.
    val s = df.queryExecution.sparkPlan.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
      "rrfFuse qid×lexical join must be a pinned broadcast:\n" + s.take(3000))
    assert(!s.contains("CartesianProduct"), s.take(3000))
  }

  test("q161 BPE pairs: top-k is TakeOrderedAndProject (per-partition heaps), never a global sort of the pair universe") {
    val df = SparkEntry.queries("q161_bpe_pair_counts")(spark, sf())
    val s = planString(df)
    assert(s.contains("TakeOrderedAndProject"), s.take(2000))
  }

  test("q153 curation funnel: single-pass — stage gates come from cached sets, one tiny cumulative expansion") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.UnionExec
    val df = SparkEntry.queries("q153_curation_funnel")(spark, sf())
    df.collect()
    // Structural walk of the EXECUTED tree only — it stops at cache
    // boundaries, so whatever lives inside a persisted gate set
    // (including the cluster contraction's internal Union) is computed
    // once at cache fill, not per funnel run.
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    val nodes = allNodes(df.queryExecution.executedPlan)
    // the gate sets (dedup keeps, contamination flags) are persisted
    // intermediates: the funnel reads them as InMemoryTableScans
    // instead of re-deriving the shingle/gram joins per stage
    assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
      "gate sets must be served from the cache:\n" + planString(df).take(3000))
    // the old shape was five unioned agg branches re-deriving the
    // stage-chain prefix; the rewrite is ONE classified pass + a 5-row
    // cumulative expansion — no Union survives in the funnel itself
    assert(!nodes.exists(_.isInstanceOf[UnionExec]),
      "funnel must not recompute per-stage branches:\n" + planString(df).take(3000))
  }

  test("q174 preference pairs: rank windows take the map-side WindowGroupLimit") {
    val df = SparkEntry.queries("q174_preference_pairs")(spark, sf())
    val s = planString(df)
    // the row_number() = 1 filters must push as group-limits so each
    // map partition forwards one candidate per group, never the group
    assert(s.contains("WindowGroupLimit"), s.take(2500))
  }

  test("q177 snapshot diff: keyed full-outer join, payload and unused columns pruned") {
    val df = SparkEntry.queries("q177_snapshot_diff")(spark, sf())
    val s = planString(df)
    // one co-partitioned keyed join — never a nested-loop variant
    assert(s.contains("SortMergeJoin") && s.contains("FullOuter"), s.take(2500))
    // column pruning must reach the scans: the diff never reads
    // lang/source. 4 scans: OLD = base + two shadow populations
    // (3-way union), NEW = 1.
    val scans = s.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size === 4, s.take(2500))
    scans.foreach { sc =>
      assert(!sc.contains("lang") && !sc.contains("source"),
        s"unused column read by the diff scan:\n$sc")
    }
    // output is id+status sized — payload dropped before leaving the join
    assert(df.columns.toSeq === Seq("snap_id", "status"))
  }

  test("q178 modality coverage: embeddings scan prunes the vector column") {
    val df = SparkEntry.queries("q178_modality_coverage")(spark, sf())
    val s = planString(df)
    // the cover side needs only the KEY — reading the wide float-array
    // embedding column for a coverage count would be a 100-TB accident
    val emb = s.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("embeddings.parquet"))
      .getOrElse(fail(s"no embeddings scan in plan:\n${s.take(2500)}"))
    assert(emb.contains("ReadSchema: struct<vec_id:bigint>"),
      s"embedding column not pruned:\n$emb")
  }

  test("q181 domain reputation: exact distinct via two-level agg — no Expand") {
    val df = SparkEntry.queries("q181_domain_reputation")(spark, sf())
    val s = planString(df)
    // count + count-distinct in ONE agg would plan an Expand (row
    // replication per distinct column); the (host, url) pre-collapse
    // keeps both aggs plain map-side-combined hash-aggs
    assert(!s.contains("Expand"), s.take(2500))
    assert(s.contains("HashAggregate"), s.take(2500))
  }

  test("q171 pair join rides distinct-fingerprint representatives (exact layer first)") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val df = SparkEntry.queries("q171_image_neardup_distinct")(spark, sf())
    df.collect()
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    // Every band-block Generate (the posexplode feeding the pair join)
    // must sit ABOVE the sh-keyed collapse: the join's input is the
    // distinct-fingerprint representative relation, never the raw
    // per-image hash relation — the property that keeps pair mass
    // ∝ distinct fingerprints instead of ∝ K² on a dup-dense corpus.
    val gens = allNodes(df.queryExecution.executedPlan).collect { case g: GenerateExec => g }
    assert(gens.nonEmpty, "expected band-block Generates in the q171 plan:\n" +
      planString(df).take(3000))
    gens.foreach { g =>
      val collapsedBelow = allNodes(g).exists {
        case a: BaseAggregateExec =>
          a.groupingExpressions.exists(_.references.exists(_.name == "sh"))
        case _ => false
      }
      assert(collapsedBelow,
        "band blocks must derive from the sh-collapsed representative relation:\n" +
          g.toString.take(2000))
    }
  }

  test("q185 hashed quality is a map-only pass: no Exchange, scan pruned to (doc_id, text)") {
    val s = planString(SparkEntry.queries("q185_hashed_quality")(spark, sf()))
    assert(!s.contains("Exchange"), s"q185 must not shuffle:\n${s.take(2000)}")
    val scanLine = s.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scanLine.contains("doc_id") && !scanLine.contains("lang"),
      s"q185 scan not pruned: $scanLine")
  }

  test("q186 CMS: counter relation broadcasts onto the probes — never a shuffle join") {
    val s = planString(SparkEntry.queries("q186_cms_heavyhitters")(spark, sf()))
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      "the ≤ depth·width counter relation must broadcast:\n" + s.take(2000))
    // top-N ground truth via per-partition heaps, not a global sort
    assert(s.contains("TakeOrderedAndProject"), s.take(2000))
  }

  test("q184 span surgery: keeper agg is Expand-free; ledger join is keyed, nothing corpus-sized broadcasts") {
    val s = planString(SparkEntry.queries("q184_span_surgery")(spark, sf()))
    assert(!s.contains("Expand"),
      "keeper (h → count, min) must use the two-level distinct shape, not Expand:\n" + s.take(3000))
    assert(!s.contains("BroadcastNestedLoopJoin"), s.take(2000))
  }

  test("q188 calibration: flag set distinct-collapses BELOW the outcome join; final agg is keyed on the bucket") {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    val df = SparkEntry.queries("q188_quality_calibration")(spark, sf())
    val s  = planString(df)
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"), s.take(2000))
    // the keep-set must reach the left join as a distinct id relation —
    // a dup-bearing flag side would double-count n_flagged
    val joins = allNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.sql == "LEFT OUTER" => j
    }
    assert(joins.nonEmpty, "expected the outcome LEFT join in the q188 plan:\n" + s.take(3000))
    joins.foreach { j =>
      val collapsed = allNodes(j.right).exists {
        case a: BaseAggregateExec => a.aggregateExpressions.isEmpty // pure distinct
        case _ => false
      }
      assert(collapsed,
        "flag set must be distinct-collapsed below the join:\n" + j.toString.take(2000))
    }
  }

  test("q189 HLL: grams explode as LONGS (no gram-string explode); register agg is map-side combined; no Expand") {
    val df = SparkEntry.queries("q189_hll_distinct")(spark, sf())
    val s  = planString(df)
    assert(!s.contains("Expand"),
      "register max and exact distinct must not plan an Expand:\n" + s.take(3000))
    // the 16×-at-×100 lesson: the Generate (explode) must OUTPUT the
    // hashed bigint column — concat_ws may appear only INSIDE the
    // transform lambda, so the exploded rows carry longs, not grams
    val genLines = s.linesIterator.filter(_.contains("Generate")).toSeq
    assert(genLines.nonEmpty, s.take(3000))
    genLines.foreach { g =>
      assert(g.contains("as bigint"),
        s"explode element type must be the hashed bigint: $g")
      assert(g.replaceAll(".*\\], \\[", "[").matches("\\[\\w+#\\d+L\\].*") ||
        g.trim.endsWith("L]"),
        s"Generate output must be a single long attribute: $g")
    }
    // partial max below the exchange (map-side combine on the registers)
    assert(s.contains("partial_max") || s.contains("HashAggregate"),
      "expected a partial register aggregate:\n" + s.take(3000))
  }

  test("q190 domain reweight: exactly 2 parquet scans (no crossJoin-broadcast replanning fan-out)") {
    val df = SparkEntry.queries("q190_domain_reweight")(spark, sf())
    val s  = planString(df)
    // The naive totals-via-crossJoin(broadcast(agg)) form planned 16
    // scans (pruning makes self-referencing subtrees non-identical, so
    // ReuseExchange never fires). The single-flow window form is 2:
    // the token pass and the source-column doc-count pass.
    val scans = s.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 2, s"expected 2 parquet scans, got $scans:\n" + s.take(3000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("q192 budget selection: the corpus-sized cumsum window is SHARD-partitioned (no single-reducer global window)") {
    val df = SparkEntry.queries("q192_budget_selection")(spark, sf())
    val s  = planString(df)
    // the two-phase prefix sum: per-shard windowed cumsum + tiny
    // offset relation. An unpartitioned Window may appear ONLY on the
    // <= shards-row offsets side; the cumsum window must carry the
    // __shard partition spec.
    assert(s.contains("__shard"),
      "expected the sharded cumsum window:\n" + s.take(3000))
    val winLines = s.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.exists(_.contains("__shard")),
      "cumsum window must be partitioned by __shard:\n" + winLines.mkString("\n"))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("q191 audio VAD: ONE scan; n_frames rides the decoder rows (no join back to the media table)") {
    val df = SparkEntry.queries("q191_audio_vad")(spark, sf())
    val s  = planString(df)
    val scans = s.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected 1 parquet scan, got $scans:\n" + s.take(3000))
    // encode + decode are per-partition kernels (the documented codec
    // boundary) — payloads never shuffle; the per-item window is the
    // only wide stage besides the final aggs
    assert(s.contains("Window"), "expected the gaps-and-islands window:\n" + s.take(3000))
    assert(!s.toLowerCase.contains("sortmergejoin") && !s.contains("BroadcastHashJoin"),
      "VAD must not join back to the media table:\n" + s.take(3000))
    // the scan reads ONLY doc_id: the WAV payload is generated from
    // the manifest, and text/lang/source must not ride along
    val scanLine = s.linesIterator.find(_.contains("Scan parquet")).getOrElse("")
    assert(scanLine.contains("doc_id") && !scanLine.contains("text"),
      s"audio chain reads more than doc_id: $scanLine")
  }

  test("q204 video scenes: ONE scan reading only doc_id; no join back to the media table") {
    val df = SparkEntry.queries("q204_video_scenes")(spark, sf())
    val s  = planString(df)
    // the shared DirCached artifact may serve the frames from its
    // materialized parquet — either way exactly ONE scan feeds the
    // chain and the container decode is a per-partition kernel
    val scans = s.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected 1 parquet scan, got $scans:\n" + s.take(3000))
    assert(s.contains("Window"), "expected the gaps-and-islands window:\n" + s.take(3000))
    assert(!s.toLowerCase.contains("sortmergejoin") && !s.contains("BroadcastHashJoin"),
      "scene segmentation must not join back to the media table:\n" + s.take(3000))
    val scanLine = s.linesIterator.find(_.contains("Scan parquet")).getOrElse("")
    assert(!scanLine.contains("text"),
      s"video chain reads more than it needs: $scanLine")
  }

  test("q196 capped mutual pairs: B side head-capped BELOW the cell join (candidate mass linear in |A|)") {
    val df = SparkEntry.queries("q196_mutual_pairs_capped")(spark, sf())
    df.collect()
    val s = planString(df)
    // the cap's observe node (CollectMetrics mutual_pair_cell_cap)
    // must ride the B-side subtree — its ABSENCE means the cap was
    // dropped and the join is back to the quadratic Σ|A∩cell|·|B∩cell|
    val capIdx = s.indexOf("mutual_pair_cell_cap")
    assert(capIdx >= 0, "hot-cell cap metric missing from the plan:\n" + s.take(3000))
    // ...and must sit BELOW the A×B cell join: in top-down plan text
    // the join line precedes its subtrees, so the first cell-keyed
    // join must appear before the cap node
    val joinIdx = s.linesIterator
      .scanLeft(0)((acc, l) => acc + l.length + 1).zip(s.linesIterator.toSeq)
      .collectFirst { case (off, l)
        if (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
          l.contains("BroadcastHashJoin")) && l.contains("cell") => off }
    assert(joinIdx.exists(_ < capIdx),
      "cap must be a descendant of the cell join's build side:\n" + s.take(3000))
    assert(!s.contains("CartesianProduct"), s.take(2000))
  }

  test("q197/q198 prescored ranks: scorer runs ONCE (all leaves are the cached artifact) and every corpus window is shard-partitioned") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    for (q <- Seq("q197_budget_prescored", "q198_rank_prescored")) {
      val df = SparkEntry.queries(q)(spark, sf())
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      // the TWO-EVALUATION LAW made production: the ranker's branches
      // may reference their input many times, but every reference is
      // a cache read of the score-once artifact — a FileSourceScan in
      // the CONSUMING plan means a scorer re-evaluation leaked back in
      val fileScans = nodes.collect { case f: FileSourceScanExec => f }
      assert(fileScans.isEmpty,
        s"$q re-evaluates its scorer (corpus scan in the rank plan):\n" +
          fileScans.map(_.toString.take(300)).mkString("\n"))
      assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
        s"$q: expected the materialized score artifact as the rank input")
      // every corpus-sized window rides a __shard partition spec; an
      // UNPARTITIONED window may only be the ≤|shards|-row offset side
      val unsharded = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
          !w.toString.contains("__shard") => w
      }
      assert(unsharded.isEmpty,
        s"$q has a single-reducer corpus window:\n" +
          unsharded.map(_.toString.take(300)).mkString("\n"))
    }
  }

  test("q199 multi-round DoReMi: per-round cost rides the CACHED partials — no corpus re-scan per round") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    val df = SparkEntry.queries("q199_doremi_rounds")(spark, sf())
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    // the corpus collapses ONCE into the persisted (source, cell)
    // partial relation; both MW rounds consume the cache — a
    // FileSourceScan in the consuming plan means a round went back to
    // the corpus (the thing that makes an iterated loop a re-scan ×
    // rounds accident at 100 TB)
    val fileScans = nodes.collect { case f: FileSourceScanExec => f }
    assert(fileScans.isEmpty,
      "a DoReMi round re-scans the corpus:\n" +
        fileScans.map(_.toString.take(300)).mkString("\n"))
    assert(nodes.exists(_.isInstanceOf[InMemoryTableScanExec]),
      "expected the cached (source, cell) partials as every round's input")
    assert(!planString(df).contains("CartesianProduct"), planString(df).take(2000))
  }

  test("q200 doremi realize: weights ride the cached loop, the shard scans at most twice, plan broadcast back, expansion map-side") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
        case q: QueryStageExec        => allNodes(q.plan)
        case _                        => Seq.empty
      })
    val df = SparkEntry.queries("q200_doremi_realize")(spark, sf())
    df.collect()
    val s = planString(df)
    // the |sources|-row repeat plan comes back as a broadcast, and
    // the epoch expansion is a Generate over it — a SortMergeJoin or
    // shuffle of the shard here would move the corpus to realize a
    // 20-row plan
    assert(s.contains("BroadcastHashJoin"), s.take(3000))
    assert(s.contains("Generate"), s.take(3000))
    // file scans in the realize plan: the shard's mass pass (token
    // counts for p_d) + the expansion pass — the w2 weights must come
    // from q199's cached loop, not re-scans (>2 corpus scans means
    // the MW rounds went back to the files)
    val fileScans = allNodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(fileScans.size <= 2,
      s"realization re-scans the corpus ${fileScans.size}x:\n" +
        fileScans.map(_.toString.take(200)).mkString("\n"))
  }
}
