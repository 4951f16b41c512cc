package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  * Extension beyond the reference (which has no vector data).
  *
  * Determinism: embeddings are quantized to exact int64
  * ([[Portable.quantize]]) so dot products and norms are exact integer
  * arithmetic — identical on Spark and the DuckDB oracle regardless of
  * summation order — and only the final cosine performs
  * correctly-rounded double sqrt/divide.
  *
  * Scale design: the query side is tiny and BROADCAST — the corpus
  * side is never shuffled in brute force. Per-query top-k uses a
  * rank-window partitioned by query id (k small ⇒
  * `TakeOrderedAndProject`-like behavior per partition group). The LSH
  * variant prunes the corpus to one bucket per query: bucket ids are
  * computed whole-row from plan-time hyperplane literals (no shuffle to
  * assign), then a bucket-key equi-join replaces the cross product —
  * at 1000 executors the corpus stays partitioned by bucket and only
  * matching partitions are read if bucketed at write time.
  */
object Similarity {

  /** Number of LSH hyperplanes → 2^H buckets. */
  val H = 8

  /** Deterministic integer hyperplanes in [−1000, 1000]^dim, derived
    * from md5 so the oracle can recompute them in SQL:
    * v(h,i) = (hash60("hp_h_i") mod 2001) − 1000, i being 1-based. */
  def hyperplanes(dim: Int): Seq[Seq[Long]] =
    (0 until H).map(h => (1 to dim).map(i => Portable.hash60Local(s"hp_${h}_$i") % 2001L - 1000L))

  /** Exact int64 squared norm of a quantized vector. */
  def normQ(v: Column): Column = Portable.dotQ(v, v)

  /** Cosine from exact integer dot/norms; null-safe on zero vectors. */
  def cosine(dot: Column, na2: Column, nb2: Column): Column =
    when(na2 > 0 && nb2 > 0, dot.cast("double") / (sqrt(na2.cast("double")) * sqrt(nb2.cast("double"))))

  // ---- Query-side plumbing ----------------------------------------
  //
  // Every retrieval entry point takes its query set as a RELATION with
  // the corpus schema (vec_id, embedding, …) — the production shape: a
  // query batch is data, not an expression. The `Seq[Long]` overloads
  // are sugar for the interactive handful-of-probes case; they select
  // the query rows with an In-list (which parquet pushdown prunes at
  // the scan) and delegate to the relation core, so the probe/join
  // machinery itself NEVER holds an id list in its expression tree —
  // a 10⁴–10⁵-id batch neither bloats the plan nor the task binaries.

  /** The Seq-overload sugar: the corpus rows whose id is in `ids`
    * (In-list → parquet PushedFilters — right for a small driver-side
    * probe list; a big query batch should arrive as a relation). */
  private def idRows(embs: DataFrame, ids: Seq[Long]): DataFrame =
    embs.filter(col("vec_id").isin(ids: _*))

  /** Brute-force cosine top-k: every query (a small relation with the
    * corpus schema, broadcast) against the whole corpus; rank per
    * query. Exact baseline. */
  def bruteForceTopK(embs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("qid"), Portable.quantize(col("embedding")).as("qv"))
      .withColumn("qn2", normQ(col("qv")))
    val c = embs
      .select(col("vec_id").as("cid"), Portable.quantize(col("embedding")).as("cv"))
      .withColumn("cn2", normQ(col("cv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cosine", cosine(Portable.dotQ(col("qv"), col("cv")), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  /** [[bruteForceTopK]] sugar for a driver-side id list. */
  def bruteForceTopK(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    bruteForceTopK(embs, idRows(embs, queryIds), k)

  /** Brute-force EXACT squared-L2 top-k over the quantized vectors:
    * d² = ‖q‖² + ‖c‖² − 2·q·c in pure int64 — the truth baseline for
    * distance-ranked indexes ([[pqTopKWith]] ranks by ADC L2², so its
    * recall must be audited against L2 truth, not cosine truth). */
  def bruteForceL2TopK(embs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(col("vec_id").as("qid"), Portable.quantize(col("embedding")).as("qv"))
      .withColumn("qn2", normQ(col("qv")))
    val c = embs
      .select(col("vec_id").as("cid"), Portable.quantize(col("embedding")).as("cv"))
      .withColumn("cn2", normQ(col("cv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("d2", col("qn2") + col("cn2") - lit(2L) * Portable.dotQ(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(asc("d2"), asc("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("d2"), col("rank"))
  }

  /** [[bruteForceL2TopK]] sugar for a driver-side id list. */
  def bruteForceL2TopK(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    bruteForceL2TopK(embs, idRows(embs, queryIds), k)

  /** LSH bucket id (0..2^H−1) of a quantized vector: bit h is the sign
    * of the exact integer dot with hyperplane h. Statically unrolled —
    * whole-row, codegen-friendly, zero shuffle to assign buckets. */
  def bucketId(v: Column, dim: Int): Column =
    hyperplanes(dim).zipWithIndex.map { case (hp, h) =>
      val dot = Portable.dotQ(v, typedlit(hp))
      when(dot > 0, lit(1L << h)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs: LSH banding for blocking
    * (two 4-hyperplane bands → 16-value band keys; a pair collides if
    * EITHER band matches — multi-probe recall), then exact int64
    * cosine rescoring against `threshold`. Only same-band pairs are
    * ever materialized — the all-pairs cross product never exists.
    * The vector analogue of [[TextDedup.lshPairs]]. */
  def neardupPairs(embs: DataFrame, dim: Int, threshold: Double): DataFrame =
    neardupPairsQ(
      embs.select(col("vec_id"), Portable.quantize(col("embedding")).as("v")),
      dim, threshold)

  /** [[neardupPairs]] core over an already-quantized (vec_id, v)
    * relation — shared by the direct form and [[neardupPairsViaReps]]
    * (which feeds it the rep rows only). */
  private def neardupPairsQ(quant: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val base = quant
      .withColumn("bucket", bucketId(col("v"), dim))
      .withColumn("n2", normQ(col("v")))
    // band 0 = low 4 bucket bits, band 1 = high 4
    val bands = base.select(
      col("vec_id"), col("v"), col("n2"),
      posexplode(array(
        col("bucket").bitwiseAND(lit(15L)),
        shiftright(col("bucket"), 4).bitwiseAND(lit(15L)))).as(Seq("band", "bval")))
    // Score in the join projection, THEN dedup on the slim
    // (vec_a, vec_b, cosine) triple: a pair colliding in both bands is
    // scored twice (identical value), but the dedup becomes a
    // HashAggregate over fixed-width columns. Deduping first would
    // carry the vectors through the exchange and force SortAggregate
    // (array-typed first()) — measured 3-5× slower.
    // both sides of the band self-join are the banded CORPUS — keyed
    // shuffle on the band key, never a broadcast (tiny-SF AQE would
    // happily broadcast 2N rows here; at corpus scale that's fatal)
    bands.as("a")
      .join(
        bands.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosine(Portable.dotQ(col("a.v"), col("b.v")), col("a.n2"), col("b.n2")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .dropDuplicates("vec_a", "vec_b")
  }

  /** [[neardupPairs]] via exact-vector collapse — the IDENTICAL
    * relation, computed reps-first (the vector twin of
    * [[TextDedup.lshPairsViaReps]]): group by the QUANTIZED vector
    * (everything downstream — bucket, bands, norms, cosine — is a
    * function of it alone), band-join one representative per distinct
    * vector, then expand rep pairs back to member pairs. Exactness:
    * byte-equal quantized vectors share every band value, so (a) two
    * members of one group always collide, scoring as the rep against
    * itself — computed with the SAME cosine expression the direct
    * form uses (n2/(√n2·√n2) is ulp-sensitive, so the value is
    * evaluated, never assumed 1.0; a zero vector's null cosine drops
    * its group's within pairs in both forms); (b) a cross-group pair
    * collides iff its reps do, with the reps' cosine.
    *
    * Why: embedding stores at corpus scale are copy-heavy (re-ingests,
    * mirrors keep the vector byte-identical), and the direct band
    * self-join is quadratic in copies; here copies cost one slim
    * group-by row each, the band join is quadratic only in DISTINCT
    * vectors, and the expansion is output-bound (measured ×100,
    * SCALING.md round-14). */
  def neardupPairsViaReps(embs: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val quant   = embs.select(col("vec_id"), Portable.quantize(col("embedding")).as("v"))
    val reps    = quant.groupBy(col("v")).agg(min(col("vec_id")).as("rep_id"))
    val members = quant.join(reps, Seq("v")).select(col("vec_id"), col("rep_id"))
    val repVecs = quant.join(
      members.filter(col("vec_id") === col("rep_id")).select(col("vec_id")),
      Seq("vec_id"), "left_semi")
    val repPairs = neardupPairsQ(repVecs, dim, threshold)
    val self = repVecs
      .withColumn("n2", normQ(col("v")))
      .select(
        col("vec_id").as("rep_id"),
        cosine(Portable.dotQ(col("v"), col("v")), col("n2"), col("n2")).as("cosine"))
      .filter(col("cosine") >= threshold)
    TextDedup.expandRepPairs(
      repPairs, members.withColumnRenamed("vec_id", "doc_id"), self,
      Seq("cosine"), "vec_a", "vec_b")
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCells`
    * Voronoi cells around deterministic seed centroids (the first
    * `nCells` vectors by id — a k-means iteration would refine them;
    * seeds keep the oracle exact), assign every vector to its nearest
    * centroid by exact integer cosine, then search only the query's
    * `nProbe` nearest cells with exact rescoring.
    *
    * Scale shape: the codebook is tiny and BROADCAST; assignment is a
    * broadcast cross product + one SLIM hash-aggregate (vec_id → cell,
    * map-side combined — vectors never ride the shuffle); the probe is
    * a cell-key equi-join against the broadcast query set. With the
    * corpus written bucketed by cell id, a probe touches only matching
    * buckets. */
  def ivfTopK(embs: DataFrame, queries: DataFrame, nCells: Int, nProbe: Int, k: Int): DataFrame =
    ivfTopKWith(embs, seedCentroids(embs, nCells), queries, nProbe, k)

  /** [[ivfTopK]] sugar for a driver-side id list. */
  def ivfTopK(embs: DataFrame, queryIds: Seq[Long], nCells: Int, nProbe: Int, k: Int): DataFrame =
    ivfTopK(embs, idRows(embs, queryIds), nCells, nProbe, k)

  /** [[ivfTopK]] against an EXPLICIT codebook relation (cell, cv, cn2)
    * — pass [[kmeansCentroids]] output to serve ANN from a trained
    * codebook instead of raw seeds (train once, index at write time,
    * probe forever: the production IVF lifecycle). */
  def ivfTopKWith(embs: DataFrame, codebook: DataFrame, queries: DataFrame, nProbe: Int, k: Int): DataFrame = {
    val base  = quantized(embs)
    val cents = codebook.select(col("cell"), col("cv"), col("cn2"))
    // cosine of every vector to every (broadcast) centroid
    val withCos = base.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(Portable.dotQ(col("v"), col("cv")), col("n2"), col("cn2")))
    // home cell per vector: slim max_by (hash-agg with map-side
    // combine; payload stays fixed-width), vectors joined back after.
    // Tie rule: max cosine, then LOWEST cell id (max of -cell).
    val homeCell = withCos
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("ccos"), (-col("cell")).as("nc"))).as("cell"))
    val assigned = base.join(homeCell, "vec_id")
    // queries probe their nProbe nearest cells: the QUERY relation gets
    // its own tiny centroid cross product — the corpus-wide withCos is
    // never filtered for probes, so no id expression rides the plan
    val probes = quantized(queries).crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(Portable.dotQ(col("v"), col("cv")), col("n2"), col("cn2")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(desc("ccos"), asc("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"), col("cell"))
    val scored = assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosine(Portable.dotQ(col("qv"), col("v")), col("qn2"), col("n2")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("cid"), col("cell"), col("cosine"), col("rank"))
  }

  /** [[ivfTopKWith]] sugar for a driver-side id list. */
  def ivfTopKWith(embs: DataFrame, codebook: DataFrame, queryIds: Seq[Long], nProbe: Int, k: Int): DataFrame =
    ivfTopKWith(embs, codebook, idRows(embs, queryIds), nProbe, k)

  /** Quantized corpus relation (vec_id, v, n2) — the common prefix of
    * every vector operator here. */
  private def quantized(embs: DataFrame): DataFrame =
    embs
      .select(col("vec_id"), Portable.quantize(col("embedding")).as("v"))
      .withColumn("n2", normQ(col("v")))

  /** Deterministic seed codebook (cell, cv, cn2): the first `nCells`
    * vectors by id. */
  def seedCentroids(embs: DataFrame, nCells: Int): DataFrame =
    quantized(embs)
      .filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"), col("n2").as("cn2"))

  /** Nearest codebook cell per vector: broadcast cross product folded
    * into a SLIM max_by hash-agg (vectors never ride the shuffle).
    * Ties go to the LOWEST cell id; `cosine` is the winning score
    * (= max over cells). */
  private def nearestCell(base: DataFrame, cents: DataFrame): DataFrame =
    base.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(Portable.dotQ(col("v"), col("cv")), col("n2"), col("cn2")))
      .groupBy(col("vec_id"))
      .agg(
        max_by(col("cell"), struct(col("ccos"), (-col("cell")).as("nc"))).as("cell"),
        max(col("ccos")).as("cosine"))

  /** Distributed k-means (Lloyd) codebook training over quantized
    * embeddings: `iters` assignment → centroid-update rounds from the
    * deterministic seeds, returning the trained codebook
    * (cell, cv, cn2) ready for [[ivfTopKWith]].
    *
    * Determinism across engines (the full-oracle contract):
    *  - seeds = the first `k` vectors by id (exact int64);
    *  - assignment = argmax cosine, ties to the LOWEST cell id;
    *  - cosine is scale-invariant, so the updated "mean" centroid can
    *    stay integer: component = trunc(sum / count), where the sum is
    *    an exact int64 and the single double divide + trunc-toward-zero
    *    round identically everywhere.
    *
    * Scale shape per iteration: the codebook is tiny and BROADCAST;
    * assignment is the slim [[nearestCell]] hash-agg; the centroid
    * update is posexplode → ONE map-side-combinable hash-agg on
    * (cell, dim) — k·dim result rows — then an array re-pack. No
    * collects, no driver-side numeric state; each iteration appends
    * two jobs to the lineage (for many iterations, checkpoint or
    * literalize the k-row codebook between rounds — it is
    * constant-size). Cells that lose all members drop out of the next
    * codebook (both engines agree). */
  def kmeansCentroids(embs: DataFrame, k: Int, iters: Int = 1): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    require(iters >= 0, s"iters must be non-negative (got $iters)")
    val base = quantized(embs)
    val seeds = seedCentroids(embs, k)
    // seed contract: ids [0, k) must exist, or the codebook trains
    // EMPTY and every downstream consumer (IVF serving, semdedup,
    // the vector ingest gate) silently drops every vector. The check
    // is LAZY — a poison relation that is empty when seeds exist and
    // raises at FIRST EXECUTION when they don't — so construction
    // stays side-effect-free: plan-only consumers (explain /
    // fingerprint passes) never trigger a Spark job, and a cold bench
    // timing isn't pre-warmed by a build-time probe. raise_error is
    // non-foldable, so the optimizer cannot evaluate it at plan time.
    val seedGuard = seeds
      .agg(count(lit(1)).as("__n")).filter(col("__n") === 0L)
      .select(
        assert_true(lit(false), lit(
          s"no seed centroids: no vec_id in [0, $k) exists in the training " +
            "relation — an empty codebook would silently drop every vector downstream"))
          .cast("bigint").as("cell"),
        lit(null).cast("array<bigint>").as("cv"),
        lit(null).cast("bigint").as("cn2"))
    var cents = seeds.unionByName(seedGuard)
    for (_ <- 0 until iters) {
      val assign = nearestCell(base, cents).select(col("vec_id"), col("cell"))
      cents = integerMeanCentroids(base.join(assign, "vec_id"), "cell")
    }
    cents
  }

  /** Elementwise integer-mean centroid per `key` over a (key, v)
    * relation — THE determinism contract every centroid consumer
    * shares ([[kmeansCentroids]], [[centroidOutliers]]): dim sums are
    * exact int64 « 2^53, so the double divide is exact-input and the
    * trunc-toward-zero cast matches the oracle everywhere. One
    * map-side-combinable (key, dim) hash-agg → |keys|·dim rows →
    * array re-pack. Returns (key, cv, cn2). */
  private def integerMeanCentroids(rows: DataFrame, keys: String*): DataFrame =
    rows
      .select(keys.map(col) :+ posexplode(col("v")).as(Seq("i", "x")): _*)
      .groupBy((keys :+ "i").map(col): _*)
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
      .withColumn("cx", (col("sx") / col("cnt")).cast("long"))
      .groupBy(keys.map(col): _*)
      .agg(collect_list(struct(col("i"), col("cx"))).as("ps"))
      .select(
        keys.map(col) :+
          transform(array_sort(col("ps")), p => p.getField("cx")).as("cv"): _*)
      .withColumn("cn2", normQ(col("cv")))

  // ---- Incremental codebook maintenance -----------------------------

  /** MERGEABLE k-means refresh STATE: per (cell, i), the exact int64
    * component sum and member count of the vectors assigned to `cell`
    * under the GIVEN codebook — the index-maintenance representation.
    * Everything is exact integer arithmetic, so
    * `state(old ∪ delta) == mergeCodebookStates(state(old),
    * state(delta))` holds BIT-identically: a nightly delta batch is
    * absorbed at O(|delta|) instead of re-scanning the corpus, the
    * k-means twin of [[Maintenance.aggregateState]] (oracle-gated).
    *
    * Scale shape: one slim assignment hash-agg + one (cell, dim)
    * hash-agg, both map-side combined; the state is k·dim rows. */
  def codebookState(embs: DataFrame, codebook: DataFrame): DataFrame = {
    val base = quantized(embs)
    val assign = nearestCell(base, codebook.select(col("cell"), col("cv"), col("cn2")))
      .select(col("vec_id"), col("cell"))
    base.join(assign, "vec_id")
      .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cell"), col("i"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
  }

  /** Merge two [[codebookState]] relations — associative-commutative
    * exact-int sums, so merge order and partitioning never matter. */
  def mergeCodebookStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("cell"), col("i"))
      .agg(sum(col("sx")).as("sx"), sum(col("cnt")).as("cnt"))

  /** Refreshed codebook (cell, cv, cn2) from a (merged) state — the
    * SAME trunc-toward-zero integer-mean contract as
    * [[kmeansCentroids]] (exact int64 sums « 2^53, one exact-input
    * double divide, trunc), so the refreshed codebook plugs straight
    * back into [[ivfTopKWith]]/[[semDedupVerdicts]]. */
  def centroidsFromState(state: DataFrame): DataFrame =
    state
      .withColumn("cx", (col("sx") / col("cnt")).cast("long"))
      .groupBy(col("cell"))
      .agg(collect_list(struct(col("i"), col("cx"))).as("ps"))
      .select(col("cell"), transform(array_sort(col("ps")), p => p.getField("cx")).as("cv"))
      .withColumn("cn2", normQ(col("cv")))

  /** Final k-means cluster assignment: one row per vector
    * (vec_id, cluster_id, cosine-to-final-centroid) against the
    * [[kmeansCentroids]]-trained codebook. */
  def kmeansAssign(embs: DataFrame, k: Int, iters: Int = 1): DataFrame =
    kmeansAssignWith(embs, kmeansCentroids(embs, k, iters))

  /** [[kmeansAssign]] against an EXPLICIT (cell, cv, cn2) codebook —
    * e.g. a persisted [[kmeansCentroids]] output shared with
    * [[ivfTopKWith]] (train once, assign and probe from the same
    * materialized codebook). */
  def kmeansAssignWith(embs: DataFrame, codebook: DataFrame): DataFrame =
    nearestCell(quantized(embs), codebook.select(col("cell"), col("cv"), col("cn2")))
      .select(col("vec_id"), col("cell").as("cluster_id"), col("cosine"))

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by within-cluster cosine. Vectors are assigned to
    * their nearest codebook cell (the same trained codebook the IVF
    * index probes — one clustering serves both retrieval and dedup),
    * and pairwise cosine is computed ONLY inside a cell: the k-means
    * partition is the blocking structure that makes semantic dedup
    * sub-quadratic, exactly as the paper prescribes.
    *
    * Verdict semantics (deterministic, engine-portable): a vector is
    * `drop_semantic` iff some LOWER-id vector in the same cluster has
    * cosine ≥ `tau` with it; `survivor_id` is the lowest such id and
    * `max_cos` the best such cosine. Survivors may themselves defer to
    * still-lower ids — the same greedy keep-earliest chain as
    * [[graft.operators.TextDedup.dedupVerdictsFromClusters]], and the
    * deterministic twin of the paper's keep-one-random-per-group.
    *
    * Scale shape: the codebook is broadcast for assignment (corpus
    * never shuffles to get its cell), then the self-join shuffles each
    * vector ONCE keyed by cell. Candidate volume is Σ|cell|²/2 with
    * the cluster count as the blocking knob (k ∝ √n keeps expected
    * cell size flat; the paper uses k in the tens of thousands at
    * billion-document scale) — but SemDeDup runs precisely on
    * near-duplicate-heavy corpora, where one dense cell goes quadratic
    * no matter how k was sized. `maxCellCompare` is the hot-cell
    * bound (the [[TextDedup.lshPairs]] `maxBandDf` analogue): each
    * vector compares only against the `cap` LOWEST-id members of its
    * cell, so candidate volume is ≤ Σ|cell|·cap — LINEAR in cell
    * population. Exact whenever |cell| ≤ cap; above it the verdicts
    * degrade gracefully in exactly the grain that matters least — the
    * greedy keep-earliest chain defers to low-id members, so the
    * capped comparison set is the set of likely survivors, and a
    * vector can only be mis-kept if its ONLY matches sit past the
    * cell's id-head. Over/under-cap cell counts and the max cell
    * population are published via the `semdedup_cell_cap`
    * observation. */
  def semDedupVerdicts(
      embs: DataFrame,
      codebook: DataFrame,
      tau: Double,
      maxCellCompare: Option[Long] = None): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    val m = assignedCorpus(embs, codebook)
    val dropped = semDedupCandidates(m, maxCellCompare)
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"))
      .agg(min(col("bid")).as("survivor_id"), max(col("cos")).as("max_cos"))
    m.select(col("vec_id"), col("cell").as("cluster_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("cluster_id"),
        when(col("survivor_id").isNotNull, lit("drop_semantic"))
          .otherwise(lit("keep")).as("verdict"),
        col("survivor_id"), col("max_cos"))
  }

  /** [[semDedupVerdicts]]' scored candidate relation (vec_id, bid,
    * cos) over an assigned (vec_id, v, n2, cell) corpus — split out so
    * the hot-cell bound is testable: with `maxCellCompare = Some(cap)`
    * the b-side of the within-cell join is pruned to each cell's `cap`
    * lowest ids BEFORE the join (one rank window riding the same
    * cell-keyed exchange the join needs — no extra shuffle of the
    * corpus), making candidates per cell ≤ |cell|·cap, never
    * |cell|²/2. */
  private[operators] def semDedupCandidates(
      m: DataFrame,
      maxCellCompare: Option[Long]): DataFrame =
    m.as("a")
      .join(headCapped(m, maxCellCompare, "semdedup_cell_cap").as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") > col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("bid"),
        cosine(Portable.dotQ(col("a.v"), col("b.v")), col("a.n2"), col("b.n2")).as("cos"))

  /** The hot-cell bound shared by [[semDedupCandidates]] and
    * [[semDedupAgainstIndex]]: keep each cell's `cap` LOWEST ids (one
    * rank window riding the cell-keyed exchange the downstream join
    * needs), publishing over/under-cap cell counts under
    * `metricName`. `None` = pass-through. */
  private def headCapped(
      m: DataFrame,
      maxCellCompare: Option[Long],
      metricName: String): DataFrame =
    maxCellCompare match {
      case None => m
      case Some(cap) =>
        require(cap >= 1, s"maxCellCompare must be >= 1 (got $cap)")
        val wC = Window.partitionBy(col("cell"))
        m.withColumn("__rn", row_number().over(wC.orderBy(col("vec_id"))))
          .withColumn("__pop", count(lit(1)).over(wC))
          .observe(
            metricName,
            count(when(col("__rn") === 1 && col("__pop") > cap, 1)).as("capped_cells"),
            count(when(col("__rn") === 1 && col("__pop") <= cap, 1)).as("exact_cells"),
            max(col("__pop")).as("max_cell_pop"))
          .filter(col("__rn") <= cap)
          .select(col("vec_id"), col("v"), col("n2"), col("cell"))
    }

  /** INCREMENTAL SemDeDup: a NEW embedding batch against an EXISTING
    * index corpus — the steady-state ingest question "is this new
    * vector a semantic dup of anything already ingested?", answered
    * without re-pairing the index against itself (the vector twin of
    * [[TextDedup.lshPairsAgainstIndex]] / [[TextDedup.bloomDedupGate]]).
    * Both sides assign to the SAME codebook's cells (broadcast); the
    * new batch joins ONLY the index members of its own cell — cost
    * scales with the batch × cell occupancy, never the index². The
    * index is authoritative: `dup_of` is the LOWEST index id within
    * `tau`, with no keep-chain (index members were already deduped when
    * they landed). `maxCellCompare` head-caps the INDEX side (the side
    * that grows), metrics under `semdedup_index_cell_cap`.
    * Returns one row per NEW vector:
    * (vec_id, cluster_id, verdict keep|drop_semantic, dup_of, max_cos). */
  def semDedupAgainstIndex(
      newEmbs: DataFrame,
      indexEmbs: DataFrame,
      codebook: DataFrame,
      tau: Double,
      maxCellCompare: Option[Long] = None): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1]: $tau")
    val mNew = assignedCorpus(newEmbs, codebook)
    val mIdx = headCapped(
      assignedCorpus(indexEmbs, codebook), maxCellCompare, "semdedup_index_cell_cap")
    val dup = mNew.as("a")
      .join(mIdx.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("bid"),
        cosine(Portable.dotQ(col("a.v"), col("b.v")), col("a.n2"), col("b.n2")).as("cos"))
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"))
      .agg(min(col("bid")).as("dup_of"), max(col("cos")).as("max_cos"))
    mNew.select(col("vec_id"), col("cell").as("cluster_id"))
      .join(dup, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("cluster_id"),
        when(col("dup_of").isNotNull, lit("drop_semantic"))
          .otherwise(lit("keep")).as("verdict"),
        col("dup_of"), col("max_cos"))
  }

  /** Assigned corpus relation (vec_id, v, n2, cell) for
    * [[semDedupCandidates]] — exposed for the hot-cell spec. */
  private[operators] def assignedCorpus(embs: DataFrame, codebook: DataFrame): DataFrame = {
    val base = quantized(embs)
    base.join(
      nearestCell(base, codebook.select(col("cell"), col("cv"), col("cn2")))
        .select(col("vec_id"), col("cell")),
      "vec_id")
  }

  /** Embedding-quality screen: the k vectors per label FARTHEST (by
    * cosine) from their label's centroid direction — mislabeled or
    * out-of-distribution candidates, the vector analogue of a z-score
    * outlier pass.
    *
    * The centroid reuses [[kmeansCentroids]]' exact integer-mean
    * contract (per-dim int64 sums, one double divide, trunc) so the
    * whole score is exact-int dot/norms + correctly-rounded
    * sqrt/divide — oracle-portable. Scale shape: posexplode → one
    * map-side-combinable hash-agg on (label, dim) → |labels|·dim rows
    * repacked and BROADCAST back; the corpus is scored map-only and
    * only the rank window shuffles (on label). */
  def centroidOutliers(embs: DataFrame, label: Column, k: Int): DataFrame = {
    val base = embs
      .select(col("vec_id"), label.as("label"), Portable.quantize(col("embedding")).as("v"))
      .withColumn("n2", normQ(col("v")))
    val cents = integerMeanCentroids(base.select(col("label"), col("v")), "label")
    val w = Window.partitionBy(col("label")).orderBy(asc("centroid_cos"), asc("vec_id"))
    base
      .join(broadcast(cents), "label")
      .withColumn("centroid_cos", cosine(Portable.dotQ(col("v"), col("cv")), col("n2"), col("cn2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("label"), col("vec_id"), col("centroid_cos"), col("rk"))
  }

  /** kNN LABEL-NOISE audit (confident-learning style, Northcutt '21):
    * for every vector, its k nearest within-cell neighbors vote on the
    * label — a vector whose own label is a strict minority among its
    * neighbors is a mislabel/out-of-distribution SUSPECT, the standard
    * first pass before training on labeled embeddings. Output one row
    * per vector: (vec_id, label, n_neighbors, n_same_label, suspect);
    * `n_neighbors` < k in small cells, 0 for singleton cells (never a
    * suspect — no evidence either way).
    *
    * Neighborhoods are WITHIN-CELL by design (the IVF approximation:
    * a vector's true nearest neighbors overwhelmingly share its cell),
    * so candidate mass is Σ|cell|² / corpus² — blocked, never
    * all-pairs; `maxCellCompare` additionally bounds hot cells by the
    * [[semDedupVerdicts]] cap contract (neighbors then come from the
    * cell's cap lowest ids — an explicit recall trade, not a default).
    * Ties on cosine break by neighbor id ascending; all arithmetic is
    * the exact-int dot/norm contract, so the audit is oracle-portable.
    *
    * Scale shape: one broadcast-codebook assignment, one cell-keyed
    * self-join, a rank window partitioned by vec_id, one hash-agg —
    * the same plan family as [[semDedupVerdicts]]. */
  def knnLabelAudit(
      embs: DataFrame,
      codebook: DataFrame,
      label: Column,
      k: Int,
      maxCellCompare: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    val labels = embs.select(col("vec_id"), label.as("label"))
    // labels join AFTER the top-k filter, not before: headCapped
    // projects the canonical (vec_id, v, n2, cell) shape, and the
    // lookup then touches ≤ N·k survivor rows instead of the full
    // candidate relation
    val m = assignedCorpus(embs, codebook)
    val nb = m.as("a")
      .join(headCapped(m, maxCellCompare, "knn_label_cell_cap").as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"), col("b.vec_id").as("bid"),
        cosine(Portable.dotQ(col("a.v"), col("b.v")), col("a.n2"), col("b.n2")).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cos"), asc("bid"))
    val counted = nb
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .join(labels, "vec_id")
      .join(labels.select(col("vec_id").as("bid"), col("label").as("nb_label")), "bid")
      .groupBy(col("vec_id"))
      .agg(
        count(lit(1)).as("n_neighbors"),
        sum(when(col("nb_label") === col("label"), 1L).otherwise(0L)).as("n_same_label"))
    labels
      .join(counted, Seq("vec_id"), "left")
      .select(
        col("vec_id"), col("label"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        coalesce(col("n_same_label"), lit(0L)).as("n_same_label"),
        (coalesce(col("n_neighbors"), lit(0L)) > 0L &&
          coalesce(col("n_same_label"), lit(0L)) * 2L <
            coalesce(col("n_neighbors"), lit(0L))).as("suspect"))
  }

  /** Margin-based MUTUAL-nearest-neighbor pair mining across two
    * embedding populations (Artetxe & Schwenk, "Margin-based Parallel
    * Corpus Mining with Multilingual Sentence Embeddings", ACL '19) —
    * the bitext / image-caption pair-curation op: candidates are
    * cell-restricted under the shared trained codebook, a pair is kept
    * only when each side is the other's top-1, and the RATIO margin
    * demotes hubs (a vector whose whole neighborhood scores high gets
    * a denominator near its best, margin → 1e6; an isolated true match
    * stands out, margin ≫ 1e6).
    *
    * All-integer scoring: `cos_ppm = floor(cos · 10⁶)` (floor of the
    * one correctly-rounded double — exact and engine-portable), so the
    * k-neighborhood sums and the final margin are pure int64 — no
    * order-dependent double summation anywhere. margin_ppm =
    * best·10⁶ div ((Σₖcosₐ div kₐ + Σₖcos_b div k_b) div 2). Pairs
    * with cos ≤ 0 (or a zero-norm side) are never candidates.
    *
    * Scale shape: one broadcast-codebook assignment per side, ONE
    * cell-keyed A×B join, two rank windows (each keyed by its own
    * side, WindowGroupLimit keeps only per-partition top-k candidates
    * ahead of the sort), two hash-aggs, one |A|-vs-|B|-sized keyed
    * join for mutuality. Candidate mass is Σ_cell |A∩cell|·|B∩cell| —
    * the [[semDedupCandidates]] family; a skewed corpus caps hot
    * cells upstream exactly like [[knnLabelAudit]] does — pass
    * `maxCellCompare` to head-cap the B side per cell (mass becomes
    * Σ|A∩cell|·cap, linear in |A|; metrics under
    * `mutual_pair_cell_cap`), the documented 100 TB form. A pipeline
    * mining several margins should materialize the candidate relation
    * once (the once-per-snapshot discipline). */
  /** The capped cross-population CANDIDATE pair relation — the
    * pair-mining STAGE of [[marginMutualPairs]] (the q196/q210
    * hot-cell dial) as a first-class relation: same-cell (a, b) pairs
    * with `cos_ppm > 0`, the B side head-capped per cell (lowest `cap`
    * vec_ids — headCapped's DETERMINISTIC rule, which is what makes
    * the relation per-pair decomposable: membership of (a, b) depends
    * only on a, b and which B ids populate b's cell, never on other
    * pairs). The incremental miner
    * ([[graft.streaming.PairStream]]) lands exactly this relation
    * batch-by-batch and provably converges on it; downstream mutual
    * top-1 / margin folds are O(|pairs|) over it. */
  def cappedCandidatePairs(
      embsA: DataFrame,
      embsB: DataFrame,
      codebook: DataFrame,
      maxCellCompare: Option[Long] = None): DataFrame = {
    val a = assignedCorpus(embsA, codebook)
      .select(col("vec_id").as("a_id"), col("v").as("av"), col("n2").as("an2"), col("cell"))
    val b = headCapped(assignedCorpus(embsB, codebook), maxCellCompare, "mutual_pair_cell_cap")
      .select(col("vec_id").as("b_id"), col("v").as("bv"), col("n2").as("bn2"), col("cell"))
    a.join(b, "cell")
      .select(
        col("a_id"), col("b_id"),
        floor(cosine(Portable.dotQ(col("av"), col("bv")), col("an2"), col("bn2"))
          * lit(1000000.0)).cast("long").as("cos_ppm"))
      .filter(col("cos_ppm") > 0L)
  }

  /** The B-side cell-cap SURVIVOR ids of `embs` under `codebook` —
    * headCapped's deterministic lowest-`cap`-ids-per-cell rule as a
    * first-class id relation. The incremental miner uses it to rank a
    * new batch within the FULL landed population (a batch-local rank
    * would admit ids the population cap excludes). */
  def cellCapSurvivors(embs: DataFrame, codebook: DataFrame, cap: Long): DataFrame =
    headCapped(assignedCorpus(embs, codebook), Some(cap), "cell_cap_survivors")
      .select(col("vec_id"))

  def marginMutualPairs(
      embsA: DataFrame,
      embsB: DataFrame,
      codebook: DataFrame,
      k: Int = 4,
      maxCellCompare: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    val cand = cappedCandidatePairs(embsA, embsB, codebook, maxCellCompare)
    val wa = Window.partitionBy(col("a_id")).orderBy(desc("cos_ppm"), asc("b_id"))
    val wb = Window.partitionBy(col("b_id")).orderBy(desc("cos_ppm"), asc("a_id"))
    val aStats = cand
      .withColumn("rn", row_number().over(wa)).filter(col("rn") <= k)
      .groupBy(col("a_id"))
      .agg(
        sum(col("cos_ppm")).as("__sa"), count(lit(1)).as("__na"),
        max(when(col("rn") === 1, col("b_id"))).as("__best_b"),
        max(when(col("rn") === 1, col("cos_ppm"))).as("__best_cos"))
    val bStats = cand
      .withColumn("rn", row_number().over(wb)).filter(col("rn") <= k)
      .groupBy(col("b_id"))
      .agg(sum(col("cos_ppm")).as("__sb"), count(lit(1)).as("__nb"),
        max(when(col("rn") === 1, col("a_id"))).as("__best_a"))
    aStats
      .join(bStats, col("__best_b") === col("b_id") && col("__best_a") === col("a_id"))
      .select(
        col("a_id"), col("b_id"),
        col("__best_cos").as("cos_ppm"),
        expr("__best_cos * 1000000L div ((__sa div __na + __sb div __nb) div 2)")
          .as("margin_ppm"))
  }

  /** ANN via hyperplane-LSH: candidates are corpus vectors in the SAME
    * bucket as the query; exact cosine rescoring + top-k within the
    * bucket. Approximate by construction (bucket recall < 1) — the
    * scale path where brute force is infeasible. */
  def lshTopK(embs: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame =
    probedTopK(embs, queries, dim, k, masks = Seq(0L), keepBucket = true)

  /** [[lshTopK]] sugar for a driver-side id list. */
  def lshTopK(embs: DataFrame, queryIds: Seq[Long], dim: Int, k: Int): DataFrame =
    lshTopK(embs, idRows(embs, queryIds), dim, k)

  /** Multi-probe hyperplane LSH (Lv et al., VLDB '07): each query
    * probes its own bucket PLUS the H single-bit-flip neighbors — the
    * buckets a borderline hyperplane vote could have flipped into.
    * Recall rises toward brute force at (H+1)× the candidate cost,
    * with NO extra tables or rehashing — the standard fix for LSH's
    * all-or-nothing bucket miss ([[lshTopK]], which is the
    * masks = {0} special case of the same probing core). */
  def lshTopKMultiProbe(embs: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame =
    probedTopK(embs, queries, dim, k,
      masks = 0L +: (0 until H).map(h => 1L << h), keepBucket = false)

  /** [[lshTopKMultiProbe]] sugar for a driver-side id list. */
  def lshTopKMultiProbe(embs: DataFrame, queryIds: Seq[Long], dim: Int, k: Int): DataFrame =
    lshTopKMultiProbe(embs, idRows(embs, queryIds), dim, k)

  /** Shared LSH probing core: queries probe `bucket XOR mask` for each
    * mask. Each corpus vector lives in exactly one bucket and a
    * query's probe keys are distinct, so a (query, candidate) pair
    * joins at most once — no dedup pass. The probe set stays tiny and
    * BROADCAST (its bucket ids are recomputed from its own vectors —
    * no corpus filter, no id list in the plan); the corpus is never
    * shuffled. `keepBucket` keeps the matched bucket column
    * (meaningful for single-probe output). */
  private def probedTopK(
      embs: DataFrame,
      queries: DataFrame,
      dim: Int,
      k: Int,
      masks: Seq[Long],
      keepBucket: Boolean): DataFrame = {
    val withBucket = quantized(embs).withColumn("bucket", bucketId(col("v"), dim))
    val probes = quantized(queries)
      .withColumn("bucket", bucketId(col("v"), dim))
      .select(
        col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"),
        explode(transform(typedlit(masks), m => col("bucket").bitwiseXOR(m))).as("bucket"))
    val scored = withBucket
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", cosine(Portable.dotQ(col("qv"), col("v")), col("qn2"), col("n2")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("vec_id"))
    val out =
      if (keepBucket) Seq(col("qid"), col("vec_id").as("cid"), col("bucket"), col("cosine"), col("rank"))
      else Seq(col("qid"), col("vec_id").as("cid"), col("cosine"), col("rank"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(out: _*)
  }

  // ---- Product quantization (Jégou, Douze, Schmid: "Product
  // Quantization for Nearest Neighbor Search", TPAMI 2011) ----------
  //
  // The memory-scale ANN path: a D-dim vector compresses to `m` small
  // codes (one per D/m-dim subspace, each trained by the same
  // deterministic integer k-means as the IVF codebook), and query
  // distance is the ADC sum of per-subspace table lookups. At 100 TB
  // the float corpus cannot live in executor memory; the code relation
  // is m bytes-ish per vector and the distance job never touches the
  // original vectors — scan cost drops by the compression ratio
  // (64 dims × 4 B → 4 codes here). All distances are EXACT int64
  // squared-L2 over the quantized grid ([[Portable.quantize]]), so
  // codebooks, codes, and ADC scores hash-match the DuckDB oracle.

  /** (vec_id, sub, v, n2) subvector slices: `dim` split into `m`
    * consecutive equal subspaces. Map-only (explode of a per-row
    * literal-bounded array) — the one pass over the full vectors. */
  private def pqSlices(embs: DataFrame, dim: Int, m: Int): DataFrame =
    pqSlicesQ(quantized(embs).select(col("vec_id"), col("v")), dim, m)

  /** [[pqSlices]] over an ALREADY-quantized (vec_id, v) relation —
    * the entry point residual vectors take ([[ivfPqCodebooks]]). */
  private def pqSlicesQ(vecs: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim must split into m=$m equal subspaces")
    val step = dim / m
    val slices = array((0 until m).map(s =>
      struct(lit(s).as("sub"), slice(col("v"), s * step + 1, step).as("sv"))): _*)
    vecs
      .select(col("vec_id"), explode(slices).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.sv").as("v"))
      .withColumn("n2", normQ(col("v")))
  }

  /** Nearest codeword per (vector, subspace) by EXACT int64 squared
    * L2 (‖a‖² + ‖c‖² − 2⟨a,c⟩ — PQ is a Euclidean quantizer); ties to
    * the LOWEST cell. Same slim-hash-agg shape as [[nearestCell]]:
    * the codebook is broadcast, the aggregate payload is fixed-width,
    * subvectors never ride a shuffle. Returns (vec_id, sub, code, d2)
    * — d2 being the per-subspace quantization error. */
  private def nearestSubCell(slices: DataFrame, cb: DataFrame): DataFrame =
    slices
      .join(broadcast(cb), Seq("sub"))
      .withColumn(
        "__d2", col("n2") + col("cn2") - lit(2L) * Portable.dotQ(col("v"), col("cv")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(
        max_by(col("cell"), struct((-col("__d2")).as("nd"), (-col("cell")).as("nc"))).as("code"),
        min(col("__d2")).as("d2"))

  /** Train the `m` per-subspace codebooks: seeds = slices of the first
    * `k` vectors by id, then `iters` Lloyd rounds with the
    * integer-mean centroid update ([[integerMeanCentroids]] keyed by
    * (sub, cell) — one generalized job trains ALL subspaces at once,
    * not m sequential jobs). Returns (sub, cell, cv, cn2). */
  def pqCodebooks(embs: DataFrame, dim: Int, m: Int, k: Int, iters: Int = 1): DataFrame =
    trainPqSlices(pqSlices(embs, dim, m), k, iters)

  /** The Lloyd loop shared by [[pqCodebooks]] (raw vectors) and
    * [[ivfPqCodebooks]] (residuals): seed from the first `k` ids'
    * slices, then `iters` integer-mean rounds. */
  private def trainPqSlices(sl: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be positive (got $k)")
    var cb = sl
      .filter(col("vec_id") < k)
      .select(col("sub"), col("vec_id").as("cell"), col("v").as("cv"), col("n2").as("cn2"))
    for (_ <- 0 until iters) {
      val assign = nearestSubCell(sl, cb)
        .select(col("vec_id"), col("sub"), col("code").as("cell"))
      cb = integerMeanCentroids(sl.join(assign, Seq("vec_id", "sub")), "sub", "cell")
    }
    cb
  }

  /** Encode the corpus against a trained codebook: (vec_id, sub, code,
    * d2) — the m-codes-per-vector compression artifact a 100 TB
    * pipeline materializes once and serves from, with the exact
    * per-subspace quantization error kept as the reconstruction-
    * quality signal. */
  def pqEncode(embs: DataFrame, dim: Int, m: Int, codebooks: DataFrame): DataFrame =
    nearestSubCell(pqSlices(embs, dim, m), codebooks)

  /** ADC top-k: per query, per subspace, the distance TABLE to every
    * codeword (|queries|·m·k rows — tiny, broadcast), then each corpus
    * CODE row joins its table entry and one (qid, cid) hash-agg sums
    * the m lookups into the ADC distance. The full vectors appear
    * nowhere in the serving plan — only codes move. Asymmetric:
    * queries stay unquantized-by-PQ (exact slices), only the corpus is
    * compressed, exactly the paper's ADC variant. */
  def pqTopKWith(
      embs: DataFrame,
      codebooks: DataFrame,
      queries: DataFrame,
      dim: Int,
      m: Int,
      k: Int): DataFrame =
    pqTopKWithCodes(
      nearestSubCell(pqSlices(embs, dim, m), codebooks), codebooks, queries, dim, m, k)

  /** [[pqTopKWith]] serving from a MATERIALIZED code relation
    * ([[pqEncode]]'s output: vec_id, sub, code[, d2]) — the 100 TB
    * lifecycle: encode ONCE (q101's artifact), then every query batch
    * joins distance tables onto the stored codes; the corpus vectors
    * appear nowhere in the serving plan. */
  def pqTopKWithCodes(
      codes: DataFrame,
      codebooks: DataFrame,
      queries: DataFrame,
      dim: Int,
      m: Int,
      k: Int): DataFrame = {
    val c = codes.select(col("vec_id").as("cid"), col("sub"), col("code"))
    // queries slice themselves — the corpus code relation is never
    // filtered for the distance tables
    val dt = pqSlices(queries, dim, m)
      .join(broadcast(codebooks), Seq("sub"))
      .select(
        col("vec_id").as("qid"), col("sub"), col("cell").as("code"),
        (col("n2") + col("cn2") - lit(2L) * Portable.dotQ(col("v"), col("cv"))).as("qd2"))
    val w = Window.partitionBy(col("qid")).orderBy(asc("adc_dist2"), asc("cid"))
    c
      .join(broadcast(dt), Seq("sub", "code"))
      .filter(col("cid") =!= col("qid"))
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("qd2")).as("adc_dist2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** ADC + exact-refine serving (the "+R" variant of Jégou et al.'s
    * IVFADC, TPAMI 2011 §V): the compressed index proposes `kCand`
    * candidates per query ([[pqTopKWithCodes]] — stored codes only),
    * then ONLY those candidates' full vectors are fetched and exactly
    * re-scored (int64 cosine) to the final top-`k`. Exactness of the
    * final ranking is restored at a refine cost of |queries|·kCand
    * vector lookups — at scale a bucketed join on vec_id against the
    * vector table — so the corpus is never scanned uncompressed. The
    * production two-stage retrieval shape: cheap recall from the
    * index, precision from the refine. */
  def pqRerank(
      embs: DataFrame,
      codes: DataFrame,
      codebooks: DataFrame,
      queries: DataFrame,
      dim: Int,
      m: Int,
      kCand: Int,
      k: Int): DataFrame = {
    require(kCand >= k && k >= 1, s"need kCand >= k >= 1 (got kCand=$kCand, k=$k)")
    val cand = pqTopKWithCodes(codes, codebooks, queries, dim, m, kCand)
      .select(col("qid"), col("cid"))
    val q = quantized(queries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    val c = quantized(embs)
      .select(col("vec_id").as("cid"), col("v"), col("n2"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("cid"))
    cand
      .join(c, "cid")  // the refine fetch: |queries|·kCand keyed lookups
      .join(q, "qid")
      .withColumn("cosine", cosine(Portable.dotQ(col("qv"), col("v")), col("qn2"), col("n2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rk"))
  }

  /** [[pqTopKWith]] sugar for a driver-side id list. */
  def pqTopKWith(
      embs: DataFrame,
      codebooks: DataFrame,
      queryIds: Seq[Long],
      dim: Int,
      m: Int,
      k: Int): DataFrame =
    pqTopKWith(embs, codebooks, idRows(embs, queryIds), dim, m, k)

  // ---- IVF-PQ (residual product quantization) ----------------------
  //
  // The production 100 TB ANN layout (Jégou et al. 2011 §IV — IVFADC):
  // a coarse quantizer partitions the corpus into cells, and PQ
  // compresses each vector's RESIDUAL to its cell centroid instead of
  // the vector itself. Residuals are centered near zero, so the same
  // byte budget quantizes them far more finely than raw vectors —
  // and serving probes only nProbe cells' code lists instead of every
  // code. The coarse codebook is the SAME trained k-means artifact the
  // plain IVF index and SemDeDup ride ([[kmeansCentroids]]): one
  // clustering serves retrieval, dedup, and compression.

  /** Residual relation (vec_id, cell, v): each quantized vector minus
    * its assigned coarse centroid, exact per-dim int64. Assignment is
    * [[nearestCell]]'s cosine argmax — identical to what the IVF index
    * probes, so a served query probes the cells its residuals were
    * encoded against. Scale shape: the codebook is broadcast; the
    * corpus is mapped in place and never shuffles. */
  private def residuals(embs: DataFrame, codebook: DataFrame): DataFrame =
    assignedCorpus(embs, codebook)
      .join(broadcast(codebook.select(col("cell"), col("cv"))), Seq("cell"))
      .select(
        col("vec_id"), col("cell"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))

  /** Train the per-subspace RESIDUAL codebooks — same Lloyd contract
    * as [[pqCodebooks]], fed residual slices. Returns
    * (sub, cell, cv, cn2) where `cell` is the codeword id. */
  def ivfPqCodebooks(
      embs: DataFrame,
      codebook: DataFrame,
      dim: Int,
      m: Int,
      k: Int,
      iters: Int = 1): DataFrame =
    trainPqSlices(pqSlicesQ(residuals(embs, codebook), dim, m), k, iters)

  /** Encode the corpus: (vec_id, cell, sub, code, d2) — the coarse
    * cell plus m residual codes per vector, with the exact per-subspace
    * quantization error. The materialize-once index artifact: at
    * 100 TB this relation (a few bytes/vector) is what serving reads —
    * the full vectors appear in no serving plan. */
  def ivfPqEncode(
      embs: DataFrame,
      codebook: DataFrame,
      residCodebooks: DataFrame,
      dim: Int,
      m: Int): DataFrame = {
    val r = residuals(embs, codebook)
    nearestSubCell(pqSlicesQ(r.select(col("vec_id"), col("v")), dim, m), residCodebooks)
      .join(r.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id"), col("cell"), col("sub"), col("code"), col("d2"))
  }

  /** IVFADC serving: each query probes its `nProbe` nearest coarse
    * cells, builds per-(query, cell, subspace) distance TABLES from
    * its residual in that cell to every residual codeword
    * (|queries|·nProbe·m·k rows — tiny, broadcast), and the probed
    * cells' CODE lists join the tables on (cell, sub, code); one
    * (qid, cid) hash-agg sums the m lookups into the ADC distance.
    * Only codes move, and only from probed cells — at scale the codes
    * relation is partitioned by cell, so nProbe cells means nProbe
    * partitions read, not a corpus scan. */
  def ivfPqTopKWith(
      embs: DataFrame,
      codebook: DataFrame,
      residCodebooks: DataFrame,
      queries: DataFrame,
      dim: Int,
      m: Int,
      nProbe: Int,
      k: Int): DataFrame = {
    val r = residuals(embs, codebook)
    val codes = nearestSubCell(pqSlicesQ(r.select(col("vec_id"), col("v")), dim, m), residCodebooks)
      .join(r.select(col("vec_id"), col("cell")), "vec_id")
      .select(col("vec_id"), col("cell"), col("sub"), col("code"))
    ivfPqTopKWithCodes(codes, codebook, residCodebooks, queries, dim, m, nProbe, k)
  }

  /** [[ivfPqTopKWith]] serving from a MATERIALIZED code relation
    * ([[ivfPqEncode]]'s output: vec_id, cell, sub, code) — the actual
    * 100 TB lifecycle: encode ONCE ([[ivfPqEncode]], q141's artifact,
    * written partitioned by coarse cell), then every query batch reads
    * codes only — the plan never touches a full vector or re-derives a
    * residual for the corpus side. nProbe cells means nProbe code
    * partitions read, not a corpus scan. */
  def ivfPqTopKWithCodes(
      codes: DataFrame,
      codebook: DataFrame,
      residCodebooks: DataFrame,
      queries: DataFrame,
      dim: Int,
      m: Int,
      nProbe: Int,
      k: Int): DataFrame = {
    require(nProbe >= 1 && k >= 1, s"nProbe and k must be positive (got $nProbe, $k)")
    val c = codes.select(col("vec_id").as("cid"), col("cell"), col("sub"), col("code"))
    // query → nProbe nearest coarse cells, carrying the query vector
    val pw = Window.partitionBy(col("vec_id")).orderBy(desc("ccos"), asc("cell"))
    val probes = quantized(queries)
      .crossJoin(broadcast(
        codebook.select(col("cell"), col("cv").as("ccv"), col("cn2").as("ccn2"))))
      .withColumn("ccos", cosine(Portable.dotQ(col("v"), col("ccv")), col("n2"), col("ccn2")))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nProbe)
      .select(col("vec_id").as("qid"), col("cell"), col("ccv"), col("v"))
    // per-(query, probed cell) residual slices → distance tables
    val step = dim / m
    val sliceArr = array((0 until m).map(s =>
      struct(lit(s).as("sub"), slice(col("rv"), s * step + 1, step).as("sv"))): _*)
    val rcb = residCodebooks
      .select(col("sub"), col("cell").as("code"), col("cv").as("rcv"), col("cn2").as("rcn2"))
    val dt = probes
      .withColumn("rv", zip_with(col("v"), col("ccv"), (a, b) => a - b))
      .select(col("qid"), col("cell"), explode(sliceArr).as("e"))
      .select(col("qid"), col("cell"), col("e.sub").as("sub"), col("e.sv").as("sv"))
      .withColumn("sn2", normQ(col("sv")))
      .join(broadcast(rcb), Seq("sub"))
      .select(
        col("qid"), col("cell"), col("sub"), col("code"),
        (col("sn2") + col("rcn2") - lit(2L) * Portable.dotQ(col("sv"), col("rcv"))).as("qd2"))
    val w = Window.partitionBy(col("qid")).orderBy(asc("adc_dist2"), asc("cid"))
    c
      .join(broadcast(dt), Seq("cell", "sub", "code"))
      .filter(col("cid") =!= col("qid"))
      .groupBy(col("qid"), col("cid"))
      .agg(sum(col("qd2")).as("adc_dist2"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** [[ivfPqTopKWith]] sugar for a driver-side id list. */
  def ivfPqTopKWith(
      embs: DataFrame,
      codebook: DataFrame,
      residCodebooks: DataFrame,
      queryIds: Seq[Long],
      dim: Int,
      m: Int,
      nProbe: Int,
      k: Int): DataFrame =
    ivfPqTopKWith(embs, codebook, residCodebooks, idRows(embs, queryIds), dim, m, nProbe, k)

  /** Semantic decontamination — the embedding-space complement of
    * n-gram decontamination ([[TextDedup.contaminationFlags]]):
    * flag corpus vectors whose cosine against ANY benchmark vector
    * reaches `threshold`. Paraphrased benchmark leakage shares no
    * n-gram but lands next to the benchmark in embedding space; this
    * is the screen that catches it. Benchmark membership is a column
    * predicate (`benchPred`), e.g. a held-out label or a source tag.
    *
    * Scale shape: benchmark sets are small (eval suites, not corpora)
    * — the benchmark side is BROADCAST and the corpus side never
    * shuffles: per corpus row, the max-cosine fold happens in the
    * broadcast-join projection, then one map-side-combined hash-agg
    * per vec_id. Exact int64 dots ([[Portable.quantize]]) keep the
    * verdict bit-portable. For benchmark sets too big to broadcast,
    * route through [[ivfTopKWith]] cells instead. */
  def semanticContamination(
      embs: DataFrame,
      benchPred: Column,
      threshold: Double): DataFrame = {
    val bench = embs
      .filter(benchPred)
      .select(Portable.quantize(col("embedding")).as("bv"))
      .withColumn("bn2", normQ(col("bv")))
    val corpus = embs
      .filter(!benchPred)
      .select(col("vec_id"), col("label"), Portable.quantize(col("embedding")).as("v"))
      .withColumn("n2", normQ(col("v")))
    corpus
      .join(broadcast(bench))
      .groupBy(col("vec_id"), col("label"))
      .agg(max(cosine(Portable.dotQ(col("v"), col("bv")), col("n2"), col("bn2"))).as("max_benchmark_cos"))
      .withColumn("contaminated", col("max_benchmark_cos") >= threshold)
  }

  /** Hard-negative mining for contrastive training: for each query,
    * the top-k most-similar vectors whose LABEL DIFFERS — the
    * highest-value negatives (closest to the decision boundary), the
    * relation a retriever-training pipeline joins positives against.
    * Same scale shape as [[bruteForceTopK]]: the query set broadcasts,
    * the corpus never shuffles, per-query rank is a WindowGroupLimit
    * top-k (never a global sort). Exact integer dot products
    * ([[Portable.quantize]]); ties broken by candidate id. */
  def hardNegatives(embs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries
      .select(
        col("vec_id").as("qid"),
        col("label").as("__ql"),
        Portable.quantize(col("embedding")).as("qv"))
      .withColumn("qn2", normQ(col("qv")))
    val c = embs
      .select(col("vec_id").as("cid"), col("label").as("neg_label"), Portable.quantize(col("embedding")).as("cv"))
      .withColumn("cn2", normQ(col("cv")))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("cid") && !(col("neg_label") <=> col("__ql")))
      .withColumn("cosine", cosine(Portable.dotQ(col("qv"), col("cv")), col("qn2"), col("cn2")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("cid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("neg_label"), col("cosine"), col("rank"))
  }

  /** [[hardNegatives]] sugar for a driver-side id list. */
  def hardNegatives(embs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    hardNegatives(embs, idRows(embs, queryIds), k)

  /** [[hardNegatives]] served THROUGH the IVF index: each query probes
    * its `nProbe` nearest cells of the trained `codebook`
    * ([[kmeansCentroids]] output, as [[ivfTopKWith]] consumes) and
    * ranks only the DIFFERENT-label vectors found there. Recall trades
    * exactly as IVF serving does — a negative outside the probed cells
    * is unseen ([[topKRecallAudit]] measures the loss).
    *
    * Scale shape — the corpus-scale mining path: unlike
    * [[hardNegatives]] (query set broadcast, right only for a bounded
    * query batch), the query relation here is NEVER broadcast. Queries
    * cross only the tiny broadcast codebook to pick probe cells, then
    * meet the cell-assigned corpus in a SHUFFLE hash join keyed on
    * cell (`shuffle_hash` hint — both sides may be corpus-fraction, so
    * neither is allowed to broadcast); per-query rank is a
    * WindowGroupLimit top-k. With the corpus stored bucketed by cell,
    * the corpus side of that join pre-exists on disk. */
  def hardNegativesIndexed(
      embs: DataFrame,
      codebook: DataFrame,
      queries: DataFrame,
      nProbe: Int,
      k: Int): DataFrame = {
    val cents = codebook.select(col("cell"), col("cv"), col("cn2"))
    val base = embs
      .select(col("vec_id"), col("label"), Portable.quantize(col("embedding")).as("v"))
      .withColumn("n2", normQ(col("v")))
    // the (vec_id → cell) map is one row PER CORPUS VECTOR — slim but
    // corpus-sized, so it joins back by keyed shuffle, never broadcast
    val assigned = base.join(
      nearestCell(base.select(col("vec_id"), col("v"), col("n2")), cents)
        .select(col("vec_id"), col("cell"))
        .hint("shuffle_hash"),
      "vec_id")
    val probes = queries
      .select(
        col("vec_id").as("qid"),
        col("label").as("__ql"),
        Portable.quantize(col("embedding")).as("qv"))
      .withColumn("qn2", normQ(col("qv")))
      .crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(Portable.dotQ(col("qv"), col("cv")), col("qn2"), col("cn2")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("ccos"), asc("cell"))))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("__ql"), col("qv"), col("qn2"), col("cell"))
    val scored = assigned
      .join(probes.hint("shuffle_hash"), Seq("cell"))
      .filter(col("vec_id") =!= col("qid") && !(col("label") <=> col("__ql")))
      .withColumn("cosine", cosine(Portable.dotQ(col("qv"), col("v")), col("qn2"), col("n2")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("qid"), col("vec_id").as("cid"), col("label").as("neg_label"),
        col("cosine"), col("rank"))
  }

  /** Contrastive TRIPLET mining — the (anchor, positive, negative)
    * relation a retriever/embedding trainer consumes: positives are
    * embedding near-duplicate pairs ([[neardupPairs]] at
    * `posThreshold`, anchored at the lower id), negatives are each
    * anchor's `kNeg` hardest different-label vectors
    * ([[hardNegatives]] — closest to the boundary, the ones worth
    * training on). One row per (pair, negative): anchor, positive,
    * pos_cos, negative, neg_label, neg_cos, rk.
    *
    * Scale shape: positives come from band-blocked candidates (never
    * all-pairs); the anchor set reaches [[hardNegatives]] as a
    * SEMI-JOINED relation (no In-list) and is broadcast there — the
    * anchor batch is the unit of work, so at corpus scale mine per
    * anchor partition/batch exactly as the q120 contract documents. */
  def tripletMining(embs: DataFrame, dim: Int, posThreshold: Double, kNeg: Int): DataFrame = {
    val pos = neardupPairs(embs, dim, posThreshold)
      .select(col("vec_a").as("anchor"), col("vec_b").as("positive"), col("cosine").as("pos_cos"))
    val anchors = embs.join(
      pos.select(col("anchor").as("vec_id")).distinct(), Seq("vec_id"), "left_semi")
    val negs = hardNegatives(embs, anchors, kNeg)
      .select(
        col("qid").as("anchor"), col("cid").as("negative"),
        col("neg_label"), col("cosine").as("neg_cos"), col("rank").as("rk"))
    pos.join(negs, Seq("anchor"))
  }

  /** [[tripletMining]] with negatives mined THROUGH the IVF index —
    * the corpus-scale variant: positives are still band-blocked
    * near-dup pairs ([[neardupPairs]]), but negatives come from
    * [[hardNegativesIndexed]] (probed cells only, shuffle-joined on
    * cell), so NO corpus-fraction relation is broadcast anywhere in
    * the plan. The anchor set (every doc in a near-dup pair — a
    * corpus-scale fraction) is what made the brute-force path's
    * broadcast unsafe; here anchors ride a keyed shuffle like any
    * other large relation. The pair↔negative stitch is likewise
    * forced to a shuffle hash join: both sides scale with the corpus. */
  def tripletMiningIndexed(
      embs: DataFrame,
      codebook: DataFrame,
      dim: Int,
      posThreshold: Double,
      nProbe: Int,
      kNeg: Int): DataFrame = {
    val pos = neardupPairs(embs, dim, posThreshold)
      .select(col("vec_a").as("anchor"), col("vec_b").as("positive"), col("cosine").as("pos_cos"))
    // the anchor id set is corpus-fraction too: keyed-shuffle semi-join
    val anchors = embs.join(
      pos.select(col("anchor").as("vec_id")).distinct().hint("shuffle_hash"),
      Seq("vec_id"), "left_semi")
    val negs = hardNegativesIndexed(embs, codebook, anchors, nProbe, kNeg)
      .select(
        col("qid").as("anchor"), col("cid").as("negative"),
        col("neg_label"), col("cosine").as("neg_cos"), col("rank").as("rk"))
    pos.hint("shuffle_hash").join(negs, Seq("anchor"))
  }

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein SIGIR'98)
    * diversified re-ranking: from each query's cosine top-`poolSize`
    * candidates, greedily select `k` maximizing
    * `0.5·rel(q,c) − 0.5·max_{s∈selected} sim(c,s)` — relevance traded
    * against redundancy, the standard diversity pass between retrieval
    * and a RAG context window. λ is FIXED at 0.5: multiplying by 0.5
    * is exact binary halving, so the score is two exact halvings and
    * one subtraction of doubles derived from exact integer dots —
    * bit-identical in any engine, which keeps the greedy argmax (ties
    * by candidate id) deterministic and oracle-checkable.
    *
    * Scale shape: the corpus is touched ONLY by the broadcast top-k
    * scan ([[bruteForceTopK]]'s plan — swap in [[lshTopK]]/[[ivfTopK]]
    * at scale); the greedy loop runs per query over `poolSize` rows
    * inside one `flatMapGroups` — state is poolSize vectors, O(k·pool)
    * exact integer dots, never a shuffle of anything corpus-sized. */
  def mmrTopK(embs: DataFrame, queries: DataFrame, poolSize: Int, k: Int): DataFrame = {
    require(poolSize >= k && k >= 1, s"need poolSize >= k >= 1 (got pool=$poolSize, k=$k)")
    val spark = embs.sparkSession
    import spark.implicits._
    val cands = bruteForceTopK(embs, queries, poolSize)
      .join(embs.select(col("vec_id").as("cid"), Portable.quantize(col("embedding")).as("cv")), Seq("cid"))
      .select(col("qid"), col("cid"), col("cosine"), col("cv"))
      .as[(Long, Long, Double, Array[Long])]
    cands
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val pool = it.toArray.sortBy(t => (-t._3, t._2)) // rel desc, cid asc
        val n2   = pool.map(t => dotL(t._4, t._4))
        def sim(i: Int, j: Int): Double = {
          val d = dotL(pool(i)._4, pool(j)._4)
          if (n2(i) > 0L && n2(j) > 0L)
            d.toDouble / (math.sqrt(n2(i).toDouble) * math.sqrt(n2(j).toDouble))
          else 0.0
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out      = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double, Int)]
        while (selected.size < math.min(k, pool.length)) {
          var bestIdx = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < pool.length) {
            if (!selected.contains(i)) {
              var pen = 0.0
              selected.foreach { s => val v = sim(i, s); if (v > pen) pen = v }
              val score = 0.5 * pool(i)._3 - 0.5 * pen
              // strict > with cid-ascending scan order = ties keep the
              // smallest cid (pool is sorted rel desc, cid asc, and
              // equal scores from equal (rel, pen) pairs scan in order)
              if (score > bestScore) { bestScore = score; bestIdx = i }
            }
            i += 1
          }
          selected += bestIdx
          out += ((qid, pool(bestIdx)._2, pool(bestIdx)._3, bestScore, selected.size))
        }
        out.iterator
      }
      .toDF("qid", "cid", "cosine", "mmr_score", "sel_rank")
  }

  /** [[mmrTopK]] sugar for a driver-side id list. */
  def mmrTopK(embs: DataFrame, queryIds: Seq[Long], poolSize: Int, k: Int): DataFrame =
    mmrTopK(embs, idRows(embs, queryIds), poolSize, k)

  /** Recall@k audit of an approximate top-k retriever against exact
    * truth — the per-ANN-index twin of [[TextDedup.recallAudit]] (which
    * audits PAIR-finding): before trusting IVF/LSH/PQ at corpus scale,
    * measure how much of the true neighborhood the fast path returns.
    * Inputs are ranked-list relations carrying (qid, cid); output is
    * one row per query: (qid, n_truth, n_hit, recall_ppm), exact
    * integer ppm so the audit itself is oracle-checkable.
    *
    * Scale shape: both sides are top-k relations (|queries|·k rows —
    * orders of magnitude below the corpus); one left join on (qid, cid)
    * and a per-query count aggregate. Nothing corpus-sized moves; run
    * it on the query sample you care about. */
  /** [[topKRecallAudit]] in SAMPLED mode — the 100 TB audit shape: a
    * deterministic hash gate ([[Portable.sampleGate]]) picks
    * `rateBps`/10000 of the QUERIES and the audit runs only on them.
    * Because both inputs are lazy relations, the qid gate pushes
    * through the rank windows (qid is the partition key) down to the
    * query-relation scan — so when `truth` is a declared brute-force
    * plan, the EXACT-TRUTH cost itself shrinks to the sample, which is
    * the point: full-universe truth is unaffordable at corpus scale,
    * a hash-sampled unbiased recall estimate is not. Deterministic
    * gate ⇒ the sampled audit is still oracle-checkable row-for-row. */
  def topKRecallAuditSampled(
      truth: DataFrame,
      approx: DataFrame,
      rateBps: Int,
      seed: String = "audit"): DataFrame = {
    require(rateBps > 0 && rateBps <= 10000, s"rateBps must be in (0, 10000]: $rateBps")
    topKRecallAudit(
      truth.filter(Portable.sampleGate(col("qid"), rateBps, seed)),
      approx.filter(Portable.sampleGate(col("qid"), rateBps, seed)))
  }

  def topKRecallAudit(truth: DataFrame, approx: DataFrame): DataFrame = {
    val t = truth.select(col("qid"), col("cid"))
    val a = approx.select(col("qid"), col("cid")).withColumn("__hit", lit(1))
    t.join(a, Seq("qid", "cid"), "left")
      .groupBy(col("qid"))
      .agg(
        count(lit(1)).as("n_truth"),
        count(col("__hit")).as("n_hit"))
      .withColumn("recall_ppm", expr("(n_hit * 1000000L) div n_truth"))
  }

  /** Recall@k vs nProbe TUNING CURVE for the IVF index — the artifact
    * an operator reads before fixing nProbe in production: one row per
    * probed-cell count with the pooled recall against exact brute-force
    * truth (integer ppm, so the curve itself is oracle-checkable).
    * Returns (n_probe, n_queries, n_truth, n_hit, recall_ppm).
    *
    * Scale shape: each curve point is one [[ivfTopK]] plan over the
    * SAME query relation (broadcast; candidate cost ∝ nProbe) plus the
    * top-k-sized audit join of [[topKRecallAudit]] — the truth side is
    * computed once and reused by every point. Run it on the query
    * sample you tune with; at corpus scale pass a persisted trained
    * codebook via the [[ivfTopKWith]] route and materialized
    * assignments so curve points share the index build. */
  def ivfRecallCurve(
      embs: DataFrame,
      queries: DataFrame,
      nCells: Int,
      nProbes: Seq[Int],
      k: Int): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(_ >= 1), s"need nProbes >= 1 (got $nProbes)")
    val truth = bruteForceTopK(embs, queries, k).select(col("qid"), col("cid"))
    nProbes.distinct.sorted
      .map { p =>
        topKRecallAudit(truth, ivfTopK(embs, queries, nCells, p, k))
          .agg(
            count(lit(1)).as("n_queries"),
            sum(col("n_truth")).as("n_truth"),
            sum(col("n_hit")).as("n_hit"))
          .select(
            lit(p).as("n_probe"),
            col("n_queries"), col("n_truth"), col("n_hit"),
            expr("(n_hit * 1000000L) div n_truth").as("recall_ppm"))
      }
      .reduce(_ unionByName _)
  }

  /** Recall@k vs PROBE COUNT tuning curve for the hyperplane-LSH index
    * — [[ivfRecallCurve]]'s twin on the multi-probe dial: each point
    * probes the query's own bucket plus its first `f` single-bit-flip
    * neighbors (f = 0 is [[lshTopK]], f = H is
    * [[lshTopKMultiProbe]]), audited against exact brute-force truth.
    * Returns (n_flips, n_queries, n_truth, n_hit, recall_ppm) — the
    * measured recall/cost trade an operator reads before fixing the
    * probe budget. Same scale shape as [[ivfRecallCurve]]: truth once,
    * per-point candidate cost ∝ (f+1) probe buckets, audit joins are
    * top-k-sized. */
  def lshRecallCurve(
      embs: DataFrame,
      queries: DataFrame,
      dim: Int,
      nFlips: Seq[Int],
      k: Int): DataFrame = {
    require(
      nFlips.nonEmpty && nFlips.forall(f => f >= 0 && f <= H),
      s"need 0 <= nFlips <= H=$H (got $nFlips)")
    val truth = bruteForceTopK(embs, queries, k).select(col("qid"), col("cid"))
    nFlips.distinct.sorted
      .map { f =>
        val masks = 0L +: (0 until f).map(h => 1L << h)
        topKRecallAudit(
          truth, probedTopK(embs, queries, dim, k, masks, keepBucket = false))
          .agg(
            count(lit(1)).as("n_queries"),
            sum(col("n_truth")).as("n_truth"),
            sum(col("n_hit")).as("n_hit"))
          .select(
            lit(f).as("n_flips"),
            col("n_queries"), col("n_truth"), col("n_hit"),
            expr("(n_hit * 1000000L) div n_truth").as("recall_ppm"))
      }
      .reduce(_ unionByName _)
  }

  /** Matryoshka truncation-recall curve (Kusupati et al. 2022,
    * arXiv:2205.13147): recall@k of cosine ranking over only the FIRST
    * `d` dimensions vs the full-dim exact truth, one row per candidate
    * `d`. MRL-style embeddings front-load information, so serving can
    * truncate vectors to a prefix — this curve is the number an
    * operator reads before choosing the serving dimension (truncation
    * is the cheapest compression of all: no codebooks, no training).
    * Returns (dim, n_queries, n_truth, n_hit, recall_ppm).
    *
    * Scale shape: identical to [[lshRecallCurve]] — the truth side is
    * computed once and reused by every point; each point is a
    * broadcast-query row-scan over prefix slices (at scale, swap the
    * brute-force point for the IVF path over truncated vectors). */
  def matryoshkaRecallCurve(
      embs: DataFrame,
      queries: DataFrame,
      dims: Seq[Int],
      k: Int): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1), s"dims must be positive (got $dims)")
    val truth = bruteForceTopK(embs, queries, k).select(col("qid"), col("cid"))
    def trunc(df: DataFrame, d: Int): DataFrame =
      df.select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding"))
    dims.distinct.sorted
      .map { d =>
        topKRecallAudit(truth, bruteForceTopK(trunc(embs, d), trunc(queries, d), k))
          .agg(
            count(lit(1)).as("n_queries"),
            sum(col("n_truth")).as("n_truth"),
            sum(col("n_hit")).as("n_hit"))
          .select(
            lit(d).as("dim"),
            col("n_queries"), col("n_truth"), col("n_hit"),
            expr("(n_hit * 1000000L) div n_truth").as("recall_ppm"))
      }
      .reduce(_ unionByName _)
  }

  /** Cross-label near-duplicate matrix — the vector twin of
    * [[TextDedup.dupSourceMatrix]]: where does semantic duplication
    * concentrate? Near-dup pairs ([[neardupPairs]]) rolled up by
    * unordered label pair: (label_a ≤ label_b, n_pairs, max_cosine).
    * Off-diagonal mass = cross-source/cross-lingual duplication
    * (translations, mirrors, relabeled copies); diagonal mass =
    * within-source. Pairs are band-blocked, the label join is a slim
    * (vec_id, label) relation, and the rollup is |labels|² rows. */
  def crossLabelNeardups(embs: DataFrame, dim: Int, threshold: Double): DataFrame =
    crossLabelRollup(embs, neardupPairs(embs, dim, threshold))

  /** [[crossLabelNeardups]] over the reps-first pair form
    * ([[neardupPairsViaReps]]) — identical rollup (the pair relation
    * is identical), with the band join and rescore ∝ distinct
    * vectors instead of copies². */
  def crossLabelNeardupsViaReps(embs: DataFrame, dim: Int, threshold: Double): DataFrame =
    crossLabelRollup(embs, neardupPairsViaReps(embs, dim, threshold))

  private def crossLabelRollup(embs: DataFrame, pairs: DataFrame): DataFrame = {
    val lab = embs.select(col("vec_id"), col("label"))
    pairs
      .join(lab.select(col("vec_id").as("vec_a"), col("label").as("__la")), Seq("vec_a"))
      .join(lab.select(col("vec_id").as("vec_b"), col("label").as("__lb")), Seq("vec_b"))
      .groupBy(
        least(col("__la"), col("__lb")).as("label_a"),
        greatest(col("__la"), col("__lb")).as("label_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        max(col("cosine")).as("max_cosine"))
  }

  /** IVF cell-population skew report — the "will one probe be slow?"
    * number next to [[codebookQuality]]'s geometric view: ONE row with
    * n_cells, min/median/p99/max cell population and
    * `imbalance_x1000 = max·n_cells·1000 div n_vectors` (1000 =
    * perfectly balanced; a probe of the hottest cell costs
    * imbalance/1000 × the balanced cost). At corpus scale a single
    * hot cell dominates tail latency for IVF serving AND goes
    * quadratic under SemDeDup — this report is the early warning that
    * says "retrain the codebook" or "turn the cell cap on".
    *
    * Exact integer percentiles (percentile_disc rank arithmetic over
    * the |cells|-row population relation) — bit-portable; the corpus
    * contributes one slim assignment hash-agg. */
  def cellSkewReport(embs: DataFrame, codebook: DataFrame): DataFrame = {
    val pops = assignedCorpus(embs, codebook)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("__n"))
    // |cells| rows: the unpartitioned window is bounded by codebook size
    val ranked = pops
      .withColumn("__rk", row_number().over(Window.orderBy(col("__n").asc, col("cell").asc)))
      .withColumn("__nc", count(lit(1)).over(Window.partitionBy()))
    def pick(num: Int, den: Int): Column =
      min(when(col("__rk") * den >= col("__nc") * num, col("__n")))
    ranked.agg(
      max(col("__nc")).as("n_cells"),
      sum(col("__n")).as("n_vectors"),
      min(col("__n")).as("min_pop"),
      pick(1, 2).as("p50_pop"),
      pick(99, 100).as("p99_pop"),
      max(col("__n")).as("max_pop"))
      .withColumn(
        "imbalance_x1000",
        expr("(max_pop * n_cells * 1000L) div greatest(n_vectors, 1L)"))
  }

  // ---- Scalar quantization (int8 SQ) -------------------------------
  //
  // The 4-byte→1-byte compression every 100 TB vector store applies
  // BEFORE building fancier indexes: symmetric per-dimension int8
  // codes (FAISS's SQ8 / Lucene's int8 HNSW storage). 4× less I/O and
  // memory per vector with ~1% ranking loss — and unlike PQ, decode is
  // a multiply, so SQ composes under every index here (IVF cells store
  // SQ codes at scale). All arithmetic is exact int64 on the already-
  // quantized grid, so codes/scales/scores hash-match the oracle.

  /** Per-dimension symmetric scale relation (i, s): s_i = max |x_i|
    * over the corpus (0-guarded to 1 — an all-zero dimension encodes
    * to 0 regardless). One posexplode + one (i)-keyed map-side-combined
    * hash-agg: |dims| output rows — the train-once artifact of SQ. */
  def sqScales(embs: DataFrame): DataFrame =
    quantized(embs)
      .select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(greatest(max(col("x")), -min(col("x")), lit(1L)).as("s"))

  /** Int8 codes with per-dim reconstruction error:
    * (vec_id, i, code ∈ [−127,127], abs_err) where
    * code = sign(x)·⌊(254·|x| + s) / (2s)⌋ (round-half-away-from-zero,
    * in pure int64 — `div` on negatives differs between engines, so
    * the sign is factored out first) and abs_err = |127·x − code·s|
    * div 127, the decode error on the quantized grid.
    *
    * Scale shape: scales broadcast (|dims| rows), encode is map-only
    * per (vector, dim) — the corpus is read once and never shuffles. */
  def sqEncode(embs: DataFrame, scales: DataFrame): DataFrame =
    sqCodes(embs, scales)
      .select(
        col("vec_id"), col("i"), col("code"),
        expr("abs(127L * x - code * s) div 127L").as("abs_err"))

  /** Full-width encode relation (vec_id, i, x, s, code) shared by
    * [[sqEncode]] (which adds the error column) and [[sqWeighted]]
    * (which needs the scale to weight codes). */
  private def sqCodes(embs: DataFrame, scales: DataFrame): DataFrame =
    quantized(embs)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
      .join(broadcast(scales), Seq("i"))
      .withColumn("__r", expr("(254L * abs(x) + s) div (2L * s)"))
      .withColumn("code", when(col("x") < 0, -col("__r")).otherwise(col("__r")))

  /** The SQ-compressed corpus as ranked-retrieval input: per vector
    * the weighted-code array w_i = code_i · (s_i div 1000) and its
    * norm. The div-1000 rescale keeps the worst-case 64-dim dot
    * ≤ ~4·10¹³ — int64-exact with 5 orders of headroom — while
    * preserving the quantizer's ranking (every dim rescales by the
    * same deterministic truncation in both engines). */
  private def sqWeighted(embs: DataFrame, scales: DataFrame): DataFrame =
    sqCodes(embs, scales)
      .withColumn("w", col("code") * expr("s div 1000L"))
      .groupBy(col("vec_id"))
      .agg(collect_list(struct(col("i"), col("w"))).as("ps"))
      .select(
        col("vec_id"),
        transform(array_sort(col("ps")), p => p.getField("w")).as("w"))
      .withColumn("wn2", normQ(col("w")))

  /** Cosine top-k over the SQ-compressed corpus — brute force on
    * codes: the "compressed flat" baseline (what FAISS calls
    * IndexScalarQuantizer), 4× less data volume than the exact
    * [[bruteForceTopK]] with near-identical ranking; audit the loss
    * with [[topKRecallAudit]]. Queries are SQ-encoded with the SAME
    * trained scales and broadcast; the corpus codes never shuffle. */
  def sqTopKWith(embs: DataFrame, scales: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = sqWeighted(embs, scales)
      .select(col("vec_id").as("cid"), col("w").as("cw"), col("wn2").as("cn2"))
    val q = sqWeighted(queries, scales)
      .select(col("vec_id").as("qid"), col("w").as("qw"), col("wn2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), asc("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("cosine", cosine(Portable.dotQ(col("qw"), col("cw")), col("qn2"), col("cn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  /** [[sqTopKWith]] sugar for a driver-side id list. */
  def sqTopKWith(embs: DataFrame, scales: DataFrame, queryIds: Seq[Long], k: Int): DataFrame =
    sqTopKWith(embs, scales, idRows(embs, queryIds), k)

  // ---- Codebook quality ---------------------------------------------

  /** Per-cell clustering-quality report for a trained codebook — the
    * health check an operator reads before trusting the SAME codebook
    * that serves IVF probes ([[ivfTopKWith]]) and SemDeDup cells
    * ([[semDedupVerdicts]]): a cell whose members sit nearly as close
    * to ANOTHER centroid (separation_ppm → 1·10⁶) smears its
    * neighborhoods across cells, costing IVF recall and SemDeDup
    * coverage. Simplified-silhouette style, on exact int64 squared L2
    * over the quantized grid: per vector a = d²(own centroid),
    * b = min d²(other centroids); per cell report n_vectors,
    * mean a (`mean_own_d2`), and mean separation a·10⁶ div b
    * (`separation_ppm`, 0 = perfectly tight, ≥ 10⁶ = mis-clustered).
    *
    * Scale shape: the codebook is broadcast twice (assignment argmax +
    * runner-up min) in ONE crossJoin pass — per corpus row, a
    * fixed-k fold and a slim two-value hash-agg; the corpus never
    * shuffles and the output is |cells| rows.
    *
    * Domain: embeddings are assumed unit-norm-ish (components ≲ 1, the
    * usual cosine-embedding shape) — on the 1e7 quantization grid d²
    * then stays ≲ 4·10¹⁵·(dim/64) and `a·10³` below cannot wrap int64.
    * Heavily unnormalized vectors (own-centroid d² > ~9.2·10¹⁵) would
    * overflow; rescale them before auditing. `b` is the RUNNER-UP
    * distance, so the codebook must have ≥ 2 cells (required eagerly —
    * a 1-cell report would be vacuous and engine-divergent). */
  def codebookQuality(embs: DataFrame, codebook: DataFrame): DataFrame = {
    val cents = codebook.select(col("cell"), col("cv"), col("cn2"))
    // take(2) is the incremental 1-partition probe, not a full count —
    // the codebook is a persisted k-row relation, so this is ~free
    require(cents.select(col("cell")).take(2).length >= 2,
      "codebookQuality needs a codebook with >= 2 cells (b = runner-up distance)")
    // nearest + runner-up in ONE slim hash-agg: collect the k (d², cell)
    // pairs per vector and struct-sort — d² asc then cell asc IS the
    // assignment tie rule; payload is k fixed-width structs (codebooks
    // are small by construction), map-side combined like every agg here
    val top2 = quantized(embs)
      .crossJoin(broadcast(cents))
      .withColumn(
        "__d2", col("n2") + col("cn2") - lit(2L) * Portable.dotQ(col("v"), col("cv")))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("__d2").as("d2"), col("cell")))).as("ds"))
      .select(
        col("vec_id"),
        col("ds")(0).getField("cell").as("cell"),
        col("ds")(0).getField("d2").as("a"),
        col("ds")(1).getField("d2").as("b"))
    top2
      .withColumn(
        "sep_ppm",
        // a·10³ / (b div 10³): quantized-grid d² runs ~10¹³–10¹⁵, so a
        // direct a·10⁶ overflows int64 — splitting the 10⁶ across the
        // operands keeps everything ≤ ~10¹⁸ with ≤10⁻¹⁰ relative loss,
        // deterministically identical in both engines. b div 10³ = 0
        // means a ≤ b < 1000 on a ~10¹³ grid — the vector effectively
        // sits ON two centroids, maximally ambiguous: 10⁶
        when(expr("b div 1000L") > 0, expr("(a * 1000L) div (b div 1000L)"))
          .otherwise(lit(1000000L)))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_vectors"),
        expr("sum(a) div count(1)").as("mean_own_d2"),
        expr("sum(sep_ppm) div count(1)").as("mean_separation_ppm"))
  }

  /** Exact int64 dot product of two quantized vectors (driver/executor
    * local twin of [[Portable.dotQ]]). */
  private def dotL(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}
