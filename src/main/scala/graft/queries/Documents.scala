package graft.queries

import graft.Tables
import graft.operators.{Multimodal, Packing, Profile, Ranking, Relevance, Similarity, TextAnalysis, TextDedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-training-data operator pack over `documents` / `embeddings`:
  * dedup (exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity
  * search (brute-force + LSH ANN), text analysis, multimodal plumbing.
  *
  * Every pseudo-random ingredient is md5-derived and every float path
  * integer-quantized ([[graft.functions.Portable]]), so each query has
  * a full DuckDB oracle despite hash-based semantics.
  */
object Documents {

  private val QueryIds = Seq(0L, 1L, 2L, 3L, 4L)

  /** The dedup family (q31/q32/q33/q53) consumes ONE logical shingle
    * relation, and q54/q57 share the winnowing fingerprint relation
    * the same way. At 100 TB these are materialized intermediates —
    * compute once, read by every downstream stage — so the local
    * analogue is a persisted DataFrame shared per (session, dir)
    * ([[DirCached]]). */
  private val shingleCache = new DirCached
  private def sharedShingles(s: SparkSession, dir: String): DataFrame =
    shingleCache(s, dir)(
      TextDedup.shingleRows(Tables.documents(s, dir), col("doc_id"), col("text"), 3))

  private val winnowCache = new DirCached
  private def sharedWinnowFps(s: SparkSession, dir: String): DataFrame =
    winnowCache(s, dir)(
      TextAnalysis.winnowingFingerprints(Tables.documents(s, dir), col("doc_id"), col("text")))

  // The exact-Jaccard pair relation and its connected-component labels
  // are the two most expensive dedup intermediates, each consumed by
  // several queries (pairs: q31/q53/q64; labels: q53/q64) — both are
  // materialized once per (session, dir) like the shingles they derive
  // from. Note the labels cache builds EAGERLY on first access
  // (starContract runs its rounds driver-side), which is exactly the
  // "train once, read forever" lifecycle of a real dedup stage.
  /** Hot-shingle df cap for the shared exact-Jaccard relation
    * (q31/q53/q64/q85). At 100 TB an uncapped posting-list self-join
    * is quadratic on any boilerplate trigram shared corpus-wide —
    * the one genuine scale risk in the dedup family — so the
    * production path runs CAPPED by default: shingles in more than
    * 128 documents are dropped before the join (bounding candidate
    * volume to ≤ 128²/2 per shingle) and Jaccard is measured over
    * the capped universe, exactly as [[TextDedup.jaccardPairsFromRows]]
    * documents. The DuckDB oracles mirror the cap (`shj` CTE), so the
    * contract stays hash-exact at any scale. Observed max shingle df
    * in the test corpus: 7 at sf0.01, 25 at sf0.1 — well under the
    * cap, which exists for the corpus where it matters. */
  private[graft] val SharedJaccardDfCap = 128L

  /** q106 paragraph-dedup knobs: mean segment length (words) and the
    * document-frequency above which a segment is boilerplate. */
  private[graft] val ParagraphBreakDivisor = 4
  private[graft] val ParagraphMaxDf = 1L

  private val pairsCache = new DirCached
  private def sharedJaccardPairs(s: SparkSession, dir: String): DataFrame =
    pairsCache(s, dir)(
      TextDedup.jaccardPairsFromRows(
        sharedShingles(s, dir), 0.8, maxShingleDf = Some(SharedJaccardDfCap)))

  // Exact full-universe Jaccard pairs (PPJoin prefix filter) — the
  // ground-truth relation consumed by q99 (export) and q112 (audit
  // truth side). Exactness makes it cost ∝ true-pair mass, so at
  // scale it is computed once per corpus snapshot (or on a sample)
  // and read by every auditor — the cache models that lifecycle.
  private val prefixPairsCache = new DirCached
  private def sharedPrefixPairs(s: SparkSession, dir: String): DataFrame =
    prefixPairsCache(s, dir)(
      TextDedup.prefixJaccardPairs(sharedShingles(s, dir), 0.8))

  private val clustersCache = new DirCached
  private def sharedClusters(s: SparkSession, dir: String): DataFrame =
    clustersCache(s, dir)(
      TextDedup.dedupClusters(sharedJaccardPairs(s, dir)))

  private val simhashCache = new DirCached
  private def sharedSimhashes(s: SparkSession, dir: String): DataFrame =
    simhashCache(s, dir)(
      TextDedup.simhashes(Tables.documents(s, dir), col("doc_id"), col("text")))

  // MinHash signatures are consumed by four queries (q32 export, q33
  // banding, q84 rescoring, q95 index probing) and cost one full
  // shuffle of the shingle relation to compute — the classic
  // sign-once-read-forever index artifact, so it is materialized like
  // the shingles it derives from.
  private val sigsCache = new DirCached
  private def sharedSigs(s: SparkSession, dir: String): DataFrame =
    sigsCache(s, dir)(
      TextDedup.minhashSignaturesFromRows(sharedShingles(s, dir)))

  // The trained codebook is the canonical materialized intermediate:
  // q61 assigns with it, q63 probes with it ("train once").
  private val codebookCache = new DirCached
  private def sharedCodebook(s: SparkSession, dir: String): DataFrame =
    codebookCache(s, dir)(
      Similarity.kmeansCentroids(Tables.embeddings(s, dir), 8))

  // PQ compression parameters: 64 dims → 4 subspaces × 16 dims,
  // 8 codewords each; the trained per-subspace codebooks are the
  // train-once artifact q101 encodes with and q102 serves from.
  private val PqM = 4
  private val PqK = 8
  private val EmbDim = 64
  private val pqCbCache = new DirCached
  private def sharedPqCodebooks(s: SparkSession, dir: String): DataFrame =
    pqCbCache(s, dir)(
      Similarity.pqCodebooks(Tables.embeddings(s, dir), EmbDim, PqM, PqK))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup via normalized-content fingerprint: hash-groupBy,
    // one shuffle on the 128-bit key, partial agg map-side.
    "q30_exact_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      TextDedup.exactDupGroups(d, col("doc_id"), TextAnalysis.fingerprint(col("text")))
    }),

    // Exact word-3gram Jaccard near-dup pairs ≥ 0.8 (finds the
    // corpus's planted near-duplicates). Shingle join = blocking.
    "q31_ngram_jaccard_pairs" -> ((s, dir) => sharedJaccardPairs(s, dir)),

    // MinHash signatures (16 perms), computed whole-row; exploded to
    // (doc_id, k, minhash) rows for the oracle compare.
    "q32_minhash_signatures" -> ((s, dir) =>
      sharedSigs(s, dir)
        .select(col("doc_id"), posexplode(col("sig")).as(Seq("k", "minhash")))),

    // MinHash-LSH candidate pairs (8 bands × 2 rows) with estimated
    // Jaccard ≥ 0.5 — the scale path for q31.
    "q33_minhash_lsh_pairs" -> ((s, dir) =>
      TextDedup.lshPairs(sharedSigs(s, dir), 0.5)),

    // Per-doc 32-bit SimHash fingerprints (persisted, shared with q35
    // — the same materialized-intermediate pattern as the shingles).
    "q34_simhash" -> ((s, dir) => sharedSimhashes(s, dir)),

    // SimHash near-dup pairs: byte-block candidates, hamming ≤ 6.
    "q35_simhash_pairs" -> ((s, dir) =>
      TextDedup.simhashPairsFromHashes(sharedSimhashes(s, dir), 6)),

    // Brute-force cosine top-10 for 5 broadcast query vectors —
    // exact ANN baseline on integer-quantized embeddings.
    "q36_cosine_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), QueryIds, 10)
        .withColumnRenamed("rank", "rk")),

    // Hyperplane-LSH ANN: same queries restricted to their bucket.
    "q37_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(Tables.embeddings(s, dir), QueryIds, dim = 64, k = 5)
        .withColumnRenamed("rank", "rk")),

    // Multi-probe LSH: own bucket + all single-bit flips — recall
    // recovered at (H+1)× candidate cost, corpus still unshuffled.
    "q88_ann_multiprobe" -> ((s, dir) =>
      Similarity.lshTopKMultiProbe(Tables.embeddings(s, dir), QueryIds, dim = 64, k = 5)
        .withColumnRenamed("rank", "rk")),

    // Token counting (whitespace + BPE-ish regex) & quality scoring.
    "q38_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(Tables.documents(s, dir), col("doc_id"), col("text"))),

    // Stopword-vote language ID, confusion rollup vs labeled lang.
    "q39_langid" -> ((s, dir) =>
      TextAnalysis.languageIdSummary(Tables.documents(s, dir), col("text"))),

    // Multimodal: REAL PNG decode (javax.imageio) over manifest-
    // generated payloads — the oracle recomputes dims + pixel hash
    // from the closed-form manifest; PNG losslessness makes a correct
    // codec round trip hash-exact.
    "q40_multimodal_decode" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Multimodal.decodeImages(Multimodal.syntheticImages(d, col("doc_id")))
    }),

    // Frame sampling over the decoded media (every 4th frame).
    "q41_frame_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val decoded = Multimodal.decodeFeatures(Multimodal.asMediaTable(d, col("doc_id"), col("text")))
      Multimodal.sampleFrames(decoded, 4)
    }),

    // Embedding-cosine near-dup pairs: LSH-band blocking + exact
    // rescoring (threshold below the corpus max-cos so output is
    // non-trivial on unplanted data).
    "q43_embedding_neardup" -> ((s, dir) =>
      Similarity.neardupPairs(Tables.embeddings(s, dir), dim = 64, threshold = 0.35)),

    // Corpus vocabulary: top-50 tokens by document frequency.
    "q44_vocabulary" -> ((s, dir) =>
      TextAnalysis.vocabulary(Tables.documents(s, dir), col("doc_id"), col("text"), 50)),

    // IVF ANN: 16 seed-centroid cells, 2-cell probe, exact rescoring.
    "q45_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), QueryIds, nCells = 16, nProbe = 2, k = 5)
        .withColumnRenamed("rank", "rk")),

    // Multimodal resize: REAL decode + aspect-fit + nearest-neighbor
    // resample of the decoded raster (thumbnail box 8×6 keeps the
    // oracle's pixel grid small at any SF).
    "q49_multimodal_resize" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Multimodal.resizeImages(
        Multimodal.syntheticImages(d, col("doc_id")), maxW = 8L, maxH = 6L)
    }),

    // One-pass column profile of the documents table (nulls, distinct,
    // bounds) — the pre-flight check of every data pipeline.
    "q51_profile" -> ((s, dir) => Profile.columnProfile(Tables.documents(s, dir))),

    // Deterministic hash-based train/val/test split (80/10/10) —
    // reproducible across engines/partitionings, never rand().
    "q52_split" -> ((s, dir) =>
      Profile.withSplit(Tables.documents(s, dir), col("doc_id"), 80, 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), graft.functions.Det.dsum(col("n_chars")).as("sum_chars"))),

    // Dedup decision: connected components over the exact near-dup
    // pairs (q31) — every doc in a cluster labeled with the component
    // minimum (the keeper).
    "q53_dedup_clusters" -> ((s, dir) => sharedClusters(s, dir)),

    // MOSS winnowing fingerprints (8-char grams, window 4): the
    // partial-overlap detection key — map-only, no shuffle.
    "q54_winnowing" -> ((s, dir) => sharedWinnowFps(s, dir)),

    // Gopher-style repetition/boilerplate signals per document.
    "q55_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionMetrics(Tables.documents(s, dir), col("doc_id"), col("text"))),

    // Deterministic stratified sample (downsample en, keep all de...)
    // rolled up per language for a stable, oracle-checkable result.
    "q56_stratified_sample" -> ((s, dir) =>
      Profile.stratifiedSample(
        Tables.documents(s, dir),
        col("lang"),
        col("doc_id"),
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.25, "es" -> 0.1, "zh" -> 0.75))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          graft.functions.Det.dsum(col("n_chars")).as("sum_chars"))),

    // Containment pairs over df-capped winnowing fingerprints — the
    // partial-overlap detector Jaccard misses.
    "q57_winnow_overlap" -> ((s, dir) =>
      TextDedup.winnowOverlapPairsFromFps(sharedWinnowFps(s, dir))),

    // Benchmark decontamination: src0 documents stand in for the eval
    // set; every other doc sharing a word-5-gram with them is flagged.
    "q58_decontamination" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      TextDedup.contaminationFlags(
        d.filter(col("source") =!= "src0"), col("doc_id"), col("text"),
        d.filter(col("source") === "src0"), col("text"), 5)
    }),

    // Per-language top-5 word bigrams: the per-subcorpus frequency
    // table (vocab pruning / boilerplate discovery per language).
    "q59_lang_ngrams" -> ((s, dir) =>
      TextAnalysis.topNgramsPerGroup(Tables.documents(s, dir), col("lang"), col("text"), 2, 5)
        .withColumnRenamed("grp", "lang")),

    // Sequence packing: global token offsets + 512-token training-bin
    // assignment via the two-phase distributed prefix sum.
    "q60_seq_packing" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Packing.packSequences(
        d, col("doc_id"), size(TextAnalysis.tokens(col("text"))), capacity = 512L)
    }),

    // Distributed k-means (8 cells, one Lloyd refinement from seed
    // centroids) — codebook training for the IVF index; the trained
    // codebook is persisted and shared with q63.
    "q61_kmeans" -> ((s, dir) =>
      Similarity.kmeansAssignWith(Tables.embeddings(s, dir), sharedCodebook(s, dir))),

    // IVF ANN served from the TRAINED codebook (q61's centroids) —
    // the production lifecycle: train once, probe forever.
    "q63_ann_ivf_trained" -> ((s, dir) =>
      Similarity.ivfTopKWith(
        Tables.embeddings(s, dir), sharedCodebook(s, dir), QueryIds, nProbe = 2, k = 5)
        .withColumnRenamed("rank", "rk")),

    // The dedup DECISION list: keep / drop_exact / drop_near per doc
    // with the survivor it defers to — exact fingerprint groups +
    // near-dup clusters (q30 ∘ q53) composed into the verdict a
    // pipeline actually consumes.
    "q64_dedup_verdicts" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      TextDedup.dedupVerdictsFromClusters(
        d, col("doc_id"), TextAnalysis.fingerprint(col("text")),
        sharedClusters(s, dir))
    }),

    // PII scrub over deterministically PLANTED pii (the corpus is
    // synthetic word salad, so the harness appends an email per doc, a
    // phone every 3rd, an IPv4 every 5th — making the cross-engine
    // regex match/redact behavior real, not vacuously zero).
    "q62_pii_scrub" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val planted = d.select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" reach user"), col("doc_id").cast("string"), lit("@example.com"),
          when(pmod(col("doc_id"), lit(3L)) === 0,
            concat(lit(" or 555-"), lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5L)) === 0,
            concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256L)).cast("string"), lit(".25")))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.piiScrub(planted, col("doc_id"), col("text"))
    }),

    // Top-3 TF-IDF terms per document (rational smoothed idf — exact
    // integer counts, one fixed-order double divide; see Relevance).
    "q72_tfidf" -> ((s, dir) =>
      Relevance.topTfidfPerDoc(Tables.documents(s, dir), col("doc_id"), col("text"), 3)),

    // BM25 top-20 for a fixed 5-term query bag — inverted-index
    // retrieval with per-doc totals summed in fixed term order.
    "q73_bm25" -> ((s, dir) =>
      Relevance.bm25(
        Tables.documents(s, dir), col("doc_id"), col("text"),
        Bm25Terms, topK = 20)),

    // Temperature-based source rebalancing (α = 0.5): large sources
    // downsampled toward the smallest, deterministic hash gate,
    // rolled up per source.
    "q74_temperature_sample" -> ((s, dir) =>
      Profile.temperatureSample(Tables.documents(s, dir), col("source"), col("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), min(col("sample_rate_bps")).as("rate_bps"))),

    // Embedding-quality screen: 3 vectors per label farthest from
    // their label's centroid direction (mislabel / OOD candidates).
    "q75_centroid_outliers" -> ((s, dir) =>
      Similarity.centroidOutliers(Tables.embeddings(s, dir), col("label"), 3)),

    // Corpus-trained bigram-LM likelihood per doc (integer-ppm
    // quantized — the log-free perplexity stand-in).
    "q76_lm_score" -> ((s, dir) =>
      TextAnalysis.bigramLmScore(Tables.documents(s, dir), col("doc_id"), col("text"))),

    // Quality-gate verdicts: per-doc gate booleans + keep/drop — the
    // filter decision list (quality analogue of q64).
    "q93_quality_verdicts" -> ((s, dir) =>
      TextAnalysis.qualityVerdicts(Tables.documents(s, dir), col("doc_id"), col("text"))),

    // Per-source document cap (max 10 per source, deterministic hash
    // ranking) — the domain-cap curation stage; WindowGroupLimit keeps
    // the per-partition cost at k rows per group (pinned).
    "q94_source_cap" -> ((s, dir) =>
      Profile.groupCap(Tables.documents(s, dir), col("source"), col("doc_id"), k = 10)),

    // Incremental ingest dedup: the odd-id half arrives as a NEW batch
    // and probes the even-id half as the EXISTING signature index —
    // cost scales with the batch, never the corpus self-join.
    "q95_incremental_neardup" -> ((s, dir) => {
      val sigs = sharedSigs(s, dir)
      TextDedup.lshPairsAgainstIndex(
        sigs.filter(col("doc_id") % 2 === 1),
        sigs.filter(col("doc_id") % 2 === 0),
        estThreshold = 0.5)
    }),

    // Quality-aware canonical keeper per near-dup cluster (q53's
    // clusters + q38's quality score): keep the best copy, not the
    // smallest id — tie-broken exactly, so fully oracle-checkable.
    "q105_canonical_keepers" -> ((s, dir) =>
      TextDedup.canonicalKeepers(
        Tables.documents(s, dir),
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")),
        sharedClusters(s, dir))),

    // CCNet/Dolma-style global paragraph dedup: ban content-defined
    // segments shared across documents, reassemble the cleaned text.
    // The removal op the pair-finding dedup family feeds.
    "q106_paragraph_dedup" -> ((s, dir) =>
      TextDedup.paragraphDedup(
        Tables.documents(s, dir),
        col("doc_id"),
        col("text"),
        breakDivisor = ParagraphBreakDivisor,
        maxDocFreq = ParagraphMaxDf)),

    // Bloom-gated EXACT incremental dedup (q95's exact-match sibling,
    // same even=history / odd=new-batch split): history folds into a
    // broadcast Bloom filter, only bloom-hit new rows reach the
    // history join — deterministic output because bloom misses are
    // provably novel (fpp trades join volume, never correctness).
    "q104_bloom_dedup_gate" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      TextDedup.bloomDedupGate(
        d.filter(col("doc_id") % 2 === 1),
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")),
        d.filter(col("doc_id") % 2 === 0)
          .select(TextAnalysis.fingerprint(col("text")).as("fp")),
        fpp = 0.01)
    }),

    // Exact duplicated-passage spans across docs (ExactSubstr-style):
    // strided 32-char gram hashes, cross-doc df ≥ 2, span merge.
    "q89_dup_spans" -> ((s, dir) =>
      TextAnalysis.dupSpans(Tables.documents(s, dir), col("doc_id"), col("text"))),

    // The production near-dup path made explicit: LSH candidates
    // (q33) rescored with EXACT Jaccard (q31's score) — candidates
    // only, never the full shingle self-join.
    "q84_lsh_rescored" -> ((s, dir) =>
      TextDedup.lshRescoredPairs(
        sharedShingles(s, dir), estThreshold = 0.5, threshold = 0.8,
        precomputedSigs = Some(sharedSigs(s, dir)))),

    // CAPSTONE: the whole training-data prep pipeline as ONE plan —
    // dedup verdicts (exact + near) → drop the benchmark source →
    // decontaminate against its grams → temperature-rebalance →
    // per-source rollup. Every stage reuses the operators above; the
    // oracle chains the same CTE fragments.
    "q85_prep_pipeline" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val keep = TextDedup.dedupVerdictsFromClusters(
        d, col("doc_id"), TextAnalysis.fingerprint(col("text")), sharedClusters(s, dir))
        .filter(col("verdict") === "keep")
        .select("doc_id")
      val kept1    = d.join(keep, Seq("doc_id"), "left_semi")
      val nonBench = kept1.filter(col("source") =!= "src0")
      val contaminated = TextDedup.contaminationFlags(
        nonBench, col("doc_id"), col("text"),
        d.filter(col("source") === "src0"), col("text"), 5)
        .select("doc_id")
      val kept2 = nonBench.join(contaminated, Seq("doc_id"), "left_anti")
      Profile.temperatureSample(kept2, col("source"), col("doc_id"), seed = "prep")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          graft.functions.Det.dsum(col("n_chars")).as("sum_chars"))
    }),

    // SemDeDup: semantic dedup via within-cluster cosine against the
    // SAME trained codebook the IVF index probes — the k-means
    // partition is the blocking structure (pairs only inside a cell).
    "q96_semdedup" -> ((s, dir) =>
      Similarity.semDedupVerdicts(
        Tables.embeddings(s, dir), sharedCodebook(s, dir), tau = 0.4)),

    // DSIR importance weights: src1 as the trusted target corpus,
    // hashed-bigram profile ratio in exact integer ppm — the
    // data-selection score that reweights the raw pool toward target.
    "q97_dsir_weights" -> ((s, dir) =>
      TextAnalysis.dsirWeights(
        Tables.documents(s, dir), col("doc_id"), col("text"),
        isTarget = col("source") === "src1")),

    // Per-source distribution drift vs the corpus: the ingest monitor
    // that catches a source gone wrong before it trains.
    "q98_source_drift" -> ((s, dir) =>
      TextAnalysis.sourceDrift(
        Tables.documents(s, dir), col("doc_id"), col("text"), col("source"))),

    // Prefix-filtered EXACT Jaccard ≥ 0.8 over the FULL shingle
    // universe — no cap, no LSH recall loss; hot posting lists shrink
    // by rarest-first ordering instead of dropping (PPJoin family).
    "q99_prefix_jaccard" -> ((s, dir) => sharedPrefixPairs(s, dir)),

    // PQ encode: the m-codes-per-vector compression artifact (with
    // exact per-subspace quantization error) a 100 TB corpus
    // materializes once — vectors never leave the scan again.
    "q101_pq_codes" -> ((s, dir) =>
      Similarity.pqEncode(
        Tables.embeddings(s, dir), EmbDim, PqM, sharedPqCodebooks(s, dir))),

    // PQ ADC top-k: distance tables broadcast, only CODES move —
    // the serving plan never touches a full vector.
    "q102_pq_topk" -> ((s, dir) =>
      Similarity.pqTopKWith(
        Tables.embeddings(s, dir), sharedPqCodebooks(s, dir),
        Seq(0L, 1L, 2L, 3L, 4L), EmbDim, PqM, k = 5)),

    // Sliding-window chunking: 64-token windows every 48 tokens —
    // the context-length splitter feeding embedding/indexing stages.
    // Map-only explode, amplification exactly ⌈n/48⌉ per doc.
    "q107_chunking" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(
        Tables.documents(s, dir), col("doc_id"), col("text"),
        chunkTokens = 64, stride = 48)),

    // Deterministic global shuffle into 8 shards: the "randomize
    // training order" step, reproducible across engines/partitionings.
    "q108_global_shuffle" -> ((s, dir) =>
      Profile.globalShuffle(Tables.documents(s, dir), col("doc_id"), shards = 8)),

    // Exact per-source length quantiles over the compressed
    // (source, len) relation — the context-length sizing report.
    "q109_length_quantiles" -> ((s, dir) =>
      Profile.lengthQuantiles(Tables.documents(s, dir), col("source"), col("n_chars"))),

    // Mixture repeat-factor plan (α = 0.5 temperature): the per-source
    // epoch multipliers that realize the rebalanced mixture by
    // UPSAMPLING small sources (complement of q74's downsampling).
    "q110_mixture_plan" -> ((s, dir) =>
      Profile.mixturePlan(Tables.documents(s, dir), col("source"))),

    // Semantic decontamination: label-0 vectors stand in for a
    // benchmark embedding set; corpus vectors with max cosine ≥ 0.35
    // against ANY of them are flagged — the embedding-space complement
    // of q58's n-gram decontamination.
    "q111_semantic_decontamination" -> ((s, dir) =>
      Similarity.semanticContamination(
        Tables.embeddings(s, dir), benchPred = col("label") === 0, threshold = 0.35)),

    // Recall/precision audit of the production LSH near-dup path (q84)
    // against exact full-universe truth (q99's prefix-filtered join):
    // the measured answer to "what does the fast path miss?". Both
    // sides reuse the shared shingle/signature intermediates.
    "q112_lsh_recall_audit" -> ((s, dir) =>
      TextDedup.recallAudit(
        sharedPrefixPairs(s, dir),
        TextDedup.lshRescoredPairs(
          sharedShingles(s, dir), estThreshold = 0.5, threshold = 0.8,
          precomputedSigs = Some(sharedSigs(s, dir))))),

    // Vocabulary coverage curve: % of token occurrences covered by the
    // top-K words — the tokenizer-sizing number. Distributed rank over
    // the compressed vocab relation, never a one-reducer sort.
    "q113_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(
        Tables.documents(s, dir), col("text"), Seq(10, 100, 1000))),

    // CCNet-style head/middle/tail split by corpus-LM score: q76's
    // bigram-LM doc scores bucketed with the DISTRIBUTED exact ntile
    // (the single-reducer-free q81 machinery reused on text).
    "q114_perplexity_buckets" -> ((s, dir) => {
      val scored = TextAnalysis.bigramLmScore(
        Tables.documents(s, dir), col("doc_id"), col("text"))
        .select(col("doc_id"), col("avg_p_ppm"))
      Ranking.globalNtile(scored, -col("avg_p_ppm"), Seq(col("doc_id")), buckets = 3)
        .drop("rank")
        .withColumn(
          "bucket",
          when(col("tile") === 1, "head").when(col("tile") === 2, "middle").otherwise("tail"))
    }),

    // Realized epochs: materialize q110's repeat plan into the
    // epoch-expanded training list (⌊repeat⌋ copies each + hash-gated
    // fractional extras) — map-only explode, plan broadcast back.
    "q115_realized_epochs" -> ((s, dir) =>
      Profile.realizeMixture(Tables.documents(s, dir), col("source"), col("doc_id"))),

    // Hybrid retrieval: q73's BM25 list fused with q36's per-query
    // vector lists by reciprocal-rank fusion (integer-ppm RRF — ranks
    // only, no score calibration). The fixture pairs vec_id 1:1 with
    // doc_id, so both lists speak the same id space.
    "q116_hybrid_rrf" -> ((s, dir) =>
      Relevance.rrfFuse(
        Relevance.bm25(
          Tables.documents(s, dir), col("doc_id"), col("text"), Bm25Terms, topK = 20),
        Similarity.bruteForceTopK(Tables.embeddings(s, dir), QueryIds, 10))),

    // Per-doc character statistics via the one-pass codegen'd
    // CharSimpson expression — map-only; the per-character explode
    // only the ORACLE runs would be a corpus-of-chars shuffle.
    "q117_char_stats" -> ((s, dir) =>
      TextAnalysis.charStats(Tables.documents(s, dir), col("doc_id"), col("text"))),

    // What a 64-token context window costs per source — map-only token
    // counts, one hash-agg to |sources| rows.
    "q118_truncation_loss" -> ((s, dir) =>
      TextAnalysis.truncationLoss(
        Tables.documents(s, dir), col("source"), col("text"), maxLen = 64)),

    // Token savings of exact dedup per source: global keep-min keeper
    // assignment (one fp window), per-source rollup.
    "q119_dedup_token_yield" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      TextDedup.dedupTokenYield(
        d, col("doc_id"), TextAnalysis.fingerprint(col("text")), col("source"), col("text"))
    }),

    // Hard negatives for contrastive training: top-10 most-similar
    // DIFFERENT-label vectors per query; corpus never shuffles.
    "q120_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir), QueryIds, 10)
        .withColumnRenamed("rank", "rk")),

    // Epoch-rotated exact-dedup keepers: seeded hash of the GROUP key
    // picks which copy trains this epoch — one per group, rotating.
    "q121_epoch_keepers" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      TextDedup.epochKeepers(
        d, col("doc_id"), TextAnalysis.fingerprint(col("text")), seed = "epoch0")
    }),

    // MMR diversity re-rank of the cosine top-10 pool down to 5 — the
    // greedy loop touches poolSize rows per query; corpus only sees
    // the broadcast top-k scan.
    "q124_mmr_rerank" -> ((s, dir) =>
      Similarity.mmrTopK(Tables.embeddings(s, dir), QueryIds, poolSize = 10, k = 5))
  )

  /** Fixed BM25 query bag (shared with the oracle SQL). */
  private val Bm25Terms = Seq("spark", "join", "window", "hash", "filter")

  // ---- oracle SQL ----------------------------------------------------

  /** Whitespace tokenization, shared CTE. */
  private val wordsCte =
    """words AS (
         SELECT doc_id, text, lang, string_split_regex(trim(text), '\s+') AS ws FROM documents
       )"""

  /** Distinct word-3gram shingles per doc (guarded like the Spark side:
    * Spark's sequence(1, n) would count DOWN for n<1). */
  private val shinglesCte = wordsCte + """,
       sh0 AS (
         SELECT doc_id,
                CASE WHEN len(ws) >= 3
                     THEN list_distinct(list_transform(generate_series(1, len(ws)-2),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     ELSE []::VARCHAR[] END AS sh
         FROM words
       ),
       sh AS (SELECT doc_id, unnest(sh) AS s FROM sh0)"""

  /** [[shinglesCte]] plus the df-capped universe `shj` the shared
    * exact-Jaccard path computes over — mirror of `maxShingleDf =
    * Some(SharedJaccardDfCap)` in [[TextDedup.jaccardPairsFromRows]]. */
  private val cappedShinglesCte = shinglesCte + s""",
       shj AS (
         SELECT doc_id, s FROM sh
         WHERE s IN (SELECT s FROM sh GROUP BY s HAVING COUNT(1) <= $SharedJaccardDfCap))"""

  /** (doc_id, k, minhash) signature rows — mirror of the whole-row
    * Spark computation, in exploded relational form. */
  private val sigCte = shinglesCte + """,
       hs AS (
         SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h FROM sh
       ),
       sig AS (
         SELECT doc_id, k,
                MIN(( (((k+1)*2654435761) % 2147483647) * h
                      + (((k+7)*976369) % 2147483647) ) % 2147483647) AS minhash
         FROM hs, (SELECT unnest(generate_series(0, 15)) AS k)
         GROUP BY doc_id, k
       )"""

  /** Per-doc 32-bit simhash — exploded mirror of the Spark fold. */
  private val simhashCte = wordsCte + """,
       th AS (
         SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h
         FROM (SELECT doc_id, unnest(ws) AS t FROM words)
       ),
       bits AS (
         SELECT doc_id, b, SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
         FROM th, (SELECT unnest(generate_series(0, 31)) AS b)
         GROUP BY doc_id, b
       ),
       shs AS (
         SELECT doc_id,
                CAST(SUM(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
         FROM bits GROUP BY doc_id
       )"""

  /** Winnowing fingerprint selection (k=8, w=4), mirror of
    * [[graft.operators.TextAnalysis.winnowingFingerprints]] /
    * [[graft.functions.WinnowSelect]]: `sel` holds per-doc gram-hash
    * arrays (`hs`) plus the distinct rightmost-min window selections
    * (`ps`, 1-based). */
  private val winnowCte =
    """nrm AS (
         SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS nt FROM documents
       ),
       g AS (
         SELECT doc_id,
                CASE WHEN length(nt) >= 8
                     THEN list_transform(generate_series(1, length(nt)-7),
                            i -> ('0x' || substr(md5(substr(nt, i, 8)), 1, 8))::BIGINT)
                     ELSE []::BIGINT[] END AS hs
         FROM nrm
       ),
       sel AS (
         SELECT doc_id, hs,
                CASE WHEN len(hs) >= 1 THEN
                     list_distinct(list_transform(generate_series(1, greatest(len(hs)-3, 1)),
                       j -> CAST(j + len(hs[j:j+3])
                                 - list_position(list_reverse(hs[j:j+3]),
                                                 list_aggregate(hs[j:j+3], 'min')) AS INT)))
                ELSE []::INT[] END AS ps
         FROM g
       )"""

  /** Integer-quantized embeddings + exact squared norms. */
  private val quantCte =
    """e AS (
         SELECT vec_id,
                list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
         FROM embeddings
       ),
       en AS (
         SELECT vec_id, v,
                CAST(list_aggregate(list_transform(v, x -> x*x), 'sum') AS BIGINT) AS n2
         FROM e
       )"""

  private val dotSql =
    "CAST(list_aggregate(list_transform(list_zip(%s, %s), p -> p[1] * p[2]), 'sum') AS BIGINT)"

  /** Dedup-verdict CTE chain (exact Jaccard pairs → recursive-CTE
    * connected components → exact-fingerprint keepers → `j` with
    * (doc_id, exact_keeper, cluster_min)). Requires `WITH RECURSIVE`;
    * shared by q64 and the q85 pipeline. */
  private def verdictCtes = s"""$cappedShinglesCte,
       sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
         FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2
       ),
       pairs AS (
         SELECT da AS doc_a, db AS doc_b
         FROM inter
         JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
         WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
       ),
       edges AS (
         SELECT doc_a AS src, doc_b AS dst FROM pairs
         UNION
         SELECT doc_b, doc_a FROM pairs
       ),
       reach AS (
         SELECT DISTINCT src AS doc_id, src AS r FROM edges
         UNION
         SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
       ),
       clus AS (SELECT doc_id, MIN(r) AS cluster_min FROM reach GROUP BY doc_id),
       fpk AS (
         SELECT doc_id,
                md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
         FROM documents
       ),
       keepers AS (SELECT fp, MIN(doc_id) AS exact_keeper FROM fpk GROUP BY fp),
       j AS (
         SELECT f.doc_id, k.exact_keeper, c.cluster_min
         FROM fpk f JOIN keepers k USING (fp)
         LEFT JOIN clus c ON c.doc_id = f.doc_id
       )"""

  /** Trained k-means codebook (k=8, one Lloyd round from the seed
    * centroids), mirror of [[graft.operators.Similarity.kmeansCentroids]]:
    * `cn` holds (cell, cv, cn2). Requires [[quantCte]] in scope; uses
    * [[cosSql]] for the assignment argmax. */
  private def kmeansCte = s"""cents0 AS (SELECT vec_id AS cell, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 8),
       cc1 AS (
         SELECT en.vec_id, c.cell,
                ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
         FROM en, cents0 c
       ),
       a1 AS (
         SELECT vec_id, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
           FROM cc1) WHERE rn = 1
       ),
       comp AS (
         SELECT a1.cell, generate_subscripts(en.v, 1) AS i, unnest(en.v) AS x
         FROM en JOIN a1 USING (vec_id)
       ),
       sums AS (SELECT cell, i, SUM(x) AS sx, COUNT(1) AS cnt FROM comp GROUP BY 1, 2),
       cents1 AS (
         SELECT cell,
                list(CAST(trunc(CAST(sx AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS cv
         FROM sums GROUP BY cell
       ),
       cn AS (
         SELECT cell, cv,
                CAST(list_aggregate(list_transform(cv, x -> x*x), 'sum') AS BIGINT) AS cn2
         FROM cents1
       )"""

  /** PQ mirror: slice → seed → one Lloyd round (integer-mean update,
    * the [[kmeansCte]] contract per subspace) → codes. `pcbn` holds
    * the trained codebooks, `pcodes` the (vec_id, sub, code, d2)
    * encoding. Requires [[quantCte]] in scope. */
  private def pqCte = s"""subs AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS sub),
       sl AS (
         SELECT vec_id, sub, list_slice(v, sub*${EmbDim / PqM} + 1, sub*${EmbDim / PqM} + ${EmbDim / PqM}) AS sv
         FROM en, subs
       ),
       sn AS (
         SELECT vec_id, sub, sv,
                CAST(list_aggregate(list_transform(sv, x -> x*x), 'sum') AS BIGINT) AS n2
         FROM sl
       ),
       pc0 AS (SELECT sub, vec_id AS cell, sv AS cv, n2 AS cn2 FROM sn WHERE vec_id < $PqK),
       pd1 AS (
         SELECT sn.vec_id, sn.sub, c.cell,
                sn.n2 + c.cn2 - 2*${dotSql.format("sn.sv", "c.cv")} AS d2
         FROM sn JOIN pc0 c ON c.sub = sn.sub
       ),
       pa1 AS (
         SELECT vec_id, sub, cell FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cell ASC) AS rn
           FROM pd1) WHERE rn = 1
       ),
       pcomp AS (
         SELECT pa1.sub, pa1.cell, generate_subscripts(sn.sv, 1) AS i, unnest(sn.sv) AS x
         FROM sn JOIN pa1 ON pa1.vec_id = sn.vec_id AND pa1.sub = sn.sub
       ),
       psums AS (SELECT sub, cell, i, SUM(x) AS sx, COUNT(1) AS cnt FROM pcomp GROUP BY 1, 2, 3),
       pcb AS (
         SELECT sub, cell,
                list(CAST(trunc(CAST(sx AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS cv
         FROM psums GROUP BY 1, 2
       ),
       pcbn AS (
         SELECT sub, cell, cv,
                CAST(list_aggregate(list_transform(cv, x -> x*x), 'sum') AS BIGINT) AS cn2
         FROM pcb
       ),
       pd2 AS (
         SELECT sn.vec_id, sn.sub, c.cell,
                sn.n2 + c.cn2 - 2*${dotSql.format("sn.sv", "c.cv")} AS d2
         FROM sn JOIN pcbn c ON c.sub = sn.sub
       ),
       pcodes AS (
         SELECT vec_id, sub, cell AS code, d2 FROM (
           SELECT *, row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cell ASC) AS rn
           FROM pd2) WHERE rn = 1
       )"""

  /** Guarded cosine, mirroring [[graft.operators.Similarity.cosine]]:
    * NULL (not inf/NaN) when either squared norm is 0 — a zero
    * quantized embedding must hash-compare identically on both
    * engines. */
  private def cosSql(av: String, bv: String, an2: String, bn2: String) =
    s"""CASE WHEN $an2 > 0 AND $bn2 > 0
             THEN CAST(${dotSql.format(av, bv)} AS DOUBLE)
                    / (sqrt(CAST($an2 AS DOUBLE)) * sqrt(CAST($bn2 AS DOUBLE)))
        END"""

  val oracles: Map[String, String] = Map(
    "q30_exact_dedup" ->
      """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp,
                MIN(doc_id) AS keeper_doc_id, COUNT(1) AS n_docs
         FROM documents GROUP BY 1""",

    "q31_ngram_jaccard_pairs" ->
      s"""WITH $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          )
          SELECT da AS doc_a, db AS doc_b,
                 CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8""",

    "q32_minhash_signatures" ->
      s"""WITH $sigCte
          SELECT doc_id, CAST(k AS INT) AS k, minhash FROM sig""",

    "q33_minhash_lsh_pairs" ->
      s"""WITH $sigCte,
          bands AS (
            SELECT doc_id, k // 2 AS band,
                   SUM(CASE WHEN k % 2 = 0 THEN minhash * 2147483647 ELSE minhash END) AS band_key
            FROM sig GROUP BY doc_id, k // 2
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          ),
          eq AS (
            SELECT c.da, c.db, COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) AS neq
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
          )
          SELECT da AS doc_a, db AS doc_b, neq / 16.0 AS est_jaccard
          FROM eq WHERE neq / 16.0 >= 0.5""",

    "q34_simhash" ->
      s"""WITH $simhashCte
          SELECT doc_id, sh FROM shs""",

    "q35_simhash_pairs" ->
      s"""WITH $simhashCte,
          blocks AS (
            SELECT doc_id, sh, j, (sh >> (8*j)) & 255 AS bval
            FROM shs, (SELECT unnest(generate_series(0, 3)) AS j)
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sha, b.sh AS shb
            FROM blocks a JOIN blocks b
              ON a.j = b.j AND a.bval = b.bval AND a.doc_id < b.doc_id
          )
          SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming
          FROM cand WHERE bit_count(xor(sha, shb)) <= 6""",

    "q36_cosine_topk" ->
      s"""WITH $quantCte,
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          scored AS (
            SELECT q.qid, c.vec_id AS cid,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM en c, q WHERE c.vec_id <> q.qid
          ),
          r AS (SELECT qid, cid, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10""",

    "q37_ann_lsh" ->
      s"""WITH $quantCte,
          hp AS (
            SELECT h, i, ('0x' || substr(md5('hp_' || h || '_' || i), 1, 15))::BIGINT % 2001 - 1000 AS hv
            FROM (SELECT unnest(generate_series(0, 7)) AS h), (SELECT unnest(generate_series(1, 64)) AS i)
          ),
          comp AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e),
          dots AS (
            SELECT c.vec_id, hp.h, SUM(c.x * hp.hv) AS d
            FROM comp c JOIN hp ON hp.i = c.i GROUP BY 1, 2
          ),
          buckets AS (
            SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << h) ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY 1
          ),
          eb AS (SELECT en.vec_id, en.v, en.n2, b.bucket FROM en JOIN buckets b USING (vec_id)),
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2, bucket FROM eb WHERE vec_id IN (0,1,2,3,4)),
          scored AS (
            SELECT q.qid, c.vec_id AS cid, q.bucket,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM eb c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.qid
          ),
          r AS (SELECT qid, cid, bucket, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, bucket, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q88_ann_multiprobe" ->
      s"""WITH $quantCte,
          hp AS (
            SELECT h, i, ('0x' || substr(md5('hp_' || h || '_' || i), 1, 15))::BIGINT % 2001 - 1000 AS hv
            FROM (SELECT unnest(generate_series(0, 7)) AS h), (SELECT unnest(generate_series(1, 64)) AS i)
          ),
          comp AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e),
          dots AS (
            SELECT c.vec_id, hp.h, SUM(c.x * hp.hv) AS d
            FROM comp c JOIN hp ON hp.i = c.i GROUP BY 1, 2
          ),
          buckets AS (
            SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << h) ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY 1
          ),
          eb AS (SELECT en.vec_id, en.v, en.n2, b.bucket FROM en JOIN buckets b USING (vec_id)),
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2, bucket FROM eb WHERE vec_id IN (0,1,2,3,4)),
          pq AS (
            SELECT qid, qv, qn2,
                   xor(bucket, CASE WHEN j = 0 THEN 0 ELSE (1::BIGINT << (j-1)) END) AS bucket
            FROM q, (SELECT unnest(generate_series(0, 8)) AS j)
          ),
          scored AS (
            SELECT pq.qid, c.vec_id AS cid,
                   ${cosSql("pq.qv", "c.v", "pq.qn2", "c.n2")} AS cosine
            FROM eb c JOIN pq ON c.bucket = pq.bucket AND c.vec_id <> pq.qid
          ),
          r AS (SELECT qid, cid, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q43_embedding_neardup" ->
      s"""WITH $quantCte,
          hp AS (
            SELECT h, i, ('0x' || substr(md5('hp_' || h || '_' || i), 1, 15))::BIGINT % 2001 - 1000 AS hv
            FROM (SELECT unnest(generate_series(0, 7)) AS h), (SELECT unnest(generate_series(1, 64)) AS i)
          ),
          comp AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e),
          dots AS (
            SELECT c.vec_id, hp.h, SUM(c.x * hp.hv) AS d
            FROM comp c JOIN hp ON hp.i = c.i GROUP BY 1, 2
          ),
          buckets AS (
            SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (1::BIGINT << h) ELSE 0 END) AS BIGINT) AS bucket
            FROM dots GROUP BY 1
          ),
          eb AS (SELECT en.vec_id, en.v, en.n2, b.bucket FROM en JOIN buckets b USING (vec_id)),
          bands AS (
            SELECT vec_id, 0 AS band, bucket & 15 AS bval FROM eb
            UNION ALL
            SELECT vec_id, 1 AS band, (bucket >> 4) & 15 AS bval FROM eb
          ),
          cand AS (
            SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
          ),
          scored AS (
            SELECT c.va AS vec_a, c.vb AS vec_b,
                   ${cosSql("ea.v", "eb2.v", "ea.n2", "eb2.n2")} AS cosine
            FROM cand c JOIN en ea ON ea.vec_id = c.va JOIN en eb2 ON eb2.vec_id = c.vb
          )
          SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.35""",

    "q44_vocabulary" ->
      s"""WITH $wordsCte,
          tok AS (SELECT doc_id, unnest(ws) AS t FROM words)
          SELECT t, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(1) AS occurrences
          FROM tok GROUP BY t
          ORDER BY doc_freq DESC, occurrences DESC, t ASC LIMIT 50""",

    "q45_ann_ivf" ->
      s"""WITH $quantCte,
          cents AS (SELECT vec_id AS cell, v AS cv, n2 AS cn2 FROM en WHERE vec_id < 16),
          cc AS (
            SELECT en.vec_id, en.v, en.n2, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cents c
          ),
          assigned AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc) WHERE rn = 1
          ),
          probes AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc WHERE vec_id IN (0,1,2,3,4)) WHERE rn <= 2
          ),
          scored AS (
            SELECT p.qid, a.vec_id AS cid, p.cell,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid
          ),
          r AS (SELECT qid, cid, cell, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cell, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q53_dedup_clusters" ->
      s"""WITH RECURSIVE $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          pairs AS (
            SELECT da AS doc_a, db AS doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
          ),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
          ),
          reach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
          )
          SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id""",

    "q51_profile" ->
      """WITH a AS (
           SELECT COUNT(1) AS n,
             COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS nu1, COUNT(DISTINCT doc_id) AS d1,
               CAST(MIN(doc_id) AS DOUBLE) AS mn1, CAST(MAX(doc_id) AS DOUBLE) AS mx1,
             COUNT(CASE WHEN text IS NULL THEN 1 END) AS nu2, COUNT(DISTINCT text) AS d2,
               CAST(MIN(length(text)) AS DOUBLE) AS mn2, CAST(MAX(length(text)) AS DOUBLE) AS mx2,
             COUNT(CASE WHEN lang IS NULL THEN 1 END) AS nu3, COUNT(DISTINCT lang) AS d3,
               CAST(MIN(length(lang)) AS DOUBLE) AS mn3, CAST(MAX(length(lang)) AS DOUBLE) AS mx3,
             COUNT(CASE WHEN source IS NULL THEN 1 END) AS nu4, COUNT(DISTINCT source) AS d4,
               CAST(MIN(length(source)) AS DOUBLE) AS mn4, CAST(MAX(length(source)) AS DOUBLE) AS mx4,
             COUNT(CASE WHEN n_chars IS NULL THEN 1 END) AS nu5, COUNT(DISTINCT n_chars) AS d5,
               CAST(MIN(n_chars) AS DOUBLE) AS mn5, CAST(MAX(n_chars) AS DOUBLE) AS mx5
           FROM documents)
         SELECT 'doc_id' AS col_name, 'bigint' AS dtype, n AS n_rows, nu1 AS n_nulls, d1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM a
         UNION ALL SELECT 'text', 'string', n, nu2, d2, mn2, mx2 FROM a
         UNION ALL SELECT 'lang', 'string', n, nu3, d3, mn3, mx3 FROM a
         UNION ALL SELECT 'source', 'string', n, nu4, d4, mn4, mx4 FROM a
         UNION ALL SELECT 'n_chars', 'bigint', n, nu5, d5, mn5, mx5 FROM a""",

    "q52_split" ->
      """WITH h AS (
           SELECT n_chars,
                  ('0x' || substr(md5('split_' || doc_id), 1, 15))::BIGINT % 100 AS hv
           FROM documents)
         SELECT CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split,
                COUNT(1) AS n_docs,
                CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
         FROM h GROUP BY 1""",

    "q38_text_quality" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
                   CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) AS avg_word_len,
                   CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws) AS stopword_ratio,
                   CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS punct_count
            FROM words
          )
          SELECT doc_id, n_tokens, n_bpe_tokens, avg_word_len, stopword_ratio, punct_count,
                 least(1.0, n_tokens / 100.0) * 0.5
                   + least(1.0, stopword_ratio * 4) * 0.3
                   + CASE WHEN avg_word_len BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS quality_score
          FROM m""",

    "q39_langid" ->
      s"""WITH $wordsCte,
          s AS (
            SELECT lang,
                   len(list_filter(ws, x -> x IN ('the','a','of','and','in','to','is','that','it','for'))) AS sen,
                   len(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','zu','den'))) AS sde,
                   len(list_filter(ws, x -> x IN ('le','la','les','et','est','pas','pour','dans','une','que'))) AS sfr
            FROM words
          )
          SELECT lang,
                 CASE WHEN sen >= sde AND sen >= sfr THEN 'en'
                      WHEN sde >= sfr THEN 'de' ELSE 'fr' END AS predicted_lang,
                 COUNT(1) AS n_docs
          FROM s GROUP BY 1, 2""",

    // The image-decode oracles recompute the MANIFEST formula
    // (Multimodal.syntheticImages): width = 4 + id%13, height =
    // 3 + id%11, pixel(x,y) = (id*31 + x*7 + y*13) % 256 — Spark's
    // numbers come from actually decoding the PNG, so a hash match
    // proves the codec round trip, not a shared shortcut.
    "q40_multimodal_decode" ->
      """WITH dims AS (
           SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
                  CAST(3 + doc_id % 11 AS BIGINT) AS h
           FROM documents),
         px AS (
           SELECT doc_id, w, h, x, y, (doc_id*31 + x*7 + y*13) % 256 AS p
           FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w-1)) AS x),
           LATERAL (SELECT unnest(generate_series(0, h-1)) AS y)
         )
         SELECT doc_id, 'png' AS format, w AS width, h AS height,
                CAST(SUM(p * (y*w + x + 1)) AS BIGINT) AS pixel_sum
         FROM px GROUP BY 1, 2, 3, 4""",

    "q49_multimodal_resize" ->
      """WITH dims AS (
           SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
                  CAST(3 + doc_id % 11 AS BIGINT) AS h
           FROM documents),
         nd AS (
           SELECT doc_id, w, h,
                  CAST(CASE WHEN 8*h <= 6*w THEN 8 ELSE GREATEST(1, 6*w // h) END AS BIGINT) AS nw,
                  CAST(CASE WHEN 8*h <= 6*w THEN GREATEST(1, 8*h // w) ELSE 6 END AS BIGINT) AS nh
           FROM dims),
         px AS (
           SELECT doc_id, w, h, nw, nh, x, y,
                  (doc_id*31 + (x*w // nw)*7 + (y*h // nh)*13) % 256 AS p
           FROM nd,
           LATERAL (SELECT unnest(generate_series(0, nw-1)) AS x),
           LATERAL (SELECT unnest(generate_series(0, nh-1)) AS y)
         )
         SELECT doc_id, w AS width, h AS height, nw AS new_width, nh AS new_height,
                CAST(SUM(p * (y*nw + x + 1)) AS BIGINT) AS resized_sum
         FROM px GROUP BY 1, 2, 3, 4, 5""",

    "q41_frame_sample" ->
      """SELECT doc_id, frame_idx,
                ('0x' || substr(md5(doc_id || '_' || frame_idx), 1, 15))::BIGINT AS frame_hash
         FROM (
           SELECT doc_id,
                  unnest(generate_series(0, CAST(octet_length(encode(text)) AS BIGINT) // 256, 4)) AS frame_idx
           FROM documents)""",

    "q54_winnowing" ->
      s"""WITH $winnowCte
         SELECT doc_id, gram_pos, hs[gram_pos] AS fp
         FROM (SELECT doc_id, hs, unnest(ps) AS gram_pos FROM sel)""",

    "q57_winnow_overlap" ->
      s"""WITH $winnowCte,
          dfp AS (
            SELECT DISTINCT doc_id, hs[gram_pos] AS fp
            FROM (SELECT doc_id, hs, unnest(ps) AS gram_pos FROM sel)
          ),
          keep AS (
            SELECT fp FROM (SELECT fp, COUNT(1) AS df FROM dfp GROUP BY 1) WHERE df <= 64
          ),
          fps AS (SELECT dfp.doc_id, dfp.fp FROM dfp JOIN keep USING (fp)),
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM fps GROUP BY 1),
          shared AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(1) AS n_shared
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          )
          SELECT doc_a, doc_b, n_shared,
                 CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) AS overlap
          FROM shared
          JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
          WHERE CAST(n_shared AS DOUBLE) / least(sa.n, sb.n) >= 0.5""",

    "q58_decontamination" ->
      """WITH words AS (
           SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ws FROM documents
         ),
         gr AS (
           SELECT doc_id, source,
                  CASE WHEN len(ws) >= 5
                       THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                       ELSE []::VARCHAR[] END AS gs
           FROM words
         ),
         ex AS (SELECT doc_id, source, unnest(gs) AS s FROM gr),
         bg AS (SELECT DISTINCT s FROM ex WHERE source = 'src0')
         SELECT e.doc_id, COUNT(DISTINCT e.s) AS n_contaminated_grams
         FROM ex e JOIN bg ON e.s = bg.s
         WHERE e.source <> 'src0'
         GROUP BY 1""",

    "q55_repetition" ->
      s"""WITH $wordsCte,
          b AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_text_chars,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(len(ws) - len(list_distinct(ws)) AS BIGINT) AS n_dup_tokens,
                   CASE WHEN len(ws) >= 2
                        THEN list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1])
                        ELSE []::VARCHAR[] END AS bgs
            FROM words
          ),
          m AS (
            SELECT doc_id, n_text_chars, n_tokens, n_dup_tokens,
                   CAST(len(bgs) AS BIGINT) AS n_bigrams,
                   CAST(len(bgs) - len(list_distinct(bgs)) AS BIGINT) AS n_dup_bigrams,
                   bgs
            FROM b
          ),
          cnts AS (
            SELECT doc_id, bg, COUNT(1) AS cnt
            FROM (SELECT doc_id, unnest(bgs) AS bg FROM m) GROUP BY 1, 2
          ),
          top AS (
            SELECT doc_id, bg AS top_bigram, cnt AS top_bigram_cnt
            FROM (SELECT doc_id, bg, cnt,
                         row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg ASC) AS rn
                  FROM cnts)
            WHERE rn = 1
          )
          SELECT m.doc_id, n_tokens,
                 CAST(n_dup_tokens AS DOUBLE) / n_tokens AS dup_token_frac,
                 CASE WHEN n_bigrams > 0 THEN CAST(n_dup_bigrams AS DOUBLE) / n_bigrams END AS dup_bigram_frac,
                 top_bigram,
                 CAST(top_bigram_cnt AS BIGINT) AS top_bigram_cnt,
                 CAST(top_bigram_cnt * length(top_bigram) AS DOUBLE) / n_text_chars AS top_bigram_char_frac
          FROM m LEFT JOIN top ON m.doc_id = top.doc_id""",

    "q56_stratified_sample" ->
      """WITH h AS (
           SELECT lang, n_chars,
                  ('0x' || substr(md5('strat_' || doc_id), 1, 15))::BIGINT % 10000 AS hv
           FROM documents)
         SELECT lang, COUNT(1) AS n_docs,
                CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
         FROM h
         WHERE hv < CASE lang WHEN 'de' THEN 10000 WHEN 'en' THEN 5000 WHEN 'es' THEN 1000
                              WHEN 'fr' THEN 2500 WHEN 'zh' THEN 7500 ELSE 0 END
         GROUP BY 1""",

    "q59_lang_ngrams" ->
      s"""WITH $wordsCte,
          bg AS (
            SELECT lang,
                   unnest(CASE WHEN len(ws) >= 2
                               THEN list_transform(generate_series(1, len(ws)-1),
                                      i -> ws[i] || ' ' || ws[i+1])
                               ELSE []::VARCHAR[] END) AS gram
            FROM words
          ),
          c AS (SELECT lang, gram, COUNT(1) AS cnt FROM bg GROUP BY 1, 2),
          r AS (SELECT lang, gram, cnt,
                       row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram ASC) AS rk
                FROM c)
          SELECT lang, gram, cnt, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q60_seq_packing" ->
      """WITH w AS (
           SELECT doc_id,
                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
           FROM documents
         ),
         c AS (
           SELECT doc_id, n,
                  CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
           FROM w
         )
         SELECT doc_id, n AS n_tokens, s AS start_offset,
                s // 512 AS bin_id,
                greatest(1, (s + n - 1) // 512 - s // 512 + 1) AS n_bins
         FROM c""",

    "q61_kmeans" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          )
          SELECT vec_id, cell AS cluster_id, ccos AS cosine FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
            FROM cc2) WHERE rn = 1""",

    "q63_ann_ivf_trained" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, en.v, en.n2, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          assigned AS (
            SELECT vec_id, v, n2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          probes AS (
            SELECT vec_id AS qid, v AS qv, n2 AS qn2, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2 WHERE vec_id IN (0,1,2,3,4)) WHERE rn <= 2
          ),
          scored AS (
            SELECT p.qid, a.vec_id AS cid, p.cell,
                   ${cosSql("p.qv", "a.v", "p.qn2", "a.n2")} AS cosine
            FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.qid
          ),
          r AS (SELECT qid, cid, cell, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, cell, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5""",

    "q64_dedup_verdicts" ->
      s"""WITH RECURSIVE $verdictCtes
          SELECT doc_id,
                 COALESCE(cluster_min, exact_keeper) AS survivor_doc_id,
                 CASE WHEN doc_id = COALESCE(cluster_min, exact_keeper) THEN 'keep'
                      WHEN doc_id <> exact_keeper THEN 'drop_exact'
                      ELSE 'drop_near' END AS verdict
          FROM j""",

    "q62_pii_scrub" ->
      """WITH aug AS (
           SELECT doc_id,
                  text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            ELSE '' END
                    || CASE WHEN doc_id % 5 = 0
                            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25'
                            ELSE '' END AS t
           FROM documents
         ),
         r AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
                  CAST(len(regexp_extract_all(t, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
                  regexp_replace(regexp_replace(regexp_replace(t,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS red
           FROM aug
         )
         SELECT doc_id, n_emails, n_ips, n_phones,
                CAST(length(red) AS BIGINT) AS redacted_len,
                md5(red) AS redacted_hash
         FROM r""",

    "q72_tfidf" ->
      s"""WITH $wordsCte,
          tok AS (SELECT doc_id, unnest(ws) AS token FROM words),
          tf AS (SELECT doc_id, token, COUNT(1) AS tf FROM tok GROUP BY 1, 2),
          dfr AS (SELECT token, COUNT(1) AS df FROM tf GROUP BY 1),
          n AS (SELECT COUNT(1) AS n_docs FROM documents),
          s AS (
            SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
                   CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (dfr.df + 1) AS score
            FROM tf JOIN dfr USING (token), n
          )
          SELECT doc_id, token, tf, df, score, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
            FROM s) WHERE rk <= 3""",

    // Literals appear as the SAME expressions the Scala side computes,
    // and every NON-DYADIC literal (1.2) is cast to DOUBLE explicitly:
    // DuckDB parses bare 1.2 as a DECIMAL and would evaluate
    // tf*(1.2+1) in exact decimal arithmetic — one ulp off Scala's
    // double 1.2+1 (measured). Dyadic literals (0.5/0.75/1.0) are
    // exact in either type.
    "q73_bm25" ->
      s"""WITH $wordsCte,
          tok AS (SELECT doc_id, unnest(ws) AS token FROM words),
          dl AS (SELECT doc_id, COUNT(1) AS dl FROM tok GROUP BY 1),
          st AS (SELECT COUNT(1) AS n_docs, SUM(dl) AS sum_dl FROM dl),
          tf AS (
            SELECT doc_id, token, COUNT(1) AS tf FROM tok
            WHERE token IN ('spark', 'join', 'window', 'hash', 'filter') GROUP BY 1, 2
          ),
          dfr AS (SELECT token, COUNT(1) AS df FROM tf GROUP BY 1),
          sc AS (
            SELECT tf.doc_id, tf.token,
                   ((st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
                     * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
                     / (tf.tf + CAST(1.2 AS DOUBLE) * (1.0 - 0.75 + 0.75 * dl.dl
                          / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))) AS score_t
            FROM tf JOIN dfr USING (token) JOIN dl USING (doc_id), st
          ),
          g AS (
            SELECT doc_id,
                   SUM(CASE WHEN token = 'spark' THEN score_t END) AS s0,
                   SUM(CASE WHEN token = 'join' THEN score_t END) AS s1,
                   SUM(CASE WHEN token = 'window' THEN score_t END) AS s2,
                   SUM(CASE WHEN token = 'hash' THEN score_t END) AS s3,
                   SUM(CASE WHEN token = 'filter' THEN score_t END) AS s4
            FROM sc GROUP BY doc_id
          )
          SELECT doc_id,
                 COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0)
                   + COALESCE(s3, 0.0) + COALESCE(s4, 0.0) AS score
          FROM g ORDER BY score DESC, doc_id LIMIT 20""",

    "q74_temperature_sample" ->
      """WITH c AS (SELECT source, COUNT(1) AS n FROM documents GROUP BY source),
         m AS (SELECT MIN(n) AS nmin FROM c),
         r AS (
           SELECT source,
                  GREATEST(1, CAST(round(sqrt(CAST(nmin AS DOUBLE) / n) * 10000) AS BIGINT)) AS bps
           FROM c, m
         ),
         k AS (
           SELECT d.source, r.bps FROM documents d JOIN r USING (source)
           WHERE ('0x' || substr(md5('temp_' || doc_id), 1, 15))::BIGINT % 10000 < r.bps
         )
         SELECT source, COUNT(1) AS n_kept, MIN(bps) AS rate_bps FROM k GROUP BY source""",

    "q75_centroid_outliers" ->
      s"""WITH $quantCte,
          el AS (
            SELECT en.vec_id, en.v, en.n2, emb.label
            FROM en JOIN embeddings emb USING (vec_id)
          ),
          comp AS (SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM el),
          sums AS (SELECT label, i, SUM(x) AS sx, COUNT(1) AS cnt FROM comp GROUP BY 1, 2),
          cent AS (
            SELECT label, list(CAST(trunc(CAST(sx AS DOUBLE) / cnt) AS BIGINT) ORDER BY i) AS cv
            FROM sums GROUP BY label
          ),
          cn AS (
            SELECT label, cv,
                   CAST(list_aggregate(list_transform(cv, x -> x*x), 'sum') AS BIGINT) AS cn2
            FROM cent
          ),
          sc AS (
            SELECT el.label, el.vec_id,
                   ${cosSql("el.v", "cn.cv", "el.n2", "cn.cn2")} AS centroid_cos
            FROM el JOIN cn USING (label)
          )
          SELECT label, vec_id, centroid_cos, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY label ORDER BY centroid_cos ASC, vec_id ASC) AS rk
            FROM sc) WHERE rk <= 3""",

    "q93_quality_verdicts" ->
      s"""WITH $wordsCte,
          m AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   least(1.0, len(ws) / 100.0) * 0.5
                     + least(1.0, (CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws)) * 4) * 0.3
                     + CASE WHEN CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS quality_score,
                   CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dup_token_frac
            FROM words
          )
          SELECT doc_id, n_tokens, quality_score, dup_token_frac,
                 n_tokens >= 30 AS pass_len,
                 quality_score >= 0.5 AS pass_quality,
                 dup_token_frac <= 0.6 AS pass_repetition,
                 CASE WHEN n_tokens >= 30 AND quality_score >= 0.5 AND dup_token_frac <= 0.6
                      THEN 'keep' ELSE 'drop' END AS verdict
          FROM m""",

    "q94_source_cap" ->
      """WITH r AS (
           SELECT doc_id, source AS "group",
                  row_number() OVER (
                    PARTITION BY source
                    ORDER BY md5('cap_' || doc_id), doc_id) AS rk
           FROM documents)
         SELECT doc_id, "group", CAST(rk AS INT) AS rk FROM r WHERE rk <= 10""",

    // Mirror of q33's band machinery with the parity split: odd-id
    // docs (the "new batch") probe even-id docs (the "index").
    "q95_incremental_neardup" ->
      s"""WITH $sigCte,
          bands AS (
            SELECT doc_id, k // 2 AS band,
                   SUM(CASE WHEN k % 2 = 0 THEN minhash * 2147483647 ELSE minhash END) AS band_key
            FROM sig GROUP BY doc_id, k // 2
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS dn, b.doc_id AS di
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          ),
          eq AS (
            SELECT c.dn, c.di, COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) AS neq
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.dn
            JOIN sig sb ON sb.doc_id = c.di AND sb.k = sa.k
            GROUP BY 1, 2
          )
          SELECT dn AS doc_id, di AS index_doc_id, neq / 16.0 AS est_jaccard
          FROM eq WHERE neq / 16.0 >= 0.5""",

    // q53's recursive-CTE clustering + q38's score expression, then
    // the same (quality DESC, doc_id ASC) argmax the struct-max
    // computes Spark-side.
    "q105_canonical_keepers" ->
      s"""WITH RECURSIVE $cappedShinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM shj GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          pairs AS (
            SELECT da AS doc_a, db AS doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
          ),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
          ),
          reach AS (
            SELECT DISTINCT src AS doc_id, src AS r FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.doc_id = e.dst
          ),
          clus AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
          q AS (
            SELECT doc_id,
                   least(1.0, len(ws) / 100.0) * 0.5
                     + least(1.0, (CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','in','to','is','that','it','for'))) AS DOUBLE) / len(ws)) * 4) * 0.3
                     + CASE WHEN CAST(list_aggregate(list_transform(ws, w -> length(w)), 'sum') AS DOUBLE) / len(ws) BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END AS qs
            FROM words
          ),
          g AS (
            SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_id, q.qs
            FROM documents d
            LEFT JOIN clus c ON c.doc_id = d.doc_id
            JOIN q ON q.doc_id = d.doc_id
          ),
          k AS (
            SELECT group_id, doc_id AS keeper_doc_id FROM (
              SELECT group_id, doc_id,
                     row_number() OVER (PARTITION BY group_id ORDER BY qs DESC, doc_id ASC) AS rn
              FROM g) WHERE rn = 1
          )
          SELECT g.doc_id, g.group_id, k.keeper_doc_id,
                 g.doc_id = k.keeper_doc_id AS is_keeper
          FROM g JOIN k ON k.group_id = g.group_id""",

    // Relational mirror of the segment pipeline: exclusive running sum
    // of break flags = segment index, string_agg in position order =
    // segment text, HAVING df > cap = the banned set.
    "q106_paragraph_dedup" ->
      s"""WITH $wordsCte,
          wf AS (SELECT doc_id, list_filter(ws, w -> w <> '') AS ws FROM words),
          tok AS (
            SELECT doc_id, i AS pos, ws[i] AS w,
                   CASE WHEN ('0x' || substr(md5(ws[i]), 1, 8))::BIGINT
                             % $ParagraphBreakDivisor = 0 THEN 1 ELSE 0 END AS brk
            FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
                  FROM wf WHERE len(ws) >= 1)
          ),
          sidx AS (
            SELECT doc_id, pos, w,
                   COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg
            FROM tok
          ),
          segs AS (
            SELECT doc_id, seg, MIN(pos) AS seg_start,
                   string_agg(w, ' ' ORDER BY pos) AS stext
            FROM sidx GROUP BY 1, 2
          ),
          hs AS (
            SELECT doc_id, seg_start, stext,
                   ('0x' || substr(md5(stext), 1, 15))::BIGINT AS h
            FROM segs
          ),
          banned AS (SELECT h FROM hs GROUP BY h HAVING COUNT(DISTINCT doc_id) > $ParagraphMaxDf),
          fl AS (SELECT doc_id, seg_start, stext, h IN (SELECT h FROM banned) AS b FROM hs)
          SELECT doc_id, COUNT(1) AS n_segments,
                 CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                 COALESCE(string_agg(CASE WHEN NOT b THEN stext END, ' ' ORDER BY seg_start), '') AS clean_text
          FROM fl GROUP BY doc_id""",

    // The bloom gate is exact by construction (no false negatives),
    // so the oracle is the plain fingerprint membership join.
    "q104_bloom_dedup_gate" ->
      """WITH hist AS (
           SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
           FROM documents WHERE doc_id % 2 = 0
         ),
         nb AS (
           SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
           FROM documents WHERE doc_id % 2 = 1
         )
         SELECT nb.doc_id, (hist.fp IS NOT NULL) AS is_dup_exact
         FROM nb LEFT JOIN hist ON nb.fp = hist.fp""",

    // Mirror of dupSpans: word 6-gram 60-bit hashes → rightmost-min
    // winnow selection (the q54 sel formula at w=8) → cross-doc
    // df ≥ 2 → per-doc span merge.
    "q89_dup_spans" ->
      s"""WITH $wordsCte,
         g AS (
           SELECT doc_id,
                  CASE WHEN len(ws) >= 6
                       THEN list_transform(generate_series(1, len(ws)-5),
                              i -> ('0x' || substr(md5(ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||
                                                       ws[i+3]||' '||ws[i+4]||' '||ws[i+5]), 1, 15))::BIGINT)
                       ELSE []::BIGINT[] END AS hs
           FROM words
         ),
         sel AS (
           SELECT doc_id, hs,
                  CASE WHEN len(hs) >= 1 THEN
                       list_distinct(list_transform(generate_series(1, greatest(len(hs)-7, 1)),
                         j -> CAST(j + len(hs[j:j+7])
                                   - list_position(list_reverse(hs[j:j+7]),
                                                   list_aggregate(hs[j:j+7], 'min')) AS INT)))
                  ELSE []::INT[] END AS ps
           FROM g
         ),
         occ AS (
           SELECT doc_id, p, hs[p] AS h
           FROM (SELECT doc_id, hs, unnest(ps) AS p FROM sel)
         ),
         duph AS (SELECT h FROM occ GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         d AS (SELECT o.doc_id, o.p FROM occ o JOIN duph USING (h)),
         l AS (SELECT doc_id, p, lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS pp FROM d),
         b AS (SELECT doc_id, p, CASE WHEN pp IS NULL OR p - pp > 8 THEN 1 ELSE 0 END AS brk FROM l),
         sid AS (
           SELECT doc_id, p,
                  SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_idx
           FROM b
         )
         SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
                CAST(MIN(p) AS BIGINT) AS span_start_word,
                CAST(MAX(p) + 5 AS BIGINT) AS span_end_word, COUNT(1) AS n_anchors
         FROM sid GROUP BY 1, 2""",

    "q85_prep_pipeline" ->
      s"""WITH RECURSIVE $verdictCtes,
          keep AS (
            SELECT doc_id FROM j WHERE doc_id = COALESCE(cluster_min, exact_keeper)
          ),
          nb AS (
            SELECT d.doc_id, d.text, d.source, d.n_chars
            FROM documents d JOIN keep USING (doc_id)
            WHERE d.source <> 'src0'
          ),
          grn AS (
            SELECT doc_id, source, n_chars, string_split_regex(trim(text), '\\s+') AS ws FROM nb
          ),
          gr5 AS (
            SELECT doc_id,
                   CASE WHEN len(ws) >= 5
                        THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                               i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                        ELSE []::VARCHAR[] END AS gs
            FROM grn
          ),
          exg AS (SELECT doc_id, unnest(gs) AS s FROM gr5),
          bw AS (
            SELECT string_split_regex(trim(text), '\\s+') AS ws FROM documents WHERE source = 'src0'
          ),
          bgr AS (
            SELECT DISTINCT unnest(
              CASE WHEN len(ws) >= 5
                   THEN list_distinct(list_transform(generate_series(1, len(ws)-4),
                          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))
                   ELSE []::VARCHAR[] END) AS s
            FROM bw
          ),
          contam AS (SELECT DISTINCT e.doc_id FROM exg e JOIN bgr ON e.s = bgr.s),
          k2 AS (
            SELECT nb.* FROM nb WHERE NOT EXISTS (SELECT 1 FROM contam c WHERE c.doc_id = nb.doc_id)
          ),
          cnts AS (SELECT source, COUNT(1) AS n FROM k2 GROUP BY source),
          mn AS (SELECT MIN(n) AS nmin FROM cnts),
          rates AS (
            SELECT source,
                   GREATEST(1, CAST(round(sqrt(CAST(nmin AS DOUBLE) / n) * 10000) AS BIGINT)) AS bps
            FROM cnts, mn
          ),
          k3 AS (
            SELECT k2.source, k2.n_chars FROM k2 JOIN rates USING (source)
            WHERE ('0x' || substr(md5('prep_' || doc_id), 1, 15))::BIGINT % 10000 < rates.bps
          )
          SELECT source, COUNT(1) AS n_docs,
                 CAST(SUM(CAST(n_chars AS DECIMAL(28,4))) AS DOUBLE) AS sum_chars
          FROM k3 GROUP BY source""",

    "q84_lsh_rescored" ->
      s"""WITH $sigCte,
          bands AS (
            SELECT doc_id, k // 2 AS band,
                   SUM(CASE WHEN k % 2 = 0 THEN minhash * 2147483647 ELSE minhash END) AS band_key
            FROM sig GROUP BY doc_id, k // 2
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          ),
          est AS (
            SELECT c.da, c.db
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
            HAVING COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) / 16.0 >= 0.5
          ),
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          inter AS (
            SELECT e.da, e.db, COUNT(1) AS i
            FROM est e
            JOIN sh a ON a.doc_id = e.da
            JOIN sh b ON b.doc_id = e.db AND b.s = a.s
            GROUP BY 1, 2
          )
          SELECT i2.da AS doc_a, i2.db AS doc_b,
                 CAST(i2.i AS DOUBLE) / (sa.n + sb.n - i2.i) AS jaccard
          FROM inter i2
          JOIN sizes sa ON sa.doc_id = i2.da
          JOIN sizes sb ON sb.doc_id = i2.db
          WHERE CAST(i2.i AS DOUBLE) / (sa.n + sb.n - i2.i) >= 0.8""",

    "q76_lm_score" ->
      s"""WITH $wordsCte,
          t AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM words),
          bg0 AS (
            SELECT doc_id, w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
            FROM t
          ),
          bg AS (SELECT doc_id, w1, w2 FROM bg0 WHERE w2 IS NOT NULL),
          cb AS (SELECT w1, w2, COUNT(1) AS c2 FROM bg GROUP BY 1, 2),
          cu AS (SELECT w1, SUM(c2) AS c1 FROM cb GROUP BY 1),
          pr AS (SELECT w1, w2, (c2 * 1000000) // c1 AS p_ppm FROM cb JOIN cu USING (w1))
          SELECT bg.doc_id, COUNT(1) AS n_bigrams,
                 CAST(SUM(p.p_ppm) AS DOUBLE) / COUNT(1) AS avg_p_ppm,
                 CAST(MIN(p.p_ppm) AS BIGINT) AS min_p_ppm
          FROM bg JOIN pr p USING (w1, w2)
          GROUP BY bg.doc_id""",

    // SemDeDup over the trained codebook: assignment = q61's argmax,
    // then within-cell pairwise cosine ≥ 0.4 against lower ids.
    "q96_semdedup" ->
      s"""WITH $quantCte,
          $kmeansCte,
          cc2 AS (
            SELECT en.vec_id, c.cell,
                   ${cosSql("en.v", "c.cv", "en.n2", "c.cn2")} AS ccos
            FROM en, cn c
          ),
          asg AS (
            SELECT vec_id, cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell ASC) AS rn
              FROM cc2) WHERE rn = 1
          ),
          m AS (SELECT en.vec_id, en.v, en.n2, asg.cell FROM en JOIN asg USING (vec_id)),
          sc AS (
            SELECT a.vec_id AS vec_id, b.vec_id AS bid,
                   ${cosSql("a.v", "b.v", "a.n2", "b.n2")} AS cos
            FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id > b.vec_id
          ),
          p AS (
            SELECT vec_id, MIN(bid) AS survivor_id, MAX(cos) AS max_cos
            FROM sc WHERE cos >= 0.4 GROUP BY 1
          )
          SELECT m.vec_id, m.cell AS cluster_id,
                 CASE WHEN p.vec_id IS NULL THEN 'keep' ELSE 'drop_semantic' END AS verdict,
                 p.survivor_id, p.max_cos
          FROM m LEFT JOIN p ON p.vec_id = m.vec_id""",

    // DSIR weights: hashed-bigram cells (md5-60bit % 256, the
    // portable-hash convention), Laplace-smoothed ppm distributions,
    // floor-division score ratio — integer-exact on both engines.
    "q97_dsir_weights" ->
      """WITH w AS (
           SELECT doc_id, source = 'src1' AS is_target,
                  string_split_regex(trim(text), '\s+') AS ws
           FROM documents
         ),
         f AS (
           SELECT doc_id, is_target,
                  unnest(list_transform(generate_series(2, len(ws)),
                                        i -> ws[i-1] || '_' || ws[i])) AS f
           FROM w WHERE len(ws) >= 2
         ),
         occ AS (
           SELECT doc_id, is_target,
                  ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS b
           FROM f
         ),
         ct AS (SELECT b, COUNT(1) AS c FROM occ WHERE is_target GROUP BY 1),
         cr AS (SELECT b, COUNT(1) AS c FROM occ GROUP BY 1),
         tt AS (SELECT COALESCE(SUM(c), 0) AS v FROM ct),
         tr AS (SELECT COALESCE(SUM(c), 0) AS v FROM cr),
         dict AS (
           SELECT cr.b,
                  ((COALESCE(ct.c, 0) + 1) * 1000000) // (tt.v + 256) AS pt_ppm,
                  ((cr.c + 1) * 1000000) // (tr.v + 256) AS pr_ppm
           FROM cr LEFT JOIN ct USING (b), tt, tr
         )
         SELECT o.doc_id, o.is_target, COUNT(1) AS n_feats,
                CAST(SUM(d.pt_ppm) AS BIGINT) AS sum_target_ppm,
                CAST(SUM(d.pr_ppm) AS BIGINT) AS sum_raw_ppm,
                CAST((SUM(d.pt_ppm) * 1000000)
                     // GREATEST(SUM(d.pr_ppm), 1) AS BIGINT) AS dsir_ppm
         FROM occ o JOIN dict d USING (b)
         GROUP BY 1, 2""",

    // Per-source drift: integer-ppm unigram distributions, L1 over the
    // vocab × sources grid, rank-1 most-divergent token per source.
    "q98_source_drift" ->
      """WITH tok AS (
           SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS t
           FROM documents
         ),
         cgt AS (SELECT source, t, COUNT(1) AS c_gt FROM tok GROUP BY 1, 2),
         totg AS (SELECT source, CAST(SUM(c_gt) AS BIGINT) AS n_tokens
                  FROM cgt GROUP BY 1),
         ct AS (SELECT t, SUM(c_gt) AS c_t FROM cgt GROUP BY 1),
         tot AS (SELECT SUM(c_t) AS v FROM ct),
         grid AS (
           SELECT g.source, ct.t, c.c_gt,
                  (COALESCE(c.c_gt, 0) * 1000000) // g.n_tokens AS pg,
                  (ct.c_t * 1000000) // tot.v AS pc
           FROM totg g CROSS JOIN ct CROSS JOIN tot
           LEFT JOIN cgt c ON c.source = g.source AND c.t = ct.t
         ),
         stats AS (
           SELECT source, COUNT(c_gt) AS n_distinct_tokens,
                  CAST(SUM(ABS(pg - pc)) AS BIGINT) AS l1_ppm
           FROM grid GROUP BY 1
         ),
         top AS (
           SELECT source, t AS top_token,
                  CAST(ABS(pg - pc) AS BIGINT) AS top_gap_ppm,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY ABS(pg - pc) DESC, t ASC) AS rn
           FROM grid
         )
         SELECT g.source, g.n_tokens, s.n_distinct_tokens, s.l1_ppm,
                top.top_token, top.top_gap_ppm
         FROM totg g
         JOIN stats s USING (source)
         JOIN top ON top.source = g.source AND top.rn = 1""",

    // Prefix-filter join is EXACT: the oracle is the plain uncapped
    // posting-list Jaccard — same output, different (scale-safe) plan.
    "q99_prefix_jaccard" ->
      s"""WITH $shinglesCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          )
          SELECT da AS doc_a, db AS doc_b,
                 CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
          WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8""",

    "q101_pq_codes" ->
      s"""WITH $quantCte,
          $pqCte
          SELECT vec_id, CAST(sub AS INT) AS sub, code, d2 FROM pcodes""",

    "q102_pq_topk" ->
      s"""WITH $quantCte,
          $pqCte,
          dt AS (
            SELECT vec_id AS qid, sub, cell AS code, d2 AS qd2
            FROM pd2 WHERE vec_id IN (0, 1, 2, 3, 4)
          ),
          sc AS (
            SELECT dt.qid, p.vec_id AS cid, CAST(SUM(dt.qd2) AS BIGINT) AS adc_dist2
            FROM pcodes p JOIN dt ON dt.sub = p.sub AND dt.code = p.code
            WHERE p.vec_id <> dt.qid
            GROUP BY 1, 2
          ),
          r AS (
            SELECT qid, cid, adc_dist2,
                   row_number() OVER (PARTITION BY qid ORDER BY adc_dist2 ASC, cid ASC) AS rk
            FROM sc
          )
          SELECT qid, cid, adc_dist2, rk FROM r WHERE rk <= 5""",

    "q107_chunking" ->
      """WITH w AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
         ),
         st AS (
           SELECT doc_id, ws,
                  unnest(generate_series(0, greatest(len(ws) - 1, 0), 48)) AS start
           FROM w
         ),
         ch AS (
           SELECT doc_id, start // 48 AS chunk_idx,
                  ws[start + 1 : start + 64] AS chunk
           FROM st
         )
         SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
                array_to_string(chunk, ' ') AS chunk_text,
                md5(array_to_string(chunk, ' ')) AS chunk_md5
         FROM ch""",

    "q108_global_shuffle" ->
      """WITH k AS (
           SELECT doc_id,
                  ('0x' || substr(md5('shuf_' || doc_id), 1, 15))::BIGINT AS shuffle_key
           FROM documents
         )
         SELECT doc_id, shuffle_key, shuffle_key % 8 AS shard,
                CAST(row_number() OVER (PARTITION BY shuffle_key % 8
                                        ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos
         FROM k""",

    "q109_length_quantiles" ->
      """WITH h AS (
           SELECT source AS "group", n_chars AS len, CAST(COUNT(1) AS BIGINT) AS cnt
           FROM documents GROUP BY 1, 2
         ),
         c AS (
           SELECT "group", len, cnt,
                  CAST(SUM(cnt) OVER (PARTITION BY "group" ORDER BY len) AS BIGINT) AS cum,
                  CAST(SUM(cnt) OVER (PARTITION BY "group") AS BIGINT) AS tot
           FROM h
         )
         SELECT "group", MAX(tot) AS n, MIN(len) AS min_len,
                MIN(CASE WHEN cum >= (tot * 25 + 99) // 100 THEN len END) AS p25,
                MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN len END) AS p50,
                MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN len END) AS p90,
                MIN(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN len END) AS p99,
                MAX(len) AS max_len
         FROM c GROUP BY 1""",

    "q110_mixture_plan" ->
      """WITH c AS (
           SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs,
                  CAST(round(sqrt(CAST(COUNT(1) AS DOUBLE)) * 1000000) AS BIGINT) AS sq
           FROM documents GROUP BY 1
         ),
         t AS (
           SELECT CAST(SUM(n_docs) AS BIGINT) AS tot, CAST(SUM(sq) AS BIGINT) AS sqtot FROM c
         ),
         p AS (
           SELECT source, n_docs,
                  (n_docs * 1000000) // tot AS natural_ppm,
                  (sq * 1000000) // sqtot AS target_ppm
           FROM c, t
         ),
         r AS (
           SELECT *, least(8000, greatest(1000, (target_ppm * 1000) // greatest(natural_ppm, 1)))
                       AS repeat_x1000
           FROM p
         )
         SELECT source, n_docs, natural_ppm, target_ppm, repeat_x1000,
                (n_docs * repeat_x1000) // 1000 AS effective_docs
         FROM r""",

    "q111_semantic_decontamination" ->
      s"""WITH e AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT)) AS v
            FROM embeddings
          ),
          en AS (
            SELECT vec_id, label, v,
                   CAST(list_aggregate(list_transform(v, x -> x*x), 'sum') AS BIGINT) AS n2
            FROM e
          ),
          b AS (SELECT v AS bv, n2 AS bn2 FROM en WHERE label = 0),
          c AS (SELECT vec_id, label, v, n2 FROM en WHERE label <> 0),
          s AS (
            SELECT c.vec_id, c.label,
                   MAX(${cosSql("c.v", "b.bv", "c.n2", "b.bn2")}) AS max_benchmark_cos
            FROM c, b GROUP BY 1, 2
          )
          SELECT vec_id, label, max_benchmark_cos,
                 max_benchmark_cos >= CAST(0.35 AS DOUBLE) AS contaminated
          FROM s""",

    // Truth side = q99's oracle (uncapped posting-list Jaccard);
    // candidate side = q84's oracle (band join → estimate gate →
    // exact rescore); the audit is the full-outer count rollup.
    "q112_lsh_recall_audit" ->
      s"""WITH $sigCte,
          sizes AS (SELECT doc_id, COUNT(1) AS n FROM sh GROUP BY 1),
          tinter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, COUNT(1) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ),
          truth AS (
            SELECT da, db FROM tinter
            JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
            WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
          ),
          bands AS (
            SELECT doc_id, k // 2 AS band,
                   SUM(CASE WHEN k % 2 = 0 THEN minhash * 2147483647 ELSE minhash END) AS band_key
            FROM sig GROUP BY doc_id, k // 2
          ),
          cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          ),
          est AS (
            SELECT c.da, c.db
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.da
            JOIN sig sb ON sb.doc_id = c.db AND sb.k = sa.k
            GROUP BY 1, 2
            HAVING COUNT(CASE WHEN sa.minhash = sb.minhash THEN 1 END) / 16.0 >= 0.5
          ),
          linter AS (
            SELECT e.da, e.db, COUNT(1) AS i
            FROM est e
            JOIN sh a ON a.doc_id = e.da
            JOIN sh b ON b.doc_id = e.db AND b.s = a.s
            GROUP BY 1, 2
          ),
          lsh AS (
            SELECT l.da, l.db FROM linter l
            JOIN sizes sa ON sa.doc_id = l.da JOIN sizes sb ON sb.doc_id = l.db
            WHERE CAST(l.i AS DOUBLE) / (sa.n + sb.n - l.i) >= 0.8
          ),
          j AS (
            SELECT CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS tp,
                   CAST(COUNT(CASE WHEN t.da IS NOT NULL AND l.da IS NULL THEN 1 END) AS BIGINT) AS fn,
                   CAST(COUNT(CASE WHEN t.da IS NULL AND l.da IS NOT NULL THEN 1 END) AS BIGINT) AS fp
            FROM truth t FULL OUTER JOIN lsh l ON t.da = l.da AND t.db = l.db
          )
          SELECT tp + fn AS n_truth, tp + fp AS n_candidate, tp, fn, fp,
                 (tp * 1000000) // greatest(tp + fn, 1) AS recall_ppm,
                 (tp * 1000000) // greatest(tp + fp, 1) AS precision_ppm
          FROM j""",

    "q113_vocab_coverage" ->
      """WITH toks AS (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS t FROM documents
         ),
         counts AS (SELECT t, CAST(COUNT(1) AS BIGINT) AS occ FROM toks GROUP BY 1),
         ranked AS (
           SELECT occ, row_number() OVER (ORDER BY occ DESC, t ASC) AS rnk FROM counts
         ),
         tot AS (
           SELECT CAST(COUNT(1) AS BIGINT) AS vocab_size,
                  CAST(SUM(occ) AS BIGINT) AS total_occurrences
           FROM counts
         ),
         cov AS (
           SELECT ks.k,
                  CAST(coalesce(SUM(CASE WHEN rnk <= ks.k THEN occ END), 0) AS BIGINT) AS covered_occurrences
           FROM ranked CROSS JOIN (VALUES (10), (100), (1000)) ks(k)
           GROUP BY 1
         )
         SELECT CAST(k AS INT) AS k, vocab_size, total_occurrences, covered_occurrences,
                (covered_occurrences * 1000000) // greatest(total_occurrences, 1) AS coverage_ppm
         FROM cov, tot""",

    "q114_perplexity_buckets" ->
      s"""WITH $wordsCte,
          t AS (SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w FROM words),
          bg0 AS (
            SELECT doc_id, w AS w1,
                   lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
            FROM t
          ),
          bg AS (SELECT doc_id, w1, w2 FROM bg0 WHERE w2 IS NOT NULL),
          cb AS (SELECT w1, w2, COUNT(1) AS c2 FROM bg GROUP BY 1, 2),
          cu AS (SELECT w1, SUM(c2) AS c1 FROM cb GROUP BY 1),
          pr AS (SELECT w1, w2, (c2 * 1000000) // c1 AS p_ppm FROM cb JOIN cu USING (w1)),
          scored AS (
            SELECT bg.doc_id, CAST(SUM(p.p_ppm) AS DOUBLE) / COUNT(1) AS avg_p_ppm
            FROM bg JOIN pr p USING (w1, w2)
            GROUP BY bg.doc_id
          ),
          b AS (
            SELECT doc_id, avg_p_ppm,
                   CAST(ntile(3) OVER (ORDER BY avg_p_ppm DESC, doc_id ASC) AS INT) AS tile
            FROM scored
          )
          SELECT doc_id, avg_p_ppm, tile,
                 CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
          FROM b""",

    "q115_realized_epochs" ->
      """WITH c AS (
           SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs,
                  CAST(round(sqrt(CAST(COUNT(1) AS DOUBLE)) * 1000000) AS BIGINT) AS sq
           FROM documents GROUP BY 1
         ),
         t AS (
           SELECT CAST(SUM(n_docs) AS BIGINT) AS tot, CAST(SUM(sq) AS BIGINT) AS sqtot FROM c
         ),
         plan AS (
           SELECT source,
                  least(8000, greatest(1000,
                    (((sq * 1000000) // sqtot) * 1000)
                      // greatest((n_docs * 1000000) // tot, 1))) AS repeat_x1000
           FROM c, t
         ),
         d AS (
           SELECT doc_id, documents.source, repeat_x1000,
                  ('0x' || substr(md5('epoch_' || doc_id), 1, 15))::BIGINT % 1000 AS hv
           FROM documents JOIN plan ON plan.source = documents.source
         ),
         n AS (
           SELECT doc_id, source,
                  repeat_x1000 // 1000
                    + CASE WHEN hv < repeat_x1000 % 1000 THEN 1 ELSE 0 END AS n_copies
           FROM d
         )
         SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS epoch
         FROM n""",

    // Text side = q73's BM25 CTE chain (top-20); vector side = q36's
    // cosine top-10 per query; fusion = integer-ppm RRF on ranks.
    "q116_hybrid_rrf" ->
      s"""WITH $wordsCte,
          tok AS (SELECT doc_id, unnest(ws) AS token FROM words),
          dl AS (SELECT doc_id, COUNT(1) AS dl FROM tok GROUP BY 1),
          st AS (SELECT COUNT(1) AS n_docs, SUM(dl) AS sum_dl FROM dl),
          tf AS (
            SELECT doc_id, token, COUNT(1) AS tf FROM tok
            WHERE token IN ('spark', 'join', 'window', 'hash', 'filter') GROUP BY 1, 2
          ),
          dfr AS (SELECT token, COUNT(1) AS df FROM tf GROUP BY 1),
          sc AS (
            SELECT tf.doc_id, tf.token,
                   ((st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
                     * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
                     / (tf.tf + CAST(1.2 AS DOUBLE) * (1.0 - 0.75 + 0.75 * dl.dl
                          / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))) AS score_t
            FROM tf JOIN dfr USING (token) JOIN dl USING (doc_id), st
          ),
          g AS (
            SELECT doc_id,
                   SUM(CASE WHEN token = 'spark' THEN score_t END) AS s0,
                   SUM(CASE WHEN token = 'join' THEN score_t END) AS s1,
                   SUM(CASE WHEN token = 'window' THEN score_t END) AS s2,
                   SUM(CASE WHEN token = 'hash' THEN score_t END) AS s3,
                   SUM(CASE WHEN token = 'filter' THEN score_t END) AS s4
            FROM sc GROUP BY doc_id
          ),
          text20 AS (
            SELECT doc_id,
                   COALESCE(s0, 0.0) + COALESCE(s1, 0.0) + COALESCE(s2, 0.0)
                     + COALESCE(s3, 0.0) + COALESCE(s4, 0.0) AS score
            FROM g ORDER BY score DESC, doc_id LIMIT 20
          ),
          textr AS (
            SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank_text
            FROM text20
          ),
          $quantCte,
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          vscored AS (
            SELECT q.qid, c.vec_id AS cid,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM en c, q WHERE c.vec_id <> q.qid
          ),
          vecr AS (
            SELECT qid, cid AS doc_id, rk AS rank_vec FROM (
              SELECT qid, cid, cosine,
                     row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
              FROM vscored) WHERE rk <= 10
          ),
          tq AS (SELECT qs.qid, textr.doc_id, textr.rank_text
                 FROM (SELECT DISTINCT qid FROM vecr) qs, textr),
          f AS (
            SELECT COALESCE(tq.qid, v.qid) AS qid,
                   COALESCE(tq.doc_id, v.doc_id) AS doc_id,
                   CAST(COALESCE(1000000 // (60 + tq.rank_text), 0)
                     + COALESCE(1000000 // (60 + v.rank_vec), 0) AS BIGINT) AS rrf_ppm
            FROM tq FULL OUTER JOIN vecr v ON tq.qid = v.qid AND tq.doc_id = v.doc_id
          )
          SELECT qid, doc_id, rrf_ppm, CAST(rk AS BIGINT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_ppm DESC, doc_id ASC) AS rk
            FROM f) WHERE rk <= 10""",

    "q117_char_stats" ->
      """WITH ch AS (
           SELECT doc_id, unnest(string_split(text, '')) AS c
           FROM documents WHERE length(text) > 0
         ),
         cc AS (SELECT doc_id, c, CAST(COUNT(1) AS BIGINT) AS k FROM ch GROUP BY 1, 2),
         agg AS (
           SELECT doc_id,
                  CAST(SUM(k) AS BIGINT) AS n_chars,
                  CAST(COUNT(1) AS INT) AS distinct_chars,
                  SUM(k * (k - 1)) AS coll
           FROM cc GROUP BY 1
         )
         SELECT d.doc_id,
                CAST(COALESCE(a.n_chars, 0) AS BIGINT) AS n_chars,
                CAST(COALESCE(a.distinct_chars, 0) AS INT) AS distinct_chars,
                CASE WHEN a.n_chars >= 2
                     THEN CAST((a.coll * 1000000) // (a.n_chars * (a.n_chars - 1)) AS BIGINT)
                END AS char_coll_ppm
         FROM documents d LEFT JOIN agg a USING (doc_id)""",

    "q118_truncation_loss" ->
      """WITH t AS (
           SELECT source,
                  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents
         )
         SELECT source,
                CAST(COUNT(1) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS total_tokens,
                CAST(SUM(CASE WHEN nt > 64 THEN 1 ELSE 0 END) AS BIGINT) AS truncated_docs,
                CAST(SUM(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END) AS BIGINT) AS lost_tokens,
                CASE WHEN SUM(nt) > 0
                     THEN CAST((SUM(CASE WHEN nt > 64 THEN nt - 64 ELSE 0 END) * 1000000)
                               // SUM(nt) AS BIGINT)
                END AS lost_ppm
         FROM t GROUP BY source""",

    "q119_dedup_token_yield" ->
      """WITH b AS (
           SELECT doc_id, source,
                  md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp,
                  CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents
         ),
         k AS (SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper FROM b)
         SELECT source,
                CAST(COUNT(1) AS BIGINT) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS total_tokens,
                CAST(SUM(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
                CAST(SUM(CASE WHEN doc_id = keeper THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens,
                CASE WHEN SUM(nt) > 0
                     THEN CAST(((SUM(nt) - SUM(CASE WHEN doc_id = keeper THEN nt ELSE 0 END)) * 1000000)
                               // SUM(nt) AS BIGINT)
                END AS dup_token_ppm
         FROM k GROUP BY source""",

    "q120_hard_negatives" ->
      s"""WITH $quantCte,
          el AS (SELECT en.vec_id, v, n2, label FROM en JOIN embeddings USING (vec_id)),
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2, label AS ql
                FROM el WHERE vec_id IN (0,1,2,3,4)),
          scored AS (
            SELECT q.qid, c.vec_id AS cid, c.label AS neg_label,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS cosine
            FROM el c, q
            WHERE c.vec_id <> q.qid AND c.label IS DISTINCT FROM q.ql
          ),
          r AS (SELECT qid, cid, neg_label, cosine,
                       row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid ASC) AS rk
                FROM scored)
          SELECT qid, cid, neg_label, cosine, CAST(rk AS INT) AS rk FROM r WHERE rk <= 10""",

    "q121_epoch_keepers" ->
      """WITH b AS (
           SELECT doc_id,
                  md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
           FROM documents
         ),
         g AS (
           SELECT doc_id, fp,
                  CAST(COUNT(1) OVER (PARTITION BY fp) AS BIGINT) AS group_size,
                  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           FROM b
         )
         SELECT doc_id, fp, group_size FROM g
         WHERE rn = ('0x' || substr(md5(fp || 'epoch0'), 1, 15))::BIGINT % group_size + 1""",

    // Greedy MMR unrolled to k=5 selection stages: sN = argmax of
    // 0.5·rel − 0.5·max(0, sim to s1..s_{N−1}), ties (score, rel desc,
    // cid asc) — exactly the operator's scan order. All sims/rels are
    // doubles from exact integer dots; ×0.5 is exact halving.
    "q124_mmr_rerank" ->
      s"""WITH $quantCte,
          q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM en WHERE vec_id IN (0,1,2,3,4)),
          sc AS (
            SELECT q.qid, c.vec_id AS cid, c.v AS cv, c.n2 AS cn2,
                   ${cosSql("q.qv", "c.v", "q.qn2", "c.n2")} AS rel
            FROM en c, q WHERE c.vec_id <> q.qid
          ),
          cand AS (
            SELECT qid, cid, cv, cn2, rel FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid ASC) AS rn
              FROM sc)
            WHERE rn <= 10
          ),
          ps AS (
            SELECT a.qid, a.cid AS ca, b.cid AS cb,
                   greatest(0.0, ${cosSql("a.cv", "b.cv", "a.cn2", "b.cn2")}) AS sim
            FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
          ),
          s1 AS (
            SELECT qid, cid, rel, 0.5*rel - 0.5*0.0 AS score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, cid ASC) AS rn
              FROM cand)
            WHERE rn = 1
          ),
          r2 AS (
            SELECT c.qid, c.cid, c.rel, 0.5*c.rel - 0.5*p1.sim AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
          ),
          s2 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r2)
            WHERE rn = 1
          ),
          r3 AS (
            SELECT c.qid, c.cid, c.rel, 0.5*c.rel - 0.5*greatest(p1.sim, p2.sim) AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN s2 ON s2.qid = c.qid AND c.cid <> s2.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
            JOIN ps p2 ON p2.qid = c.qid AND p2.ca = c.cid AND p2.cb = s2.cid
          ),
          s3 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r3)
            WHERE rn = 1
          ),
          r4 AS (
            SELECT c.qid, c.cid, c.rel,
                   0.5*c.rel - 0.5*greatest(p1.sim, p2.sim, p3.sim) AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN s2 ON s2.qid = c.qid AND c.cid <> s2.cid
            JOIN s3 ON s3.qid = c.qid AND c.cid <> s3.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
            JOIN ps p2 ON p2.qid = c.qid AND p2.ca = c.cid AND p2.cb = s2.cid
            JOIN ps p3 ON p3.qid = c.qid AND p3.ca = c.cid AND p3.cb = s3.cid
          ),
          s4 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r4)
            WHERE rn = 1
          ),
          r5 AS (
            SELECT c.qid, c.cid, c.rel,
                   0.5*c.rel - 0.5*greatest(p1.sim, p2.sim, p3.sim, p4.sim) AS score
            FROM cand c
            JOIN s1 ON s1.qid = c.qid AND c.cid <> s1.cid
            JOIN s2 ON s2.qid = c.qid AND c.cid <> s2.cid
            JOIN s3 ON s3.qid = c.qid AND c.cid <> s3.cid
            JOIN s4 ON s4.qid = c.qid AND c.cid <> s4.cid
            JOIN ps p1 ON p1.qid = c.qid AND p1.ca = c.cid AND p1.cb = s1.cid
            JOIN ps p2 ON p2.qid = c.qid AND p2.ca = c.cid AND p2.cb = s2.cid
            JOIN ps p3 ON p3.qid = c.qid AND p3.ca = c.cid AND p3.cb = s3.cid
            JOIN ps p4 ON p4.qid = c.qid AND p4.ca = c.cid AND p4.cb = s4.cid
          ),
          s5 AS (
            SELECT qid, cid, rel, score FROM (
              SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, rel DESC, cid ASC) AS rn
              FROM r5)
            WHERE rn = 1
          )
          SELECT qid, cid, rel AS cosine, score AS mmr_score, CAST(1 AS INT) AS sel_rank FROM s1
          UNION ALL SELECT qid, cid, rel, score, CAST(2 AS INT) FROM s2
          UNION ALL SELECT qid, cid, rel, score, CAST(3 AS INT) FROM s3
          UNION ALL SELECT qid, cid, rel, score, CAST(4 AS INT) FROM s4
          UNION ALL SELECT qid, cid, rel, score, CAST(5 AS INT) FROM s5"""
  )
}
