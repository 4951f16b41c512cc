package graft

import graft.operators.{Similarity, TextDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-evidence measurement harness for the dedup/ANN headliners
  * against a [[ScaleData]]-generated corpus (SCALING.md "scale
  * evidence" runs). Usage:
  *
  *   runMain graft.ScaleBench [dir] [name ...]
  *
  * Each measurement runs ISOLATED (explicit GC, then min of two
  * passes — the Bench self-verification protocol) and the result is
  * ONE JSON line of name → warm seconds.
  *
  * Three measurements deliberately run the PRODUCTION-capped
  * configuration rather than the registered harness query, because the
  * ×K corpus's duplicate density makes the uncapped form quadratic BY
  * CONSTRUCTION (dup groups of size K: band buckets, IVF cells and
  * true-pair mass all grow ∝ K², which is exactly the regime the caps
  * exist for — SCALING.md documents the exact-dup layer + caps as the
  * 100 TB path):
  *  - `q84_capped`: [[TextDedup.lshRescoredPairs]] with
  *    `maxBandDf = 64` — hot band buckets (the K-sized dup groups,
  *    which collide in EVERY band) belong to the exact-dup layer;
  *  - `q96_capped`: [[Similarity.semDedupVerdicts]] with
  *    `maxCellCompare = 64` — within-cell candidates bounded to
  *    |cell|·64, never |cell|²/2;
  *  - `q99_sampled`: exact prefix-Jaccard truth over the deterministic
  *    10%-of-base-docs slice (copy offsets are multiples of 10⁷, so
  *    `doc_id % 10` keeps whole dup groups — full local density,
  *    bounded mass), the documented once-per-snapshot/sampled-slice
  *    contract for exact-truth relations.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val dir  = args.lift(0).getOrElse("/tmp/sfscale")
    val only = args.drop(1).toSet
    val spark = GraftSession.local()

    def docs = Tables.documents(spark, dir)
    def embs = Tables.embeddings(spark, dir)

    // Shared index artifacts, built once outside the timed region —
    // the sign-once/train-once lifecycle the registered queries model
    // with DirCached (their build cost is reported separately).
    lazy val shingles = TextDedup
      .shingleRows(docs, col("doc_id"), col("text"), 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lazy val sigs = TextDedup
      .minhashSignaturesFromRows(shingles)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lazy val codebook = Similarity
      .kmeansCentroids(embs, 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the hash-once image-fingerprint artifact (the q163 lifecycle)
    lazy val aHashes = graft.operators.Multimodal
      .aHash64(graft.operators.Multimodal.syntheticImages(docs, col("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (score-once artifacts for the prescored rank forms now live in
    // the q197/q198 driver queries' DirCached helpers)

    val measurements: Seq[(String, () => DataFrame)] = Seq(
      "q104_bloom_dedup_gate" ->
        (() => SparkEntry.queries("q104_bloom_dedup_gate")(spark, dir)),
      "q106_paragraph_dedup" ->
        (() => SparkEntry.queries("q106_paragraph_dedup")(spark, dir)),
      "q102_pq_topk" ->
        (() => SparkEntry.queries("q102_pq_topk")(spark, dir)),
      "q135_sq8_codes" ->
        (() => SparkEntry.queries("q135_sq8_codes")(spark, dir)),
      "q143_curriculum_schedule" ->
        (() => SparkEntry.queries("q143_curriculum_schedule")(spark, dir)),
      "q147_novelty_scores" ->
        (() => SparkEntry.queries("q147_novelty_scores")(spark, dir)),
      "q150_packing_efficiency" ->
        (() => SparkEntry.queries("q150_packing_efficiency")(spark, dir)),
      "q136_sq8_recall" ->
        (() => SparkEntry.queries("q136_sq8_recall")(spark, dir)),
      "q139_codebook_quality" ->
        (() => SparkEntry.queries("q139_codebook_quality")(spark, dir)),
      "q141_ivfpq_codes" ->
        (() => SparkEntry.queries("q141_ivfpq_codes")(spark, dir)),
      "q142_ivfpq_topk" ->
        (() => SparkEntry.queries("q142_ivfpq_topk")(spark, dir)),
      "q84_capped" ->
        (() => TextDedup.lshRescoredPairs(
          shingles, estThreshold = 0.5, threshold = 0.8,
          maxBandDf = Some(64L), precomputedSigs = Some(sigs))),
      "q96_capped" ->
        (() => Similarity.semDedupVerdicts(
          embs, Similarity.kmeansCentroids(embs, 8), tau = 0.4,
          maxCellCompare = Some(64L))),
      "q99_sampled" ->
        (() => TextDedup.prefixJaccardPairs(
          TextDedup.shingleRows(
            docs.filter(pmod(col("doc_id"), lit(10L)) === 0),
            col("doc_id"), col("text"), 3),
          0.8)),
      // Round-6 additions. q144/q156 run the SAMPLED production shape
      // on the deterministic 10% base-doc slice (copy offsets are
      // multiples of 10⁷, so the slice keeps WHOLE dup groups — full
      // local duplicate density, bounded total mass): triplet anchors
      // and exact-truth audits are the two relations whose uncapped
      // form grows with true-pair mass ∝ K² on this corpus BY
      // CONSTRUCTION, which is exactly what the sampled contract
      // (SCALING.md / q155–q156) exists for.
      // Both slices REINDEX vec_id/10 before seeding: seedCentroids
      // takes the first k vectors BY ID (vec_id < k), and a slice of
      // id-multiples-of-10 contains only ~k/10 such ids — the round-6
      // run silently trained a ~45-cell codebook while labeling it
      // "k ≈ √N = 447". Dividing the (unique, multiple-of-10) ids by
      // 10 restores a dense 0..N/10 id space so k means k.
      "q144_sampled" ->
        (() => {
          val slice = embs.filter(pmod(col("vec_id"), lit(10L)) === 0)
            .withColumn("vec_id", (col("vec_id") / 10).cast("long"))
          Similarity.tripletMiningIndexed(
            slice, Similarity.kmeansCentroids(slice, 8),
            dim = 64, posThreshold = 0.35, nProbe = 2, kNeg = 3)
        }),
      // same mining with the codebook sized k ≈ √N (the documented IVF
      // scale sizing): probe-join candidate mass = anchors · nProbe ·
      // N/k drops ∝ 1/k — the knob that keeps the negative-mining side
      // linear-ish while the 8-cell harness codebook leaves cells 17×
      // oversized at ×100
      "q144_sqrtn" ->
        (() => {
          val slice = embs.filter(pmod(col("vec_id"), lit(10L)) === 0)
            .withColumn("vec_id", (col("vec_id") / 10).cast("long"))
          val k = math.max(8, math.sqrt(slice.count().toDouble).toInt)
          Similarity.tripletMiningIndexed(
            slice, Similarity.kmeansCentroids(slice, k),
            dim = 64, posThreshold = 0.35, nProbe = 2, kNeg = 3)
        }),
      "q151_split_leakage" ->
        (() => SparkEntry.queries("q151_split_leakage")(spark, dir)),
      "q152_trigram_lm" ->
        (() => SparkEntry.queries("q152_trigram_lm")(spark, dir)),
      "q153_curation_funnel" ->
        (() => SparkEntry.queries("q153_curation_funnel")(spark, dir)),
      "q154_cell_skew" ->
        (() => SparkEntry.queries("q154_cell_skew")(spark, dir)),
      "q155_sampled_ann_audit" ->
        (() => SparkEntry.queries("q155_sampled_ann_audit")(spark, dir)),
      // round-13: the gate now sits BELOW both pair-forming joins
      // (prefixJaccardPairsSampled / lshRescoredPairsSampled) — same
      // relation as the old recallAuditSampled-over-full-truth form
      // (trend rows stay comparable), exact-truth cost ∝ sample.
      "q156_sampled" ->
        (() => {
          val sh = TextDedup.shingleRows(
            docs.filter(pmod(col("doc_id"), lit(10L)) === 0),
            col("doc_id"), col("text"), 3)
          TextDedup.recallAudit(
            TextDedup.prefixJaccardPairsSampled(sh, 0.8, rateBps = 5000),
            TextDedup.lshRescoredPairsSampled(
              sh, estThreshold = 0.5, threshold = 0.8, rateBps = 5000))
        }),
      // round-13 RATE LAW: the pushed-down audit on the FULL ×K corpus
      // at rateBps=100 (1%) — sampled-audit cost ∝ rate. The registered
      // 50% fixture rate exists for oracle non-vacuity at sf0.01; at
      // corpus scale the rate IS the dial (rate 5000 on the full ×100
      // corpus still DNF'd on spill disk: per-group pair mass
      // ∝ rate·K², SCALING.md r13).
      "q156_rate100" ->
        (() => TextDedup.recallAudit(
          TextDedup.prefixJaccardPairsSampled(shingles, 0.8, rateBps = 100),
          TextDedup.lshRescoredPairsSampled(
            shingles, estThreshold = 0.5, threshold = 0.8, rateBps = 100,
            precomputedSigs = Some(sigs)))),
      // the REP-COLLAPSED audit (q216) at the 1% rate: exact collapse
      // absorbs the fixture's EXACT copy half (even copies); the odd
      // one-word VARIANTS are genuine near-dups an audit must count,
      // and for those the rate is the dial. At the registered 50%
      // fixture rate even the rep relation spills past this box's disk
      // at ×100 (measured r13: 69 GB watermark at kill) — the
      // production audit samples a fraction, not half.
      "q216_rate100" ->
        (() => {
          val d = docs
          val reps = d.join(
            TextDedup.exactDupGroups(
                d, col("doc_id"),
                graft.operators.TextAnalysis.fingerprint(col("text")))
              .select(col("keeper_doc_id").as("doc_id")),
            Seq("doc_id"), "left_semi")
          val sh = TextDedup.shingleRows(reps, col("doc_id"), col("text"), 3)
          TextDedup.recallAudit(
            TextDedup.prefixJaccardPairsSampled(sh, 0.8, rateBps = 100),
            TextDedup.lshRescoredPairsSampled(
              sh, estThreshold = 0.5, threshold = 0.8, rateBps = 100))
        }),
      // round-14 FIXED-BUDGET law (q217): gate BOTH sides with
      // independent hashes and scale BOTH rates ∝ 1/K — per-group
      // sampled pair mass rate_a·rate_b·K² is then CONSTANT in copy
      // count (0.25× base-group mass at every K), where the one-sided
      // q156 form at any fixed rate still grows ∝ K². K is inferred
      // from the corpus (base = 5 000 docs), so the same row measures
      // ×1/×10/×100 at rates 5000/500/50 bps — the flat-in-K evidence.
      "q217_budget" ->
        (() => {
          val k    = math.max(1L, math.round(docs.count() / 5000.0))
          val rate = math.max(1, (5000L / k).toInt)
          TextDedup.recallAudit(
            TextDedup.prefixJaccardPairsSampledBoth(shingles, 0.8, rate, rate),
            TextDedup.lshRescoredPairsSampledBoth(
              shingles, estThreshold = 0.5, threshold = 0.8,
              rateABps = rate, rateBBps = rate,
              precomputedSigs = Some(sigs)))
        }),
      // Round-7 additions: image hashing/dedup and the label audit run
      // the REGISTERED query shape — image count and cell-blocked
      // candidate mass are the scale axes; the ×K corpus multiplies
      // both (identical embedding copies make every cell K× denser,
      // the adversarial case for the within-cell self-join).
      "q163_image_ahash" ->
        (() => SparkEntry.queries("q163_image_ahash")(spark, dir)),
      "q164_image_neardup" ->
        (() => SparkEntry.queries("q164_image_neardup")(spark, dir)),
      "q165_label_audit" ->
        (() => SparkEntry.queries("q165_label_audit")(spark, dir)),
      // the production pair shape for a dup-dense corpus: the EXACT
      // layer collapses hash-identical images first (one keep-min
      // representative per fingerprint — the same exact-before-near
      // discipline as text dedup), and near-dup pairs are mined among
      // REPRESENTATIVES only; raw q164 on the ×K corpus instead emits
      // every within-group pair — output ∝ K² by construction.
      // Registered since round 8 as the oracle-checked driver query
      // q171_image_neardup_distinct; kept here under its historical
      // scale-row name so SCALING.md trend lines stay comparable.
      "q164_distinct" ->
        (() => {
          val reps = graft.operators.Multimodal.aHash64(
            graft.operators.Multimodal.syntheticImages(docs, col("doc_id")))
            .groupBy(col("sh")).agg(min(col("doc_id")).as("doc_id"))
          TextDedup.simhashPairsFromHashes(reps, maxHamming = 3, bands = 8)
        }),
      // the production-capped form for the dup-dense corpus: neighbors
      // drawn from each cell's 64 lowest ids (the semDedup cap
      // contract) — candidate mass |cell|·64, never |cell|²
      "q165_capped" ->
        (() => Similarity.knnLabelAudit(
          embs, Similarity.kmeansCentroids(embs, 8), col("label"), k = 5,
          maxCellCompare = Some(64L))),
      // MediaStream's per-batch gate driven directly (the foreachBatch
      // body, no streaming harness): the corpus's images arrive as 5
      // equal batches, each gated against the growing admitted index.
      // Timed = the whole 5-batch ingest; returned relation = the
      // final admitted index. Fresh index dir per pass.
      "media_gate_5batches" ->
        (() => {
          val hist = java.nio.file.Files
            .createTempDirectory("graft-media-gate").toString + "/index"
          val media = graft.operators.Multimodal
            .syntheticImages(docs, col("doc_id"))
          val sink = graft.streaming.MediaStream.aHashGatedBatchSink(hist, maxHamming = 3)
          (0L until 5L).foreach(b => sink(media.filter(pmod(col("doc_id"), lit(5L)) === b), b))
          spark.read.parquet(hist)
        }),
      // the vector twin of media_gate: the semantic ingest gate over 5
      // equal embedding batches (the ×K corpus's identical copies are
      // the dup-dense steady state the exact-layer collapse exists for)
      "vec_gate_5batches" ->
        (() => {
          val hist = java.nio.file.Files
            .createTempDirectory("graft-vec-gate").toString + "/index"
          val cb   = Similarity.kmeansCentroids(embs, 8)
          val sink = graft.streaming.VecStream.semDedupGatedBatchSink(
            hist, cb, tau = 0.9, maxCellCompare = Some(64L))
          (0L until 5L).foreach(b => sink(embs.filter(pmod(col("vec_id"), lit(5L)) === b), b))
          spark.read.parquet(hist)
        }),
      "q169_image_verdicts" ->
        (() => SparkEntry.queries("q169_image_verdicts")(spark, dir)),
      "q167_source_overlap" ->
        (() => SparkEntry.queries("q167_source_overlap")(spark, dir)),
      // the df-capped production form (q172): rare-shingle mass only —
      // the rail that holds when boilerplate dominates the ×K corpus
      "q172_source_overlap_capped" ->
        (() => SparkEntry.queries("q172_source_overlap_capped")(spark, dir)),
      // round-8 additions: both single-exchange linear ops — the scale
      // axis is plain row count (frontier: map-side canonicalize +
      // hash-agg; preference pairs: group-keyed rank-limit windows)
      "q173_url_frontier" ->
        (() => SparkEntry.queries("q173_url_frontier")(spark, dir)),
      "q174_preference_pairs" ->
        (() => SparkEntry.queries("q174_preference_pairs")(spark, dir)),
      // BPE training, 10 merge rounds: ONE corpus-sized pass (the
      // word-count collapse), then every round runs on the VOCAB
      // relation — which the ×K corpus leaves unchanged (copies add
      // counts, not words), so training cost should flatten across
      // decades. Returned relation = the merge table (timed end to
      // end including the driver loop).
      "bpe_train_10" ->
        (() => {
          val m = graft.operators.TextAnalysis.bpeTrain(
            docs, col("text"), nMerges = 10)
          m
        }),
      "q168_token_fertility" ->
        (() => SparkEntry.queries("q168_token_fertility")(spark, dir)),
      "q157_cluster_histogram" ->
        (() => SparkEntry.queries("q157_cluster_histogram")(spark, dir)),
      "q158_codebook_refresh" ->
        (() => SparkEntry.queries("q158_codebook_refresh")(spark, dir)),
      "q159_pq_rerank" ->
        (() => SparkEntry.queries("q159_pq_rerank")(spark, dir)),
      "q160_dataset_card" ->
        (() => SparkEntry.queries("q160_dataset_card")(spark, dir)),
      "q161_bpe_pair_counts" ->
        (() => SparkEntry.queries("q161_bpe_pair_counts")(spark, dir)),
      "q162_boilerplate_shingles" ->
        (() => SparkEntry.queries("q162_boilerplate_shingles")(spark, dir)),
      // round-8 second batch (snapshot lifecycle): all single-exchange
      // key-join / hash-agg shapes — the scale axis is row count
      "q177_snapshot_diff" ->
        (() => SparkEntry.queries("q177_snapshot_diff")(spark, dir)),
      "q178_modality_coverage" ->
        (() => SparkEntry.queries("q178_modality_coverage")(spark, dir)),
      "q179_curation_lineage" ->
        (() => SparkEntry.queries("q179_curation_lineage")(spark, dir)),
      "q180_length_drift" ->
        (() => SparkEntry.queries("q180_length_drift")(spark, dir)),
      "q181_domain_reputation" ->
        (() => SparkEntry.queries("q181_domain_reputation")(spark, dir)),
      "q182_incremental_recurate" ->
        (() => SparkEntry.queries("q182_incremental_recurate")(spark, dir)),
      "q183_embedding_drift" ->
        (() => SparkEntry.queries("q183_embedding_drift")(spark, dir)),
      "q184_span_surgery" ->
        (() => SparkEntry.queries("q184_span_surgery")(spark, dir)),
      "q185_hashed_quality" ->
        (() => SparkEntry.queries("q185_hashed_quality")(spark, dir)),
      "q186_cms_heavyhitters" ->
        (() => SparkEntry.queries("q186_cms_heavyhitters")(spark, dir)),
      "q187_mutual_pairs" ->
        (() => SparkEntry.queries("q187_mutual_pairs")(spark, dir)),
      "q188_quality_calibration" ->
        (() => SparkEntry.queries("q188_quality_calibration")(spark, dir)),
      "q189_hll_distinct" ->
        (() => SparkEntry.queries("q189_hll_distinct")(spark, dir)),
      "q190_domain_reweight" ->
        (() => SparkEntry.queries("q190_domain_reweight")(spark, dir)),
      "q191_audio_vad" ->
        (() => SparkEntry.queries("q191_audio_vad")(spark, dir)),
      // forced through a sum so count()'s column pruning can't drop
      // the probe-side cumsum window (the q194 lesson)
      "q192_budget_selection" ->
        (() => SparkEntry.queries("q192_budget_selection")(spark, dir)
          .agg(sum(col("running_total")).as("chk"),
            sum(when(col("admitted"), 1L)).as("n_admitted"))),
      "q193_dd_quantiles" ->
        (() => SparkEntry.queries("q193_dd_quantiles")(spark, dir)),
      "q195_rank_disagreement" ->
        (() => SparkEntry.queries("q195_rank_disagreement")(spark, dir)),
      // Multi-round DoReMi: the corpus collapse runs once inside the
      // call; rounds iterate the cached cells·|sources| relation, so
      // the ×10→×100 ratio must track the single corpus pass (q190's),
      // not rounds× it
      "q199_doremi_rounds" ->
        (() => SparkEntry.queries("q199_doremi_rounds")(spark, dir)),
      // Realization composed AFTER the loop: the weights run (q199)
      // plus the map-only hash-gated epoch expansion onto the shard —
      // forced through a sum over the exploded epoch column so
      // count() can't prune the expansion away (the q194 lesson)
      "q200_doremi_realize" ->
        (() => SparkEntry.queries("q200_doremi_realize")(spark, dir)
          .agg(sum(col("epoch")).as("chk"), count(lit(1)).as("n_rows"))),
      // Production form, now the oracle-checked q198 driver query:
      // both scorers are score-once materialized artifacts — measures
      // the two-phase ranks + join + top-k alone (warm passes; the
      // cold pass carries the artifact build)
      "q198_rank_prescored" ->
        (() => SparkEntry.queries("q198_rank_prescored")(spark, dir)),
      // map-only projection: a bare count() would prune the rewrite
      // away entirely — force it through a length sum
      "q194_fim_split" ->
        (() => SparkEntry.queries("q194_fim_split")(spark, dir)
          .agg(sum(length(col("fim_text"))).as("total_chars"))),
      // Production form, now the oracle-checked q197 driver query:
      // the ranker over the score-once (doc_id, n_tokens, density)
      // artifact — forced through an agg over the cumsum column (a
      // bare count() would prune the window away)
      "q197_budget_prescored" ->
        (() => SparkEntry.queries("q197_budget_prescored")(spark, dir)
          .agg(sum(col("running_total")).as("chk"),
            sum(when(col("admitted"), 1L)).as("n_admitted"))),
      // Production form: registers + estimate only — the exact-truth
      // audit side (corpus-wide distinct-hash agg) is what the
      // sketch REPLACES at scale, so measure the sketch alone too.
      "q189_sketch_only" ->
        (() => graft.operators.Profile.hllEstimate(
          graft.operators.Profile.hllRegisters(
            docs
              .select(col("source"), graft.operators.TextAnalysis.tokens(col("text")).as("ws"))
              .select(col("source"),
                explode(TextDedup.hashedNgramsAllFromWords(col("ws"), 3)).as("h")),
            col("source"), col("h")))),
      // Production-capped form (see the q84/q96 note above): the ×K
      // corpus's dup density packs cells quadratically by
      // construction; the B-side hot-cell cap is the documented
      // 100 TB configuration. Same machinery as the oracle-checked
      // q196 driver query (which uses cap 4 so the cap BITES at
      // sf0.01); cap 256 here is the production setting.
      "q196_mutual_pairs_capped" ->
        (() => {
          codebook.count() // train-once artifact, prebuilt untimed
          Similarity.marginMutualPairs(
            embs.filter(col("vec_id") % 2 === 0),
            embs.filter(col("vec_id") % 2 === 1),
            codebook,
            maxCellCompare = Some(256L))
        }),
      // real WAV container decode + thermometer barcode per clip —
      // linear in clips like q191's decode (same codec pass)
      "q201_audio_fingerprint" ->
        (() => SparkEntry.queries("q201_audio_fingerprint")(spark, dir)),
      // real AVI container walk + per-frame PNG decode + luma rollup —
      // the video codec pass, linear in total frames
      "q203_video_luma" ->
        (() => SparkEntry.queries("q203_video_luma")(spark, dir)
          .agg(sum(col("mean_luma")).as("chk"), count(lit(1)).as("n"))),
      "q204_video_scenes" ->
        (() => SparkEntry.queries("q204_video_scenes")(spark, dir)),
      "q206_video_neardup" ->
        (() => SparkEntry.queries("q206_video_neardup")(spark, dir)),
      // verdict chains over the modality barcodes (exact collapse →
      // banded pair join → cluster contraction): pair mass bounded by
      // distinct barcodes, the q169 discipline
      "q207_audio_verdicts" ->
        (() => SparkEntry.queries("q207_audio_verdicts")(spark, dir)),
      "q208_video_verdicts" ->
        (() => SparkEntry.queries("q208_video_verdicts")(spark, dir)),
      // exact-layer reps + 8-band pigeonhole pair join at hamming ≤ 1
      "q202_audio_neardup" ->
        (() => SparkEntry.queries("q202_audio_neardup")(spark, dir)),
      // cross-modal keyframe-vs-image probe: container walk extracts
      // stills (no transcode — MPNG frames ARE PNGs), the same aHash +
      // banded machinery as the image corpus; cost = keyframe hash
      // pass (linear in sampled frames) + band-bucket collisions,
      // never keyframes × images
      "q209_crossmodal_neardup" ->
        (() => SparkEntry.queries("q209_crossmodal_neardup")(spark, dir)),
      // PRODUCTION form of q209 on a dup-dense corpus: the ×K fixture
      // gives every copy an IDENTICAL hash, so the full id-pair export
      // is quadratic in K by OUTPUT CARDINALITY (the q164-vs-q171
      // dichotomy); the scale path collapses BOTH sides to exact-layer
      // reps (one row per distinct hash) before the probe — the
      // distinct-hash pair relation, linear mass, same information
      "q213_crossmodal_reps" ->
        (() => SparkEntry.queries("q213_crossmodal_reps")(spark, dir)),
      // LAION-shape paired curation: mutual pairs × caption gate ×
      // image keep set — the gate sets are persisted artifacts, so
      // the per-run cost is the pair mining (cell-bucketed) plus two
      // id semi-joins; decode never happens in this plan
      "q210_paired_dataset_card" ->
        (() => SparkEntry.queries("q210_paired_dataset_card")(spark, dir)),
      // shared-still boilerplate detector: one keyframe hash pass +
      // one hash-agg — the group relation is bounded by DISTINCT
      // hashes, so dup density makes it smaller, not bigger
      "q211_shared_stills" ->
        (() => SparkEntry.queries("q211_shared_stills")(spark, dir)),
      // alignment histogram: the q210 machinery rolled to ≤ 10 rows —
      // same cell-bucketed pair mining, constant-size output
      "q212_pair_alignment" ->
        (() => SparkEntry.queries("q212_pair_alignment")(spark, dir)),
      // q212's histogram over the PRODUCTION-capped pair relation —
      // the gates are linear artifact semi-joins measured with their
      // own families; this isolates the alignment histogram's real
      // scale cost (the capped pair mining + a ≤10-row agg)
      "q212_alignment_capped" ->
        (() => {
          codebook.count()
          Similarity.marginMutualPairs(
            embs.filter(col("vec_id") % 2 === 0),
            embs.filter(col("vec_id") % 2 === 1),
            codebook,
            maxCellCompare = Some(256L))
            .groupBy(expr("cos_ppm div 100000").as("cos_bucket"))
            .agg(count(lit(1)).as("n_pairs"), sum(col("margin_ppm")).as("sum_margin_ppm"))
        }),
      // q210's pair-mining stage under the PRODUCTION hot-cell cap
      // (the q196 dial): the ×K dup density packs cells quadratically
      // by construction; capped candidate mass is Σ|A∩cell|·cap.
      // Gates omitted here — they are artifact semi-joins whose cost
      // the uncapped entry already carries; this isolates the dial.
      "q210_pairs_capped" ->
        (() => {
          codebook.count()
          Similarity.marginMutualPairs(
            embs.filter(col("vec_id") % 2 === 0),
            embs.filter(col("vec_id") % 2 === 1),
            codebook,
            maxCellCompare = Some(256L))
        }),
      // the driver query's CAP 4 setting (the value at which the cap
      // provably bites at sf0.01) measured beside the production 256:
      // candidate mass is Σ|A∩cell|·cap, so the cap IS the cost dial
      "q196_mutual_pairs_cap4" ->
        (() => {
          codebook.count()
          Similarity.marginMutualPairs(
            embs.filter(col("vec_id") % 2 === 0),
            embs.filter(col("vec_id") % 2 === 1),
            codebook,
            maxCellCompare = Some(4L))
        }),
      // q214's PRODUCTION form: the decontamination leak layers over
      // the CAPPED pair relation (the q196/q210 dial) instead of the
      // uncapped miner the oracle query re-derives. The image side is
      // the reps-first banded probe over the hash-once fingerprint
      // artifact; the caption side is the broadcast-bench gram join
      // over pair captions only. Gate semi-joins omitted (artifact
      // id-joins measured with their own families).
      "q214_decontamination_capped" ->
        (() => {
          codebook.count(); aHashes.count()
          val pairs = Similarity.marginMutualPairs(
            embs.filter(col("vec_id") % 2 === 0),
            embs.filter(col("vec_id") % 2 === 1),
            codebook,
            maxCellCompare = Some(256L))
          val evalDocs = docs.filter(col("source") === "src0")
          val survImgHashes = aHashes
            .join(pairs.select(col("b_id").as("doc_id")).distinct(), Seq("doc_id"))
          val evalImgHashes = aHashes.join(evalDocs.select("doc_id"), Seq("doc_id"))
          val leakImgs = TextDedup
            .hammingLeakSet(survImgHashes, evalImgHashes, maxHamming = 1, bands = 8)
            .select(col("doc_id").as("b_id"))
            .withColumn("__img_leak", lit(true))
          val capDocs = docs.join(
            pairs.select(col("a_id").as("doc_id")).distinct(), Seq("doc_id"))
          val leakCaps = TextDedup
            .contaminationFlags(
              capDocs, col("doc_id"), col("text"), evalDocs, col("text"), 5)
            .select(col("doc_id"))
            .unionByName(capDocs.filter(col("source") === "src0").select("doc_id"))
            .distinct()
            .select(col("doc_id").as("a_id"))
            .withColumn("__cap_leak", lit(true))
          pairs
            .join(leakCaps, Seq("a_id"), "left")
            .join(leakImgs, Seq("b_id"), "left")
            .select(
              col("a_id"), col("b_id"),
              coalesce(col("__cap_leak"), lit(false)).as("cap_leak"),
              coalesce(col("__img_leak"), lit(false)).as("img_leak"))
        }),
      // the INCREMENTAL paired-curation miner (PairStream, q210's
      // streaming twin): each side's 5 batches land + probe the
      // committed other-modality index for capped candidate pairs;
      // timed = the whole interleaved 10-batch ingest, returned =
      // the deduped mined relation
      "pair_gate_10batches" ->
        (() => {
          codebook.count()
          val w = java.nio.file.Files
            .createTempDirectory("graft-pair-gate").toString
          val caps  = embs.filter(col("vec_id") % 2 === 0)
          val imgs  = embs.filter(col("vec_id") % 2 === 1)
          val cSink = graft.streaming.PairStream.captionPairBatchSink(
            s"$w/cidx", s"$w/iidx", s"$w/cpairs", codebook, Some(256L))
          val iSink = graft.streaming.PairStream.imagePairBatchSink(
            s"$w/iidx", s"$w/cidx", s"$w/ipairs", codebook, Some(256L))
          (0L until 5L).foreach { b =>
            cSink(caps.filter(pmod(col("vec_id"), lit(5L)) === b), b)
            iSink(imgs.filter(pmod(col("vec_id"), lit(5L)) === b), b)
          }
          graft.streaming.PairStream.minedPairs(spark, s"$w/cpairs", s"$w/ipairs")
        })
    ).filter { case (n, _) => only.isEmpty || only.contains(n) }

    def once(fn: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n  = fn().count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(s"  rows=$n  ${"%.2f".format(dt)}s")
      dt
    }
    // prebuild shared artifacts so their cost is visible but untimed
    if (measurements.exists(m => m._1.startsWith("q84"))) {
      val t0 = System.nanoTime()
      val ns = shingles.count(); val nsig = sigs.count()
      System.err.println(
        s"index build: $ns shingle rows, $nsig sigs in ${"%.1f".format((System.nanoTime() - t0) / 1e9)}s")
    }
    val timed = measurements.map { case (name, fn) =>
      System.err.println(s"[$name]")
      System.gc()
      val w = math.min(once(fn), once(fn))
      System.gc()
      name -> w
    }
    val qs = timed.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"scale_bench":"$dir","warm_sec":$qs}""")
    spark.stop()
  }
}
