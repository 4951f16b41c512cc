package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for training-data pipelines: token
  * counting, quality scoring, n-gram-free language ID, and document
  * fingerprinting. Extension beyond the reference. All per-row
  * expressions (no UDFs, no shuffles except declared aggregations) and
  * all reproducible in the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokens (multiplicity kept). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword tokens: letter runs, digit runs, or single
    * non-space symbols — a deterministic stand-in for a real BPE
    * vocabulary (RE2/Java-regex-compatible pattern). */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Normalized-content fingerprint: md5 of lowercased text with all
    * non-alphanumerics stripped — the exact-dedup key that survives
    * whitespace/punctuation/case edits. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]+", ""))

  private val StopEn = Seq("the", "a", "of", "and", "in", "to", "is", "that", "it", "for")
  private val StopDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  private val StopFr = Seq("le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que")

  private def hits(ws: Column, stop: Seq[String]): Column =
    size(filter(ws, w => w.isin(stop: _*)))

  /** Per-document token/quality metrics:
    * n_tokens, n_bpe_tokens, avg_word_len, stopword_ratio,
    * punct_count, and a composite quality_score in [0,1]:
    * 0.5·min(1, n_tokens/100) + 0.3·min(1, 4·stop_ratio)
    * + 0.2·[3 ≤ avg_word_len ≤ 8]. All double arithmetic is
    * single-expression-shape deterministic. */
  def qualityMetrics(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val ws     = tokens(text)
    val nTok   = size(ws)
    val sumLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
    val avgLen = sumLen.cast("double") / nTok
    val stopR  = hits(ws, StopEn).cast("double") / nTok
    val punct  = size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))
    val score  = least(lit(1.0), nTok / lit(100.0)) * 0.5 +
      least(lit(1.0), stopR * 4) * 0.3 +
      when(avgLen.between(3.0, 8.0), lit(0.2)).otherwise(lit(0.0))
    docs.select(
      id.as("doc_id"),
      nTok.cast("long").as("n_tokens"),
      size(bpeTokens(text)).cast("long").as("n_bpe_tokens"),
      avgLen.as("avg_word_len"),
      stopR.as("stopword_ratio"),
      punct.cast("long").as("punct_count"),
      score.as("quality_score"))
  }

  /** Stopword-vote language ID (en/de/fr), ties resolved en→de→fr.
    * A deliberately simple, fully-deterministic heuristic — the point
    * is the distributed shape (per-row scoring, no dictionary
    * broadcast needed at this size; a real model would broadcast). */
  def withLanguageId(docs: DataFrame, text: Column): DataFrame = {
    val ws = tokens(text)
    val (en, de, fr) = (hits(ws, StopEn), hits(ws, StopDe), hits(ws, StopFr))
    docs.withColumn(
      "predicted_lang",
      when(en >= de && en >= fr, "en").when(de >= fr, "de").otherwise("fr"))
  }

  /** Language-ID confusion rollup against a labeled `lang` column. */
  def languageIdSummary(docs: DataFrame, text: Column): DataFrame =
    withLanguageId(docs, text)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Corpus vocabulary stats: per-token document frequency, total
    * occurrences, and (exact decimal) mean per-doc occurrences —
    * top `k` tokens by document frequency. Explode → one hash-agg on
    * the token; the fundamental corpus-statistics shape (idf tables,
    * vocab pruning). Top-k via orderBy+limit = TakeOrderedAndProject.
    */
  def vocabulary(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame =
    docs
      .select(id.as("doc_id"), explode(tokens(text)).as("t"))
      .groupBy(col("t"))
      .agg(
        countDistinct(col("doc_id")).as("doc_freq"),
        count(lit(1)).as("occurrences"))
      .orderBy(desc("doc_freq"), desc("occurrences"), asc("t"))
      .limit(k)
}
