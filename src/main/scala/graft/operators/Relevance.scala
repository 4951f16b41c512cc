package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Term-relevance scoring over a document corpus: TF-IDF term
  * extraction and BM25 ranked retrieval — the inverted-index workloads
  * of a training-data pipeline (keyword routing, corpus search, query
  * decontamination triage). Extension beyond the reference.
  *
  * Both scores use RATIONAL idf variants (ratios of exact integer
  * counts) instead of the textbook `ln` forms: every score is then a
  * short fixed-order chain of correctly-rounded double ops over exact
  * integers — bit-identical on any engine and any partitioning —
  * whereas `ln`/`pow` are not correctly rounded and drift in the last
  * ulp across libm implementations. The variants are order-equivalent
  * per term (log is monotone), and at 100 TB the counts they ride on
  * are the expensive part, not the final scalar map.
  *
  * Scale shape: one explode + two hash-aggregates build (tf, df); the
  * document-frequency and corpus-stat relations are tiny and broadcast;
  * the token stream shuffles once (on token for df, on doc for totals —
  * both map-side combined). No collects.
  */
object Relevance {

  /** (doc_id, token, tf, df, n_docs, score) for every doc-token pair:
    * tf·(N+1)/(df+1) — the smoothed TF-IDF with rational idf.
    * Exactness bound: tf·(N+1) must stay < 2^53 (a petabyte-scale
    * corpus keeps tf < 2^20 and N < 2^33 — inside the bound). */
  def tfidf(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("token"))
    val tf   = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df   = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n    = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * (col("n_docs") + 1)).cast("double") / (col("df") + 1))
  }

  /** Top-k TF-IDF terms per document (score desc, token asc). */
  def topTfidfPerDoc(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(desc("score"), asc("token"))
    tfidf(docs, id, text)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"), col("rk"))
  }

  /** BM25 ranked retrieval for a fixed bag of query terms: standard
    * tf saturation and length normalization (k1, b), rational idf
    * (N − df + 0.5)/(df + 0.5). Returns the top-k (doc_id, score).
    *
    * Per-doc totals are summed in FIXED TERM ORDER (one conditional
    * aggregate per term, then a left-to-right add chain) — a plain
    * `sum(double)` over the matched terms would be order-dependent in
    * the low bits. Query bags are ≤ dozens of terms, so the unrolled
    * aggregate stays small; the corpus-side relations are the same
    * (tf, df, dl) aggregates any search index maintains. */
  def bm25(
      docs: DataFrame,
      id: Column,
      text: Column,
      queryTerms: Seq[String],
      topK: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      s"query terms must be non-empty and distinct: $queryTerms")
    val toks  = docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("token"))
    val dl    = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn(
        "score_t",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val termAggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, col("score_t"))).as(s"__s$i")
    }
    val total = queryTerms.indices
      .map(i => coalesce(col(s"__s$i"), lit(0.0)))
      .reduce(_ + _)
    scored
      .groupBy(col("doc_id"))
      .agg(termAggs.head, termAggs.tail: _*)
      .select(col("doc_id"), total.as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(topK)
  }

  /** Hybrid retrieval by reciprocal-rank fusion: combine a lexical
    * ranked list (`text`: (doc_id, score), e.g. [[bm25]]) with
    * per-query vector ranked lists (`vec`: (qid, cid, rank), e.g.
    * [[Similarity.bruteForceTopK]]) into one fused top-k per query.
    * RRF uses only RANKS — contribution 1/(rrfK + rank) per list,
    * here in exact integer ppm (1000000 div (rrfK + rank)) so the
    * fusion is bit-portable; docs present in one list only keep that
    * list's contribution. The standard way a retrieval pipeline
    * marries BM25 and embeddings without score calibration.
    *
    * Scale shape: fusion touches only the top-k LISTS (k·|queries|
    * rows) — the corpus-sized work lives upstream in the operators
    * that produced them. The one unpartitioned window ranks the ≤ k
    * lexical rows (constant size); everything downstream is
    * per-query. */
  def rrfFuse(text: DataFrame, vec: DataFrame, rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(rrfK >= 1 && topK >= 1, s"bad rrfK/topK: $rrfK/$topK")
    val t = text
      .withColumn("rank_text", row_number().over(Window.orderBy(desc("score"), asc("doc_id"))))
      .select(col("doc_id"), col("rank_text"))
    val v = vec.select(col("qid"), col("cid").as("doc_id"), col("rank").as("rank_vec"))
    // t is the ≤ topK-row lexical list — pin the broadcast explicitly
    // (every sibling tiny-side crossJoin in the library does) rather
    // than rely on AQE noticing the size at runtime.
    val tq = v.select(col("qid")).distinct().crossJoin(broadcast(t))
    val w  = Window.partitionBy(col("qid")).orderBy(desc("rrf_ppm"), asc("doc_id"))
    tq.join(v, Seq("qid", "doc_id"), "full_outer")
      .withColumn(
        "rrf_ppm",
        coalesce(expr(s"1000000L div ($rrfK + rank_text)"), lit(0L)) +
          coalesce(expr(s"1000000L div ($rrfK + rank_vec)"), lit(0L)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("doc_id"), col("rrf_ppm"), col("rk"))
  }
}
