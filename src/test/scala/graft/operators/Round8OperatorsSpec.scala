package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round8OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalUrl: case, default ports, fragments, tracking params, param order, empty path") {
    val cases = Seq(
      // the same page in two crawl-log spellings → one canonical form
      ("HTTPS://Www.X.com:443/p?utm_source=t&b=2&a=1#frag", "https://www.x.com/p?a=1&b=2"),
      ("https://www.x.com/p?a=1&b=2", "https://www.x.com/p?a=1&b=2"),
      // default port + empty path
      ("http://x.com:80", "http://x.com/"),
      ("http://x.com/", "http://x.com/"),
      // NON-default port survives
      ("http://x.com:8080/p", "http://x.com:8080/p"),
      // all-tracking query collapses to no query
      ("https://x.com/p?gclid=g&fbclid=f", "https://x.com/p"),
      // no default-port rule for other schemes
      ("ftp://X.com:443/f", "ftp://x.com:443/f"),
      // whitespace trim + lone fragment
      ("  https://x.com/p#a  ", "https://x.com/p"),
      // scheme-less and protocol-relative crawl-log forms dedup
      // against their absolute http spellings
      ("www.X.com/p?b=2&a=1", "http://www.x.com/p?a=1&b=2"),
      ("//x.com/p", "http://x.com/p"),
      ("x.com:80", "http://x.com/"))
    val got = cases.toDF("url", "expect")
      .withColumn("canon", TextAnalysis.canonicalUrl(col("url")))
      .collect()
    got.foreach(r =>
      assert(r.getString(2) === r.getString(1), s"for url '${r.getString(0)}'"))
  }

  test("bpeTrain: merge table matches the hand-computed rounds; deterministic tie-breaks") {
    // corpus: 'aaab' x2, 'aab' x1 (one doc carries all three words)
    val docs = Seq((0L, "aaab aaab aab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 3, minCount = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: (a,a) count 5 (2+2+1); rewrite: aaab->[aa,a,b], aab->[aa,b]
    // round 2: (aa,a) x2 vs (a,b) x2 vs (aa,b) x1 -> tie-break pair
    //          asc picks (a,b); rewrite: aaab->[aa,ab]
    // round 3: (aa,ab) x2 vs (aa,b) x1 -> (aa,ab)
    assert(merges.toSeq === Seq(
      (1, "a", "a", "aa", 5L),
      (2, "a", "b", "ab", 2L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("bpeTrain stops early when no pair reaches minCount") {
    val docs = Seq((0L, "ab cd ef")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, col("text"), nMerges = 10, minCount = 2)
    assert(merges.count() === 0L) // every pair count is 1
  }

  test("bpeApplyMerges reproduces the trained segmentation (fold rule == sequential kernel)") {
    val corpus = Seq(
      (0L, "the theme then"),
      (1L, "there other aaaa"),
      (2L, "theory the the")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(corpus, col("text"), nMerges = 6, minCount = 1)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val applied = TextAnalysis.bpeApplyMerges(corpus, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // independent reference: replay the greedy left-to-right rule in
    // plain Scala over each word
    def ref(text: String): Seq[String] =
      text.trim.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { w =>
        var syms = w.map(_.toString).toVector
        merges.foreach { case (l, r) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += (l + r); i += 2 }
            else { out += syms(i); i += 1 }
          }
          syms = out.result()
        }
        syms
      }
    Seq((0L, "the theme then"), (1L, "there other aaaa"), (2L, "theory the the"))
      .foreach { case (id, t) => assert(applied(id) === ref(t), s"doc $id") }
  }

  test("kmeansCentroids fails loudly when the seed ids [0, k) are absent (empty codebook footgun)") {
    val noSeeds = Seq((900L, Array(1f, 0f)), (901L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(noSeeds, 2)
    }
    assert(e.getMessage.contains("no seed centroids"))
  }

  test("urlFrontier: variants collapse to canonical groups with keep-min fetch") {
    val urls = Seq(
      (10L, "https://a.com/p?b=2&a=1"),
      (11L, "HTTPS://A.com:443/p?a=1&b=2&utm_campaign=x"),
      (12L, "https://a.com/p?a=1&b=2#frag"),
      (20L, "http://b.com:80"),
      (21L, "http://b.com/"),
      (30L, "https://c.com/only")).toDF("url_id", "url")
    val got = TextAnalysis.urlFrontier(urls, col("url_id"), col("url"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map(
      "https://a.com/p?a=1&b=2" -> ((10L, 3L)),
      "http://b.com/"           -> ((20L, 2L)),
      "https://c.com/only"      -> ((30L, 1L))))
  }
}
