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
      ("  https://x.com/p#a  ", "https://x.com/p"))
    val got = cases.toDF("url", "expect")
      .withColumn("canon", TextAnalysis.canonicalUrl(col("url")))
      .collect()
    got.foreach(r =>
      assert(r.getString(2) === r.getString(1), s"for url '${r.getString(0)}'"))
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
