package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.TextDedup

/** The DISTINCT-content generator's contract (ScaleData mode=distinct)
  * — the properties the linear-path scale evidence rests on, pinned at
  * sf0.001 / K=3:
  *
  *  1. copy vocabularies are DISJOINT ⇒ no cross-copy shingle/band
  *     collisions ⇒ the full-corpus pair relation is exactly the
  *     per-copy union: pair mass LINEAR in K by construction;
  *  2. within a copy the near-dup structure is the base corpus's
  *     BIT-EXACTLY (token renaming is injective; the ±1 sign pattern
  *     is an isometry that survives HALF_UP quantization);
  *  3. cross-copy embedding cosines decorrelate — the same base vector
  *     under two different sign patterns is NOT a near-dup pair.
  */
class ScaleDataSpec extends SparkSpec {

  private val K      = 3
  private val outDir = java.nio.file.Files.createTempDirectory("scaledata-distinct")
  private lazy val generated: String = {
    ScaleData.write(spark, sf("sf0.001"), outDir.toString, K, "distinct")
    outDir.toString
  }
  private def copyOf(c: String) = (col(c) / lit(10000000L)).cast("long")

  test("mode is validated and dst==src refuses") {
    val e = intercept[IllegalArgumentException](
      ScaleData.write(spark, sf("sf0.001"), "/tmp/x-scaledata", 2, "bogus"))
    assert(e.getMessage.contains("mode"), e.getMessage)
    val s = intercept[IllegalArgumentException](
      ScaleData.write(spark, sf("sf0.001"), sf("sf0.001"), 2, "copies"))
    assert(s.getMessage.contains("dst must differ"), s.getMessage)
  }

  test("row counts scale by K and ids partition into copies") {
    val docs = spark.read.parquet(s"$generated/documents.parquet")
    val base = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    assert(docs.count() === K * base.count())
    val emb = spark.read.parquet(s"$generated/embeddings.parquet")
    assert(emb.count() === K * 500)
    val copies = docs.select(copyOf("doc_id")).distinct().collect().map(_.getLong(0)).sorted
    assert(copies.toSeq === (0L until K.toLong))
  }

  test("copy vocabularies are disjoint (the no-cross-copy-collision invariant)") {
    val docs = spark.read.parquet(s"$generated/documents.parquet")
    val vocab = docs
      .select(copyOf("doc_id").as("copy"), explode(TextDedup.words(col("text"))).as("w"))
      .distinct()
    val shared = vocab.groupBy(col("w"))
      .agg(countDistinct(col("copy")).as("nc"))
      .filter(col("nc") > 1)
    assert(shared.count() === 0L, "a word appears in two copies — vocabularies must be disjoint")
  }

  test("within-copy pair structure is the base corpus's bit-exactly, and the full relation is the per-copy union (linear in K)") {
    val threshold = 0.5
    def pairs(d: org.apache.spark.sql.DataFrame) =
      TextDedup.jaccardPairs(
        d, col("doc_id"), TextDedup.wordNgrams(col("text"), 5), threshold)
    val base = pairs(spark.read.parquet(s"${sf("sf0.001")}/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.nonEmpty, "fixture must have at least one base near-dup pair")
    val full = pairs(spark.read.parquet(s"$generated/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // no pair spans copies, every copy contributes exactly the base
    // pairs shifted — so the whole relation is K * |base| rows
    val expected = (0 until K).flatMap { i =>
      val off = i.toLong * 10000000L
      base.map { case (a, b, j) => (a + off, b + off, j) }
    }.toSet
    assert(full === expected, s"full=${full.size} expected=${expected.size}")
  }

  test("embedding sign patterns: within-copy quantized dot products exact, cross-copy cosines decorrelated") {
    val emb  = spark.read.parquet(s"$generated/embeddings.parquet")
    val q    = emb.select(col("vec_id"), Portable.quantize(col("embedding")).as("qv"))
    val a    = q.as("a")
    val b    = q.as("b")
    // every cross-copy pair of the SAME base vector — the worst case
    // for decorrelation (identical direction, differing sign pattern)
    val dots = a.join(b,
        pmod(col("a.vec_id"), lit(10000000L)) === pmod(col("b.vec_id"), lit(10000000L)) &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        (col("a.vec_id") / lit(10000000L)).cast("long").as("ca"),
        (col("b.vec_id") / lit(10000000L)).cast("long").as("cb"),
        (Portable.dotQ(col("a.qv"), col("b.qv")).cast("double") /
          (sqrt(Portable.dotQ(col("a.qv"), col("a.qv")).cast("double")) *
            sqrt(Portable.dotQ(col("b.qv"), col("b.qv")).cast("double")))).as("cos"))
    // cross-copy same-base-vector pairs: the sign patterns differ in
    // ~half the positions, so cosine is far from 1 (deterministic
    // fixture — this bound is a regression pin, not a tail estimate)
    val maxCross = dots.agg(max(abs(col("cos")))).first().getDouble(0)
    assert(maxCross < 0.85, s"cross-copy cosine too high: $maxCross")

    // within-copy: every copy's full pairwise quantized-dot relation
    // equals copy 0's (the isometry survives quantization bit-exactly)
    val byCopy = (0 until K).map { i =>
      val c = q.filter((col("vec_id") / lit(10000000L)).cast("long") === i.toLong)
      c.as("x").join(c.as("y"),
          pmod(col("x.vec_id"), lit(10000000L)) < pmod(col("y.vec_id"), lit(10000000L)))
        .select(
          pmod(col("x.vec_id"), lit(10000000L)).as("ba"),
          pmod(col("y.vec_id"), lit(10000000L)).as("bb"),
          Portable.dotQ(col("x.qv"), col("y.qv")).as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(byCopy.forall(_ === byCopy.head),
      "a copy's pairwise quantized dot products differ from copy 0's — the sign pattern is not an exact isometry")
  }
}
