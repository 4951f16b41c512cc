package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence corpus generator: writes a ×K-scaled copy of the
  * `documents`/`embeddings` tables so the dedup/ANN family can be
  * measured where shuffles actually matter (SCALING.md "scale
  * evidence" runs). Usage:
  *
  *   runMain graft.ScaleData [srcDir] [dstDir] [K] [mode]
  *
  * Copy i offsets ids by i·10⁷. Two modes — the two ways a corpus can
  * be 100× bigger, which stress OPPOSITE paths of the dedup machinery:
  *
  * `copies` (default, the original fixture): ODD copies append a
  * copy-specific token to the text (a near-duplicate of the original —
  * exercises the near-dup path), EVEN copies are byte-identical
  * (exact-dup groups of size K/2 — exercises the exact layer and the
  * hot-shingle/band caps). Embedding copies keep the vector (exact ANN
  * duplicates). This is the DUP-DENSE axis: cross-copy pair mass grows
  * ∝ K², so it adversarially stresses caps, reps-first collapse and
  * sampled audits — but it is a pathological corpus shape.
  *
  * `distinct` (the DISTINCT-CONTENT axis — how a real 100 TB corpus
  * grows, where most content is new): copy i > 0 prefixes every
  * whitespace token with `d{i}x`, so copy vocabularies (hence word
  * shingles, minhash signatures, simhashes) are DISJOINT across copies
  * while each copy's INTERNAL near-dup structure is exactly the base
  * corpus's (token renaming is injective per copy ⇒ within-copy
  * Jaccard/containment values are bit-identical to base). Embedding
  * copy i multiplies elementwise by a deterministic ±1 sign pattern
  * (bit j of i·0x9E3779B97F4A7C15): a linear isometry, so within-copy
  * dot products/cosines are EXACT (float negation is exact and
  * [[graft.functions.Portable.quantize]]'s HALF_UP round is
  * symmetric), while cross-copy cosines decorrelate toward 0 (sign
  * patterns differ in ~half the positions). Result: pair/candidate
  * mass grows ∝ K (each copy contributes the base corpus's pair
  * structure, nothing across copies) — the LINEAR path every full
  * pair-export query rides on real corpora. Deterministic, no
  * randomness. Only `documents.parquet` and `embeddings.parquet` are
  * written — the dedup/ANN queries read nothing else.
  */
object ScaleData {

  private[graft] val Modes = Set("copies", "distinct")

  /** The generator body, seam-separated from `main` for ScaleDataSpec. */
  private[graft] def write(
      spark: SparkSession, src: String, dst: String, k: Int, mode: String): Long = {
    require(Modes.contains(mode), s"mode must be one of $Modes (got $mode)")
    require(
      java.nio.file.Paths.get(dst).toAbsolutePath.normalize() !=
        java.nio.file.Paths.get(src).toAbsolutePath.normalize(),
      s"dst must differ from src ($src): overwrite-writing a path the plan " +
        "lazily reads from would truncate the source mid-scan")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until k)
      .map { i =>
        val text = mode match {
          case "copies" =>
            if (i % 2 == 1) concat(col("text"), lit(s" copyvariant$i")) else col("text")
          case "distinct" =>
            if (i == 0) col("text")
            else
              // trim-then-split mirrors TextDedup.words exactly, so the
              // renamed token sequence IS the base word sequence renamed
              // (no spurious empty-token artifacts at the text edges)
              concat_ws(
                " ",
                transform(split(trim(col("text")), "\\s+"), w => concat(lit(s"d${i}x"), w)))
        }
        docs.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          text.as("text"),
          col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      }
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    // the sign patterns are tiny literal arrays (K · dim floats) built
    // driver-side from the copy index — no shuffle, no UDF, exact
    val dim =
      if (mode == "distinct") emb.select(size(col("embedding"))).first().getInt(0) else 0
    (0 until k)
      .map { i =>
        val vec = mode match {
          case "copies" => col("embedding")
          case "distinct" =>
            if (i == 0) col("embedding")
            else {
              val mix = i.toLong * 0x9E3779B97F4A7C15L
              val signs = Array.tabulate(dim)(j =>
                if (((mix >>> (j % 63)) & 1L) == 1L) -1.0f else 1.0f)
              zip_with(
                col("embedding"),
                array(scala.collection.immutable.ArraySeq.unsafeWrapArray(signs.map(lit)): _*),
                (x, s) => x * s)
            }
        }
        emb.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          vec.as("embedding"), col("label"))
      }
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    k * docs.count()
  }

  def main(args: Array[String]): Unit = {
    val src  = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst  = args.lift(1).getOrElse("/tmp/sfscale")
    val k    = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("copies")
    val spark = GraftSession.local()
    val n = write(spark, src, dst, k, mode)
    println(s"""{"scaled":"$dst","k":$k,"mode":"$mode","docs":$n}""")
    spark.stop()
  }
}
