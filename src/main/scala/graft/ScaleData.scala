package graft

import org.apache.spark.sql.functions._

/** Scale-evidence corpus generator: writes a ×K-duplicated copy of the
  * `documents`/`embeddings` tables so the dedup/ANN family can be
  * measured where shuffles actually matter (SCALING.md "scale
  * evidence" runs). Usage:
  *
  *   runMain graft.ScaleData [srcDir] [dstDir] [K]
  *
  * Copy i offsets ids by i·10⁷; ODD copies append a copy-specific
  * token to the text (a near-duplicate of the original — exercises the
  * near-dup path), EVEN copies are byte-identical (exact-dup groups of
  * size K/2 — exercises the exact layer and the hot-shingle/band
  * caps). Embedding copies keep the vector (exact ANN duplicates).
  * Deterministic, no randomness. Only `documents.parquet` and
  * `embeddings.parquet` are written — the dedup/ANN queries read
  * nothing else.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sfscale")
    val k   = args.lift(2).map(_.toInt).getOrElse(10)
    require(
      java.nio.file.Paths.get(dst).toAbsolutePath.normalize() !=
        java.nio.file.Paths.get(src).toAbsolutePath.normalize(),
      s"dst must differ from src ($src): overwrite-writing a path the plan " +
        "lazily reads from would truncate the source mid-scan")
    val spark = GraftSession.local()

    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until k)
      .map { i =>
        val text =
          if (i % 2 == 1) concat(col("text"), lit(s" copyvariant$i")) else col("text")
        docs.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          text.as("text"),
          col("lang"), col("source"),
          length(text).cast("long").as("n_chars"))
      }
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until k)
      .map(i => emb.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"""{"scaled":"$dst","k":$k,"docs":${k * docs.count()}}""")
    spark.stop()
  }
}
