package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-12 operator invariants: the cross-modal decontamination probe
  * (q214) — the hammingLeakSet rep-expansion semantics on an engineered
  * fixture where the image branch FIRES (the sf0.01 fixture's survivors
  * happen to clear the image manifest, so the oracle alone can't pin
  * that branch), plus cross-query consistency of the q214 relation. */
class Round12OperatorsSpec extends SparkSpec {

  test("hammingLeakSet: rep hit expands to EVERY corpus row holding the hash; exact and hamming-1 hits leak, hamming-2 stays clean") {
    val s = spark; import s.implicits._
    // corpus: three rows share hash 0b1100 (one rep probes, all three
    // must leak), one row at hamming 1 of a bench hash, one clean row
    val corpus = Seq(
      (10L, 12L), // 0b1100 — exact match to bench
      (11L, 12L), // same hash: must inherit the rep's verdict
      (12L, 12L), // same hash
      (20L, 9L),  // 0b1001 — hamming 1 from bench 0b1000
      (30L, 96L)  // 0b1100000 — hamming 2 from everything below: clean
    ).toDF("doc_id", "sh")
    val bench = Seq((900L, 12L), (901L, 8L)).toDF("doc_id", "sh")
    val leaked = TextDedup.hammingLeakSet(corpus, bench, maxHamming = 1, bands = 8)
      .collect().map(_.getLong(0)).toSet
    assert(leaked === Set(10L, 11L, 12L, 20L))
  }

  test("hammingLeakSet: empty bench leaks nothing; a bench-only hash never flags itself into the corpus") {
    val s = spark; import s.implicits._
    val corpus = Seq((1L, 5L)).toDF("doc_id", "sh")
    val none   = Seq.empty[(Long, Long)].toDF("doc_id", "sh")
    assert(TextDedup.hammingLeakSet(corpus, none, 1).count() === 0)
    val benchOnly = Seq((2L, 99L)).toDF("doc_id", "sh")
    assert(TextDedup.hammingLeakSet(corpus, benchOnly, 1).count() === 0)
  }

  test("q214 cross-modal decontamination: one verdict row per q210 survivor; the flagged caption really shares a word-5-gram with a src0 text") {
    val dir = sf("sf0.01")
    val out = SparkEntry.queries("q214_crossmodal_decontamination")(spark, dir).collect()
    val card = SparkEntry.queries("q210_paired_dataset_card")(spark, dir).collect().head
    // exactly the surviving pairs, no dups, no extras
    assert(out.length.toLong === card.getAs[Long]("n_pairs"))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === out.length)
    // the pre-simulated fixture counts (500-doc sf0.01)
    assert(out.length === 11)
    assert(out.count(_.getAs[Boolean]("cap_leak")) === 1)
    assert(out.count(_.getAs[Boolean]("img_leak")) === 0)
    // independent host-side check of the caption leak: the flagged
    // caption's text must share a whitespace word-5-gram with some
    // src0 text (or BE a src0 doc); unflagged captions must not
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    def grams(t: String): Set[String] =
      t.trim.split("\\s+").toSeq.sliding(5).filter(_.size == 5)
        .map(_.mkString(" ")).toSet
    val benchGrams = docs.values.collect { case ("src0", t) => grams(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    out.foreach { r =>
      val (src, text) = docs(r.getLong(0))
      val leakTruth = src == "src0" || grams(text).intersect(benchGrams).nonEmpty
      assert(r.getAs[Boolean]("cap_leak") === leakTruth,
        s"caption ${r.getLong(0)} ($src) flag mismatch")
    }
  }
}
