package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zValue: known interleaves; sum-of-disjoint-bits equals OR semantics") {
    val s = spark; import s.implicits._
    val d = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
    val out = d.select(col("a"), col("b"),
      Layout.zValue(Seq(col("a"), col("b")), bits = 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) === 0L)
    assert(out((1L, 0L)) === 1L)  // a bit 0 → position 0
    assert(out((0L, 1L)) === 2L)  // b bit 0 → position 1
    // a=3 (11), b=5 (101): positions a→0,2  b→1,5 : 1+4+2+32 = 39
    assert(out((3L, 5L)) === 39L)
    assert(out((65535L, 65535L)) === (1L << 32) - 1) // full 32-bit block
  }

  test("zValue: monotone blocks — high-bit differences dominate low bits on every dim") {
    val s = spark; import s.implicits._
    val d = (for { a <- 0L until 16L; b <- 0L until 16L } yield (a, b)).toDF("a", "b")
    val z = d.select(Layout.zValue(Seq(col("a"), col("b")), bits = 4).as("z"))
      .collect().map(_.getLong(0))
    assert(z.distinct.length === 256) // bijective on the grid
    assert(z.min === 0L && z.max === 255L)
  }

  test("zOrderWrite: every file's span is bounded on BOTH dims; linear sort leaves dim b unpruned") {
    val s = spark; import s.implicits._
    val grid = (for { a <- 0L until 64L; b <- 0L until 64L } yield (a, b)).toDF("a", "b")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val lDir = java.nio.file.Files.createTempDirectory("linear").toString
    Layout.zOrderWrite(grid, zDir, Seq(col("a"), col("b")), bits = 6, partitions = 8)
    grid.repartitionByRange(8, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(lDir)

    // Per-file min/max boxes — exactly what parquet footer pruning
    // consults: a point predicate skips every file whose box misses it.
    def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] = {
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length > 1, s"expected a multi-file layout in $dir")
      files.toSeq.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("a")), max(col("a")), min(col("b")), max(col("b")))
          .collect().head
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    val zB = fileBoxes(zDir)
    val lB = fileBoxes(lDir)
    // files a predicate on one dim must READ, averaged over probe points
    val probes = Seq(3L, 17L, 33L, 46L, 60L)
    def reads(boxes: Seq[(Long, Long, Long, Long)], onA: Boolean): Double =
      probes.map(p => boxes.count { case (a0, a1, b0, b1) =>
        if (onA) a0 <= p && p <= a1 else b0 <= p && p <= b1
      }).sum.toDouble / probes.size
    // linear layout: perfect on a, USELESS on b (every file read)
    assert(reads(lB, onA = false) === lB.size.toDouble, lB.toString)
    // z-order: BOTH dims prune — strictly fewer than all files on b,
    // and still pruning on a (the trade: neither dim is perfect, no
    // dim is dead)
    assert(reads(zB, onA = false) <= 0.7 * zB.size, s"b-reads=${reads(zB, onA = false)} of ${zB.size}: $zB")
    assert(reads(zB, onA = true) <= 0.7 * zB.size, s"a-reads=${reads(zB, onA = true)} of ${zB.size}: $zB")
  }

  test("zValue guards: dimension/bit budget must fit a signed long") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("a"), col("b")), bits = 32)
    }
  }
}
