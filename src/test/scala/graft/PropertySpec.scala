package graft

import graft.ohlcv.{MockData, Normalize, RawIngest}
import graft.operators.{Dedup, Packing, Resample, Skew, TextAnalysis, TextDedup}
import graft.functions.Det
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the invariants the reference encodes
  * (SURVEY §5): P9 quality-filter postconditions, A6 bucket alignment,
  * D2 idempotence + order-independence, P7∘P6 normalization
  * round-trip, and salted-aggregation equivalence. Generators run a
  * handful of Spark jobs per property, so sizes stay small.
  */
class PropertySpec extends SparkSpec {

  /** Hand-rolled forAll: scalatestplus isn't on the offline classpath,
    * so sample the generator with explicit deterministic seeds. */
  private def forAll[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 10)(body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } body(a, b)
    }

  private val symGen = Gen.oneOf("RELIANCE", "TCS", "INFY", "SBIN-X", "m&m")

  test("P7∘P6: cleanSymbol(toExchangeSymbol(s)) == upper(s) for plain names") {
    val s = spark; import s.implicits._
    forAll(Gen.listOfN(5, symGen)) { syms =>
      if (syms.nonEmpty) {
        val df  = syms.toDF("sym")
        val out = df.select(
          Normalize.cleanSymbol(Normalize.toExchangeSymbol(col("sym"))).as("c"),
          upper(col("sym")).as("u")).collect()
        out.foreach(r => assert(r.getString(0) === r.getString(1)))
      }
    }
  }

  test("A6: every resample bucket is epoch-aligned and covers its candles") {
    val s = spark; import s.implicits._
    forAll2(Gen.chooseNum(1, 120), Gen.chooseNum(0L, 100000L)) { (minutes, offset) =>
      val secs = minutes * 60
      val ticks = (0 until 40).map(i => ("S", 1759895100L + offset + i * 300L, 100.0 + i))
        .toDF("symbol", "tsu", "value")
        .withColumn("ts", to_timestamp(from_unixtime(col("tsu"))))
      val out = Resample.ticksToCandles(
        ticks, col("symbol"), col("ts"), col("value"), col("value"), col("tsu"), secs)
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getAs[Long]("bucket_start") % secs === 0)
        assert(r.getAs[Double]("high") >= r.getAs[Double]("low"))
        assert(r.getAs[Double]("high") >= math.max(r.getAs[Double]("open"), r.getAs[Double]("close")))
      }
      // total ticks preserved across buckets
      assert(out.map(_.getAs[Long]("n_ticks")).sum === 40)
    }
  }

  test("D2: dedup is idempotent and independent of input order/partitioning") {
    val s = spark; import s.implicits._
    val rowGen = for {
      key <- Gen.chooseNum(1, 6)
      ver <- Gen.chooseNum(1, 9)
      v   <- Gen.chooseNum(0, 999)
    } yield (key, ver, v)
    forAll(Gen.listOfN(30, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "ver", "v")
        def run(d: org.apache.spark.sql.DataFrame) =
          Dedup.keepLatest(d, Seq(col("k")), Seq(col("ver"), col("v")))
            .orderBy("k").collect().toSeq
        val once = run(df)
        assert(run(df.repartition(7)) === once)        // partitioning-independent
        assert(run(df.orderBy(desc("v"))) === once)    // input-order-independent
        val again = Dedup.keepLatest(
          rows.toDF("k", "ver", "v"), Seq(col("k")), Seq(col("ver"), col("v")))
        assert(run(again) === once)                    // idempotent
      }
    }
  }

  test("P9: normalize output satisfies the quality postconditions for arbitrary candles") {
    val s = spark; import s.implicits._
    val candleGen = for {
      ts <- Gen.chooseNum(1L, 2000000000L)
      o  <- Gen.chooseNum(-10.0, 2000.0)
      h  <- Gen.chooseNum(-10.0, 2000.0)
      l  <- Gen.chooseNum(-10.0, 2000.0)
      c  <- Gen.chooseNum(-10.0, 2000.0)
      v  <- Gen.chooseNum(-100L, 100000L)
    } yield Seq(ts.toDouble, o, h, l, c, v.toDouble)
    forAll(Gen.listOfN(25, candleGen)) { candles =>
      val json =
        s"""{"data":{"NSE:X-EQ":{"symbol":"NSE:X-EQ","resolution":"5","candles":${candles
          .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")},"timestamp":"t","total_records":${candles.size}}},
            "metadata":{"fetch_timestamp":"f","total_symbols":1,"source":"gen"}}""".replaceAll("\n", "")
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.json"), json.getBytes)
      val out = Normalize.normalize(RawIngest.blocks(RawIngest.readRaw(spark, dir)), "p")
      out.collect().foreach { r =>
        assert(r.getAs[Double]("high") >= r.getAs[Double]("low"))
        assert(r.getAs[Double]("close") > 0)
        assert(r.getAs[Long]("volume") >= 0)
      }
    }
  }

  test("salted aggregation equals direct aggregation (sum/count/min/max)") {
    val s = spark; import s.implicits._
    val rowGen = for {
      k <- Gen.oneOf("hot", "hot", "hot", "a", "b") // skewed key
      v <- Gen.chooseNum(-1000, 1000)
    } yield (k, v)
    forAll(Gen.listOfN(60, rowGen)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "v")
        val direct = df.groupBy("k")
          .agg(sum("v").as("s"), count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
          .orderBy("k").collect().toSeq
        val salted = Skew.saltedAgg(
          df,
          keys = Seq(col("k")),
          discriminator = col("v"),
          buckets = 8,
          partials = Seq(sum("v").as("s"), count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx")),
          combiners = Seq(sum("s").as("s"), sum("n").as("n"), min("mn").as("mn"), max("mx").as("mx")))
          .orderBy("k").collect().toSeq
        assert(salted === direct)
      }
    }
  }

  test("minhash signature equality is implied by shingle-set equality") {
    val s = spark; import s.implicits._
    val textGen = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    forAll(textGen) { t =>
      val docs = Seq((0L, t), (1L, t)).toDF("doc_id", "text")
      val sigs = TextDedup.minhashSignatures(docs, col("doc_id"), TextDedup.wordNgrams(col("text"), 3))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      if (sigs.nonEmpty) assert(sigs(0L) === sigs(1L))
    }
  }

  test("sequence packing equals the sequential scan for arbitrary sparse ids/weights") {
    val s = spark; import s.implicits._
    val rowGen = for {
      id <- Gen.chooseNum(0L, 5000L)
      w  <- Gen.chooseNum(0L, 300L)
    } yield (id, w)
    forAll(Gen.listOfN(40, rowGen), n = 5) { rows0 =>
      val rows = rows0.distinctBy(_._1)
      if (rows.nonEmpty) {
        val df = rows.toDF("id", "w")
        val out = Packing.packSequences(df, col("id"), col("w"), capacity = 64L, shards = 7)
          .collect()
          .map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("start_offset"), r.getAs[Long]("bin_id"), r.getAs[Long]("n_bins"))))
          .toMap
        var off = 0L
        rows.sortBy(_._1).foreach { case (id, w) =>
          val (so, bin, nb) = out(id)
          assert(so === off)
          assert(bin === so / 64)
          assert(nb === math.max(1L, (so + w - 1) / 64 - so / 64 + 1))
          off += w
        }
      }
    }
  }

  test("dedup verdicts are total, survivor-consistent, and keepers keep") {
    val s = spark; import s.implicits._
    // small alphabet → guaranteed exact and near collisions
    val textGen = Gen.listOfN(5, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    forAll(Gen.listOfN(12, textGen), n = 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = TextDedup.jaccardPairsFromRows(
        TextDedup.shingleRows(docs, col("doc_id"), col("text"), 3), 0.5)
      val out = TextDedup.dedupVerdicts(
        docs, col("doc_id"), TextAnalysis.fingerprint(col("text")), pairs)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(out.size === texts.size) // one verdict per doc
      out.foreach { case (id, (survivor, verdict)) =>
        assert(survivor <= id)
        assert((verdict == "keep") === (survivor == id))
        assert(out(survivor)._2 === "keep") // the survivor itself keeps
      }
    }
  }

  test("per-group top n-grams rank true counts, ranks dense from 1, counts non-increasing") {
    val s = spark; import s.implicits._
    val rowGen = for {
      g <- Gen.oneOf("en", "de")
      t <- Gen.listOfN(4, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))
    } yield (g, t)
    forAll(Gen.listOfN(10, rowGen), n = 5) { rows =>
      val df  = rows.toDF("lang", "text")
      val out = TextAnalysis.topNgramsPerGroup(df, col("lang"), col("text"), n = 2, k = 3)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      // true bigram counts per group, computed sequentially
      val truth = rows
        .flatMap { case (g, t) =>
          val ws = t.trim.split("\\s+").toSeq
          ws.sliding(2).filter(_.size == 2).map(bg => (g, bg.mkString(" ")))
        }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      out.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._4)
        assert(sorted.map(_._4).toSeq === (1 to sorted.length)) // dense ranks from 1
        assert(sorted.map(_._3).toSeq === sorted.map(_._3).sortBy(-_).toSeq) // non-increasing
        sorted.foreach { case (g, gram, cnt, _) => assert(truth((g, gram)) === cnt) }
      }
    }
  }

  test("drawdown two-pass peak equals the global running max for arbitrary walks and chunk sizes") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    forAll2(Gen.listOfN(120, Gen.chooseNum(-50, 50)), Gen.oneOf(3600L, 14400L, 86400L), n = 6) {
      (steps, chunkSecs) =>
        val rows = steps.zipWithIndex.map { case (d, i) =>
          ("S" + (i % 3), i.toLong * 1800, 100.0 + d)
        }
        val candles = rows.toDF("symbol", "bucket_start", "close")
        val two = graft.operators.Indicators.withDrawdown(
          candles, col("close"), col("bucket_start"),
          col("bucket_start") - pmod(col("bucket_start"), lit(chunkSecs)))
        val w = Window.partitionBy(col("symbol")).orderBy(col("bucket_start"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ref = candles.withColumn("p", max(col("close")).over(w))
        assert(
          two.join(ref, Seq("symbol", "bucket_start", "close"))
            .filter(col("running_peak") =!= col("p")).count() === 0)
    }
  }

  test("correlation matrix is symmetric under symbol relabeling and ±1 on affine series") {
    val s = spark; import s.implicits._
    forAll(Gen.listOfN(12, Gen.chooseNum(-1000, 1000)), n = 6) { xs =>
      val base = xs.zipWithIndex
      if (base.map(_._1).distinct.size > 1) { // non-constant
        val series = base.flatMap { case (x, i) =>
          Seq(("A", i.toLong, x / 100.0), ("B", i.toLong, (3 * x + 7) / 100.0),
            ("C", i.toLong, (-2 * x) / 100.0))
        }.toDF("symbol", "k", "x")
        val out = graft.operators.Indicators.correlationMatrix(series, col("k"), col("x"))
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
        assert(math.abs(out(("A", "B")) - 1.0) < 1e-9)
        assert(math.abs(out(("A", "C")) + 1.0) < 1e-9)
        assert(math.abs(out(("B", "C")) + 1.0) < 1e-9)
      }
    }
  }

  test("temperature sampling: rate 1 for the smallest source, monotone non-increasing in size") {
    val s = spark; import s.implicits._
    forAll(Gen.listOfN(3, Gen.chooseNum(10, 300)), n = 6) { sizes =>
      val docs = sizes.zipWithIndex.flatMap { case (n, gi) =>
        (1 to n).map(i => (s"src$gi", gi * 100000L + i))
      }.toDF("source", "doc_id")
      val rates = graft.operators.Profile.temperatureSample(docs, col("source"), col("doc_id"))
        .groupBy("source").agg(min("sample_rate_bps").as("bps"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bySize = sizes.zipWithIndex.sortBy(_._1)
      assert(rates(s"src${bySize.head._2}") === 10000L)
      bySize.sliding(2).foreach {
        case Seq((n1, g1), (n2, g2)) =>
          if (n1 != n2) assert(rates(s"src$g1") >= rates(s"src$g2"))
        case _ =>
      }
    }
  }

  test("as-of backward/forward equal the brute-force per-row definition on random inputs") {
    val s = spark; import s.implicits._
    import graft.operators.AsOfJoin
    val genTimes = Gen.listOfN(15, Gen.chooseNum(0L, 40L))
    forAll2(genTimes, genTimes, n = 6) { (lts, rts) =>
      val left = lts.zipWithIndex.map { case (t, i) => (i.toLong, "K" + (i % 2), t) }
        .toDF("lid", "k", "t")
      val right = rts.zipWithIndex.map { case (t, i) => ("K" + (i % 2), t, i.toLong, t * 2.0) }
        .toDF("k", "t", "ver", "v")
      // brute-force reference maps
      val L = lts.zipWithIndex.map { case (t, i) => (i.toLong, "K" + (i % 2), t) }
      val R = rts.zipWithIndex.map { case (t, i) => ("K" + (i % 2), t, i.toLong, t * 2.0) }
      val back = AsOfJoin.backward(
        left, right, col("k"), col("t"), col("t"), col("ver"),
        payload = Seq("rv" -> col("v"))).collect()
        .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("rv"))).toMap
      val fwd = AsOfJoin.forward(
        left, right, col("k"), col("t"), col("t"), col("ver"),
        payload = Seq("rv" -> col("v"))).collect()
        .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("rv"))).toMap
      L.foreach { case (lid, k, lt) =>
        // backward: latest rt <= lt; ties by (rt, ver) greatest
        val bexp = R.filter(r => r._1 == k && r._2 <= lt).sortBy(r => (r._2, r._3)).lastOption.map(_._4)
        assert(back(lid) === bexp, s"backward lid=$lid")
        // forward: earliest rt >= lt; ties by (rt, ver) least
        val fexp = R.filter(r => r._1 == k && r._2 >= lt).sortBy(r => (r._2, r._3)).headOption.map(_._4)
        assert(fwd(lid) === fexp, s"forward lid=$lid")
      }
    }
  }

  test("starContract labels equal a local union-find on random graphs") {
    val s = spark; import s.implicits._
    forAll(Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 25L))), n = 6) { edges =>
      if (edges.nonEmpty) {
        val pairs = edges.toDF("doc_a", "doc_b")
        val labels = graft.operators.TextDedup.dedupClusters(pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // local union-find reference
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val expect = nodes
          .map(n => n -> nodes.filter(m => find(m) == find(n)).min)
          .toMap
        assert(labels.keySet === nodes.toSet)
        nodes.foreach(n => assert(labels(n) === expect(n), s"node $n"))
      }
    }
  }

  test("Det sums are invariant under repartitioning for arbitrary doubles") {
    val s = spark; import s.implicits._
    forAll(Gen.listOfN(50, Gen.chooseNum(-1e6, 1e6))) { xs =>
      if (xs.nonEmpty) {
        val df = xs.toDF("x")
        val a = df.repartition(1).agg(Det.dsum(col("x"))).collect().head.getDouble(0)
        val b = df.repartition(13).agg(Det.dsum(col("x"))).collect().head.getDouble(0)
        assert(a === b)
      }
    }
  }

  test("unimax allocation: within caps, within budget, capped groups form the ascending prefix") {
    val s = spark; import s.implicits._
    val gGroups = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 500L)))
    forAll2(gGroups, Gen.chooseNum(100L, 3000L), n = 8) { (sizes, budget) =>
      val docs = sizes.zipWithIndex
        .map { case (w, i) => (i.toLong, s"g$i", w) }
        .toDF("doc_id", "g", "w")
      val out = graft.operators.Profile
        .unimaxPlan(docs, col("g"), col("w"), budget, epochCapX1000 = 2500L)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
      // every alloc within its epoch cap and non-negative
      out.foreach { case (g, n, _, alloc) =>
        assert(alloc >= 0L && alloc <= n * 2500L / 1000L, s"$g alloc=$alloc n=$n")
      }
      // total never exceeds the budget
      assert(out.map(_._4).sum <= budget)
      // capped groups are a prefix of the ascending-size order, and all
      // uncapped groups receive the same floor share
      val asc = out.sortBy(r => (r._2, r._1))
      val firstUncapped = asc.indexWhere(!_._3)
      if (firstUncapped >= 0) {
        assert(asc.drop(firstUncapped).forall(!_._3), "capped set not a prefix")
        assert(asc.drop(firstUncapped).map(_._4).distinct.size == 1, "uncapped shares differ")
      }
    }
  }

  test("SQ8 codes bounded to ±127, decode error within one quantization half-step") {
    val s = spark; import s.implicits._
    val gVecs = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.chooseNum(-0.6, 0.6))))
    forAll(gVecs, n = 6) { vs =>
      val embs = vs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val scales = graft.operators.Similarity.sqScales(embs)
      val sByDim = scales.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      graft.operators.Similarity.sqEncode(embs, scales).collect().foreach { r =>
        val (i, code, err) = (r.getInt(1), r.getLong(2), r.getLong(3))
        assert(math.abs(code) <= 127L, s"code $code out of int8 range")
        // |127·x − code·s| ≤ (s+1)/2 by round-half-away ⇒ err ≤ s/254 + 1
        assert(err * 254L <= sByDim(i) + 508L, s"err=$err s=${sByDim(i)}")
      }
    }
  }

  test("leakFreeSplit: co-survivor docs always share a split, equal to the survivor's own split") {
    val s = spark; import s.implicits._
    val gMap = Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 4L)))
    forAll(gMap, n = 8) { reps =>
      // doc i defers to survivor reps(i) (an id in 0..4)
      val survivors = reps.zipWithIndex
        .map { case (rep, i) => (i.toLong, rep) }
        .toDF("doc_id", "survivor_doc_id")
      val docs = reps.indices.map(_.toLong).toDF("doc_id")
      val out = graft.operators.Profile
        .leakFreeSplit(docs, col("doc_id"), survivors, 70, 15)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      val bySurvivor = out.values.groupBy(_._1)
      bySurvivor.foreach { case (sv, grp) =>
        assert(grp.map(_._2).toSet.size == 1, s"survivor $sv split not constant")
      }
      val direct = graft.operators.Profile
        .withSplit(reps.distinct.toDF("id"), col("id"), 70, 15)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out.values.foreach { case (sv, sp) => assert(direct(sv) == sp) }
    }
  }

  test("curriculumSchedule: phases balanced like ntile, (shard, pos) is a total order") {
    val s = spark; import s.implicits._
    forAll(Gen.chooseNum(4, 20), n = 6) { n =>
      val docs = (0 until n).map(i => (i.toLong, (i * 37 % 11).toDouble)).toDF("doc_id", "sc")
      val out = graft.operators.Profile
        .curriculumSchedule(docs, col("doc_id"), col("sc"), phases = 3, shards = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      assert(out.length == n)
      // ntile balance: phase sizes differ by at most one
      val sizes = out.groupBy(_._2).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
      // (shard, pos) unique; pos dense from 1 within each shard
      assert(out.map(r => (r._3, r._4)).distinct.length == n)
      out.groupBy(_._3).foreach { case (_, rows) =>
        assert(rows.map(_._4).sorted.toSeq == (1L to rows.size).toSeq)
      }
    }
  }

  test("sampleGate: deterministic per id, partition-invariant, pass fraction tracks rateBps") {
    val s = spark; import s.implicits._
    forAll(Gen.chooseNum(500, 9500), n = 5) { rate =>
      val ids = (0L until 2000L).toDF("id")
      def kept(parts: Int): Seq[Long] = ids.repartition(parts)
        .filter(graft.functions.Portable.sampleGate(col("id"), rate, "prop"))
        .collect().map(_.getLong(0)).sorted.toSeq
      val k1 = kept(1)
      assert(k1 == kept(7)) // a row's fate is a pure function of its id
      // md5 uniformity: observed rate within ±5 points of the target
      val obs = k1.size * 10000.0 / 2000
      assert(math.abs(obs - rate) < 500, s"rate=$rate observed=$obs")
    }
  }

  test("codebook state: merge of any random split == direct state; centroids match kmeans round") {
    val s = spark; import s.implicits._
    forAll(Gen.chooseNum(6, 24), n = 5) { n =>
      val embs = (0 until n).map { i =>
        (i.toLong, Array.tabulate(4)(d => ((i * 31 + d * 17) % 13 - 6) / 7.0f))
      }.toDF("vec_id", "embedding")
      val cb = graft.operators.Similarity.seedCentroids(embs, 2)
      def stateMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
      val full = stateMap(graft.operators.Similarity.codebookState(embs, cb))
      val merged = stateMap(graft.operators.Similarity.mergeCodebookStates(
        graft.operators.Similarity.codebookState(embs.filter(col("vec_id") % 3 === 0), cb),
        graft.operators.Similarity.mergeCodebookStates(
          graft.operators.Similarity.codebookState(embs.filter(col("vec_id") % 3 === 1), cb),
          graft.operators.Similarity.codebookState(embs.filter(col("vec_id") % 3 === 2), cb))))
      assert(merged == full)
    }
  }

  test("globalNtile is bit-equal to SQL ntile across adversarial shard boundaries") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Ranking
    // the three generator shapes target the sharding machinery's edges:
    //  - all-equal keys → every row lands in ONE shard (max skew);
    //  - N < buckets → the q = 0 degenerate tile arithmetic;
    //  - negative keys with ties → the (__lead - __min_k) shard shift.
    val keysGen = Gen.oneOf(
      Gen.chooseNum(5, 60).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-50L, 50L))),
      Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n, Gen.const(7L))),
      Gen.listOfN(3, Gen.chooseNum(-5L, 5L)))
    forAll2(keysGen, Gen.chooseNum(1, 13), n = 8) { (keys, buckets) =>
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "x")
      val got = Ranking.globalNtile(df, col("x"), Seq(col("id")), buckets, shards = 5)
        .select(col("id"), col("tile"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = df
        .withColumn("tile", ntile(buckets).over(Window.orderBy(col("x"), col("id"))))
        .select(col("id"), col("tile"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"buckets=$buckets keys=$keys")
    }
  }

  test("simhashProbeIndex at 8 bands equals exact brute-force hamming membership up to the pigeonhole bound") {
    val s = spark; import s.implicits._
    import graft.operators.TextDedup
    // random 64-bit fingerprints + bit-flipped perturbations: the
    // banded probe must return EXACTLY the brute-force pair set for
    // every maxHamming ≤ bands − 1 = 7 (the completeness guarantee)
    val gen = for {
      base  <- Gen.listOfN(6, Gen.long)
      flips <- Gen.listOfN(6, Gen.chooseNum(0, 9))
      t     <- Gen.chooseNum(0, 7)
    } yield (base, flips, t)
    forAll(gen, n = 8) { case (base, flips, t) =>
      val newSide = base.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val idxSide = base.zip(flips).zipWithIndex.map { case ((h, nf), i) =>
        // flip nf distinct deterministic bit positions
        val perturbed = (0 until nf).foldLeft(h)((acc, j) => acc ^ (1L << ((j * 7 + i) % 64)))
        (100L + i, perturbed)
      }
      val got = TextDedup.simhashProbeIndex(
        newSide.toDF("doc_id", "sh"), idxSide.toDF("doc_id", "sh"), t, bands = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (a, ha) <- newSide
        (b, hb) <- idxSide
        if java.lang.Long.bitCount(ha ^ hb) <= t
      } yield (a, b)).toSet
      assert(got === want, s"t=$t")
    }
  }

  test("bpePairCounts equals a local CODE-POINT count on random words, non-BMP included") {
    val s = spark; import s.implicits._
    // the non-ASCII entries pin the code-point contract: 🙂 (U+1F642,
    // a surrogate PAIR in the JVM string) must count as ONE character,
    // so "a🙂b" yields pairs a🙂 / 🙂b — a UTF-16-unit engine would
    // see three pairs and a torn surrogate
    val wordGen = Gen.listOfN(12, Gen.oneOf(
      "ab", "abc", "a", "banana", "xyzzy", "zz", "a🙂b", "🙂🙃", "é漢🙂", "🙂"))
    // sliding pairs over CODE POINTS, not UTF-16 units — the reference
    // the engine and the DuckDB oracle both implement
    def cpPairs(w: String): Seq[String] = {
      val cps = w.codePoints().toArray
      if (cps.length < 2) Nil
      else (0 until cps.length - 1).map(i => new String(cps, i, 2))
    }
    forAll(wordGen, n = 6) { words =>
      val docs = Seq(words.mkString(" ")).toDF("text")
      val out = TextAnalysis.bpePairCounts(docs, col("text"), k = 100)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val local = words
        .flatMap(cpPairs)
        .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      assert(out == local)
    }
  }

  test("canonicalUrl is IDEMPOTENT on random urls: canon(canon(u)) == canon(u)") {
    val s = spark; import s.implicits._
    val schemeGen = Gen.oneOf("http", "https", "HTTP", "Https", "ftp")
    val hostGen = for {
      name <- Gen.oneOf("x", "Www.Site", "api.EXAMPLE", "a-b.c")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
    } yield name + ".com" + port
    val pathGen  = Gen.oneOf("", "/", "/p", "/a/b.html")
    val queryGen = Gen.oneOf(
      "", "?b=2&a=1", "?utm_source=x", "?a=1&utm_campaign=c&b=2", "?gclid=g",
      "?gclid", "?utm_source&a=1")
    val fragGen  = Gen.oneOf("", "#f", "#a/b?c=1")
    // prefix includes the scheme-less and protocol-relative crawl-log
    // forms — idempotence must hold for every input shape
    val prefixGen = schemeGen.flatMap(sc => Gen.oneOf(s"$sc://", "", "//"))
    val urlGen = for {
      pre <- prefixGen; h <- hostGen; p <- pathGen; q <- queryGen; f <- fragGen
    } yield s"$pre$h$p$q$f"
    forAll(Gen.listOfN(8, urlGen), n = 12) { urls =>
      if (urls.nonEmpty) {
        val out = urls.toDF("url")
          .select(
            TextAnalysis.canonicalUrl(col("url")).as("c1"),
            TextAnalysis.canonicalUrl(TextAnalysis.canonicalUrl(col("url"))).as("c2"))
          .collect()
        out.foreach(r => assert(r.getString(0) === r.getString(1),
          s"not idempotent for some of $urls"))
      }
    }
  }

  test("snapshot diff matches the reference map computation for arbitrary snapshot pairs") {
    val s = spark; import s.implicits._
    val entryGen = for {
      id <- Gen.chooseNum(0L, 19L)
      p  <- Gen.option(Gen.oneOf("a", "b", "c"))
    } yield (id, p)
    val snapGen = Gen.listOfN(12, entryGen).map(_.toMap) // map: last wins → unique ids
    forAll2(snapGen, snapGen, n = 12) { (o, nw) =>
      val odf = o.toSeq.toDF("id", "p")
      val ndf = nw.toSeq.toDF("id", "p")
      val got = graft.operators.Snapshot.diff(odf, ndf, col("id"), col("p"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = (o.keySet ++ nw.keySet).map { id =>
        id -> ((o.get(id), nw.get(id)) match {
          case (None, Some(_))          => "added"
          case (Some(_), None)          => "removed"
          case (Some(a), Some(b))       => if (a == b) "unchanged" else "changed"
          case (None, None)             => fail("unreachable")
        })
      }.toMap
      assert(got === want)
      // worklist ⊆ diff: exactly the added/changed ids, with the NEW payload
      val wl = graft.operators.Snapshot.deltaWorklist(odf, ndf, col("id"), col("p"))
        .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toMap
      val wantWl = want.collect {
        case (id, st) if st == "added" || st == "changed" => id -> nw(id)
      }
      assert(wl === wantWl)
    }
  }

  test("distributionDrift shares sum to ~1e6 per snapshot and deltas are symmetric-abs") {
    val s = spark; import s.implicits._
    val bucketGen = Gen.listOfN(30, Gen.chooseNum(0L, 4L))
    forAll2(bucketGen, bucketGen, n = 10) { (a, b) =>
      if (a.nonEmpty && b.nonEmpty) {
        val drift = graft.operators.Snapshot
          .distributionDrift(a.toDF("b"), b.toDF("b"), col("b"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        // integer-floor shares: each side sums into (1e6 - |buckets|, 1e6]
        val sumOld = drift.map(_._2).sum
        val sumNew = drift.map(_._3).sum
        assert(sumOld <= 1000000L && sumOld > 1000000L - drift.length)
        assert(sumNew <= 1000000L && sumNew > 1000000L - drift.length)
        drift.foreach { case (_, o, n2, d) => assert(d === math.abs(n2 - o)) }
      }
    }
  }

  test("spanSurgery ledger invariants on random corpora: keeper-of-all cuts nothing, removal bounded, kept = total - removed") {
    val s = spark; import s.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.chooseNum(6, 20).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(Gen.listOfN(6, docGen), n = 8) { texts =>
      if (texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val out = TextAnalysis.spanSurgery(docs, col("doc_id"), col("text")).collect()
        assert(out.length === texts.length) // one ledger row per doc
        out.foreach { r =>
          val (nt, rem, kept) = (r.getAs[Long]("n_tokens"),
            r.getAs[Long]("words_removed"), r.getAs[Long]("words_kept"))
          assert(rem >= 0L && rem <= nt, s"removal out of bounds: $rem of $nt")
          assert(kept === nt - rem)
        }
        // the global min doc id can never lose words to a LOWER keeper
        val minDoc = out.minBy(_.getAs[Long]("doc_id"))
        assert(minDoc.getAs[Long]("words_removed") === 0L)
      }
    }
  }

  test("cmsHeavyHitters: estimate >= exact on random corpora at any width; wide sketch is exact") {
    val s = spark; import s.implicits._
    val word = Gen.oneOf("t1", "t2", "t3", "t4", "t5", "t6", "t7", "t8")
    val docGen = Gen.chooseNum(1, 15).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll2(Gen.listOfN(5, docGen), Gen.chooseNum(1, 64), n = 8) { (texts, width) =>
      if (texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val out = TextAnalysis.cmsHeavyHitters(docs, col("doc_id"), col("text"),
          width = width, topN = 20).collect()
        out.foreach { r =>
          assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_count"))
          assert(r.getAs[Long]("overestimate") ===
            r.getAs[Long]("cms_estimate") - r.getAs[Long]("exact_count"))
        }
        // ≤8 distinct tokens in a 4096-bucket sketch: collisions in all
        // 4 depths are impossible → exact
        val wide = TextAnalysis.cmsHeavyHitters(docs, col("doc_id"), col("text"),
          width = 4096, topN = 20).collect()
        wide.foreach(r => assert(r.getAs[Long]("overestimate") === 0L))
      }
    }
  }

  test("marginMutualPairs: output is a partial matching (each id on each side appears at most once), margins positive") {
    val s = spark; import s.implicits._
    val comp = Gen.chooseNum(1, 100)
    val vecGen = Gen.listOfN(4, comp).map(_.map(_.toFloat / 100f))
    forAll(Gen.listOfN(10, vecGen), n = 8) { vecs =>
      if (vecs.size >= 4) {
        val embs = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
        val cb = graft.operators.Similarity.seedCentroids(embs, 2)
        val out = graft.operators.Similarity.marginMutualPairs(
          embs.filter(col("vec_id") % 2 === 0), embs.filter(col("vec_id") % 2 === 1), cb, k = 3)
          .collect()
        val as = out.map(_.getAs[Long]("a_id"))
        val bs = out.map(_.getAs[Long]("b_id"))
        assert(as.distinct.length === as.length, "an a_id paired twice")
        assert(bs.distinct.length === bs.length, "a b_id paired twice")
        assert(as.forall(_ % 2 === 0) && bs.forall(_ % 2 === 1))
        out.foreach { r =>
          assert(r.getAs[Long]("margin_ppm") > 0L)
          assert(r.getAs[Long]("cos_ppm") > 0L)
        }
      }
    }
  }
}
