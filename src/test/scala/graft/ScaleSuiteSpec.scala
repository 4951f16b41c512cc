package graft

/** The scale-suite PROTOCOL, pinned at sf0.001 so the ×100 artifact's
  * shape is spec-guaranteed, not operator lore: exclusions echoed in
  * the output, per-chunk shared-artifact release actually releasing,
  * and the failure protocol — an ordinary throwing query records −1
  * and the run continues; a fatal (VirtualMachineError) taints the
  * whole remainder; every −1 run emits the EXACT recovery command. */
class ScaleSuiteSpec extends SparkSpec {

  /** The STRING value of a top-level field (recovery/fatal carry no
    * embedded double quotes by construction — both are '-escaped). */
  private def field(json: String, key: String): String =
    (s""""$key":"([^"]*)"""").r.findFirstMatchIn(json)
      .map(_.group(1))
      .getOrElse(fail(s"string field $key missing in: ${json.take(400)}"))

  test("clean subset run: exclusions echoed, per-chunk artifact release > 0, recovery null") {
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    // q33 consumes the DirCached shared signature artifact — the chunk
    // boundary must actually release it (the 24 GB heap law's mechanism)
    val line = ScaleSuite.run(
      spark, sf("sf0.001"), chunkSize = 1,
      only = Set("q01_pricing_summary", "q33_minhash_lsh_pairs"),
      queries = SparkEntry.queries, log = logs += _)
    assert(line.contains(""""n_attempted":2""") && line.contains(""""n_complete":2"""), line)
    assert(line.contains(""""failed":[]"""), line)
    assert(line.contains(""""recovery":null"""), line)
    assert(line.contains(""""fatal":null"""), line)
    // every exclusion is echoed with its reason
    ScaleSuite.Exclusions.foreach { case (name, _) =>
      assert(line.contains(s""""$name":"""), s"exclusion $name not echoed")
    }
    // at least one chunk released a shared artifact
    val released = logs.map(l =>
      """"artifacts_released":(\d+)""".r.findFirstMatchIn(l).map(_.group(1).toInt).getOrElse(0))
    assert(logs.size === 2, logs.mkString("\n"))
    assert(released.exists(_ > 0), s"no chunk released a shared artifact: $logs")
  }

  test("ordinary throwing query: -1 recorded, the run continues, and the recovery field is the exact subset re-run command") {
    val qs = SparkEntry.queries +
      ("q000_boom" -> ((_: org.apache.spark.sql.SparkSession, _: String) =>
        throw new RuntimeException("injected")))
    val line = ScaleSuite.run(
      spark, sf("sf0.001"), chunkSize = 10,
      only = Set("q000_boom", "q01_pricing_summary"), queries = qs, log = _ => ())
    // q000_boom sorts first: the later query still ran clean
    assert(line.contains(""""q000_boom":-1"""), line)
    assert(line.contains(""""n_complete":1""") && line.contains(""""n_attempted":2"""), line)
    assert(line.contains(""""failed":["q000_boom"]"""), line)
    assert(line.contains(""""fatal":null"""), line)
    val rec = field(line, "recovery")
    assert(rec.contains("runMain graft.ScaleSuite") && rec.contains("q000_boom") &&
      rec.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS="), rec.take(300))
    assert(!rec.contains("q01_pricing_summary"), "recovery must list only the -1 rows")
  }

  test("fatal (VirtualMachineError): the remainder of the run is tainted — recorded -1 unattempted, fatal named, recovery lists everything") {
    var laterRan = false
    val qs = SparkEntry.queries +
      ("q000_oom" -> ((_: org.apache.spark.sql.SparkSession, _: String) =>
        throw new OutOfMemoryError("injected"))) +
      ("q999_later" -> ((s: org.apache.spark.sql.SparkSession, _: String) => {
        laterRan = true; s.range(1).toDF()
      }))
    val line = ScaleSuite.run(
      spark, sf("sf0.001"), chunkSize = 10,
      only = Set("q000_oom", "q999_later"), queries = qs, log = _ => ())
    assert(!laterRan, "a query ran AFTER a fatal — post-OOM timings would be garbage")
    assert(line.contains(""""n_complete":0"""), line)
    val fatal = field(line, "fatal")
    assert(fatal.contains("OutOfMemoryError") && fatal.contains("q000_oom"), fatal.take(200))
    val rec = field(line, "recovery")
    assert(rec.contains("q000_oom") && rec.contains("q999_later"), rec.take(300))
  }

  test("--include-excluded lifts the list explicitly: an excluded query runs, the lift is echoed, recovery keeps the flag") {
    val line = ScaleSuite.run(
      spark, sf("sf0.001"), chunkSize = 10,
      only = Set("q35_simhash_pairs"), queries = SparkEntry.queries, log = _ => (),
      includeExcluded = true)
    assert(line.contains(""""q35_simhash_pairs":"""), line.take(300))
    assert(line.contains(""""n_complete":1"""), line.take(300))
    assert(line.contains(""""exclusions_lifted":true"""), line.take(300))
    // the copy-fixture protocol line must carry the negative marker
    val strict = ScaleSuite.run(
      spark, sf("sf0.001"), chunkSize = 10,
      only = Set("q01_pricing_summary"), queries = SparkEntry.queries, log = _ => ())
    assert(strict.contains(""""exclusions_lifted":false"""), strict.take(300))
    // a lifted run that fails must emit a recovery command that is
    // itself lifted — otherwise the re-run would refuse the names
    val qs = SparkEntry.queries +
      ("q000_boom" -> ((_: org.apache.spark.sql.SparkSession, _: String) =>
        throw new RuntimeException("injected")))
    val failedLine = ScaleSuite.run(
      spark, sf("sf0.001"), chunkSize = 10,
      only = Set("q000_boom"), queries = qs, log = _ => (), includeExcluded = true)
    assert(field(failedLine, "recovery").contains("--include-excluded"),
      field(failedLine, "recovery"))
  }

  test("a subset cannot smuggle an excluded query back in, and unknown names fail loudly") {
    val e = intercept[IllegalArgumentException](ScaleSuite.run(
      spark, sf("sf0.001"), 10, Set("q99_prefix_jaccard"), SparkEntry.queries, _ => ()))
    assert(e.getMessage.contains("excluded"), e.getMessage)
    val u = intercept[IllegalArgumentException](ScaleSuite.run(
      spark, sf("sf0.001"), 10, Set("q_nope"), SparkEntry.queries, _ => ()))
    assert(u.getMessage.contains("q_nope"), u.getMessage)
  }
}
