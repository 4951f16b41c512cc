package graft.sinks

import org.apache.spark.sql.DataFrame

/** S14: job-completion notification sink — the engine replacement for
  * the reference's SNS publish (`etl/glue_job.py:283-317`): a
  * success/failure message built from the run's stats, published to a
  * pluggable transport. The TRANSPORT is the injection point (SNS,
  * Slack, PagerDuty are HTTP posts behind one method); the library
  * ships a durable local file transport and an stderr logger, which is
  * what an offline build can honestly provide.
  *
  * Scale note: notification runs ONCE per job on the driver with a
  * one-row stats aggregate — never per partition, never per row; a
  * transport outage must not fail the job (publish errors are returned,
  * not thrown — the reference logs-and-continues the same way).
  */
object Notify {

  /** One notification transport. */
  trait Notifier {
    def publish(subject: String, message: String): Unit
  }

  /** Durable local transport: one timestamped file per notification
    * under `dir` (the offline stand-in for an SNS topic — same
    * at-least-once, fire-and-forget contract). */
  final class FileNotifier(dir: String) extends Notifier {
    override def publish(subject: String, message: String): Unit = {
      val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      val name = s"notify_${System.nanoTime()}.txt"
      java.nio.file.Files.write(
        d.resolve(name), s"Subject: $subject\n\n$message".getBytes("UTF-8"))
    }
  }

  /** Log-only transport (default for ad-hoc runs). */
  final class LogNotifier extends Notifier {
    override def publish(subject: String, message: String): Unit =
      System.err.println(s"[notify] $subject\n$message")
  }

  /** Success message from the run-metadata row
    * ([[graft.ohlcv.Storage.runMetadata]]) — field-for-field the
    * reference's success body (records, symbols, time, resolution). */
  def completionMessage(stats: DataFrame, resolution: String, nowIso: String): (String, String) = {
    val row = stats.select("total_records", "distinct_symbols").head()
    val msg =
      s"""ETL processing completed successfully.
         |
         |Statistics:
         |- Total records processed: ${row.getLong(0)}
         |- Symbols processed: ${row.getLong(1)}
         |- Processing time: $nowIso
         |- Resolution: $resolution""".stripMargin
    ("Graft ETL Job - Success", msg)
  }

  def failureMessage(error: Throwable, nowIso: String): (String, String) =
    ("Graft ETL Job - FAILURE",
      s"""ETL processing failed at $nowIso
         |
         |Error: ${error.getMessage}""".stripMargin)

  /** Run `job`, then publish success (with stats computed from the
    * job's output) or failure. The job's outcome is authoritative:
    * publish errors are swallowed (the reference try/excepts around
    * `sns_client.publish` identically), and a failed job still
    * rethrows AFTER the failure notification. The stats computation
    * itself — the FIRST Spark action when `job` builds a lazy frame —
    * is inside the failure scope too: an executor-side error surfacing
    * there is exactly the ETL failure this sink exists to report. */
  def withCompletionNotify[A](
      notifier: Notifier,
      statsOf: A => DataFrame,
      resolution: String,
      nowIso: String = java.time.Instant.now().toString)(job: => A): A =
    try {
      val out = job
      val (subj, msg) = completionMessage(statsOf(out), resolution, nowIso)
      try notifier.publish(subj, msg) catch { case _: Throwable => () }
      out
    } catch {
      case e: Throwable =>
        val (subj, msg) = failureMessage(e, nowIso)
        try notifier.publish(subj, msg) catch { case _: Throwable => () }
        throw e
    }
}
