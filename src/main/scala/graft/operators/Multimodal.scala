package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in BATCHES via
  * `mapPartitions` (the JVM analogue of a pandas batch UDF — one
  * decoder init per partition, rows processed in fixed-size batches).
  *
  * The actual byte decoding is a clearly-marked DETERMINISTIC STUB
  * (this container has no image/audio codecs): "decoded" features are
  * md5-derived from the payload, so the plumbing — schema, encoder
  * round-trip, batch shape, partition parallelism — is real and
  * oracle-checkable, while a production build swaps `decodeBatch`'s
  * body for a codec call with the same signature.
  *
  * Scale notes: payloads never leave their partition (no shuffle in
  * decode); batching bounds peak memory to batchSize·payload; the
  * output is columnar rows, not nested blobs, so downstream pruning
  * works. At 100 TB the input would be partitioned parquet with the
  * binary column in its own chunk — column pruning skips it unless
  * decode is requested.
  */
object Multimodal {

  /** Decoded-feature row produced by the stub decoder. */
  case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      feat_hash: Long)

  val BatchSize = 64

  /** Wrap a text table as a media table: payload = UTF-8 bytes,
    * format assigned deterministically by id (stands in for real
    * image/audio/video payload ingestion). */
  def asMediaTable(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("doc_id"),
      encode(text, "UTF-8").as("payload"),
      when(id % 3 === 0, "png").when(id % 3 === 1, "jpeg").otherwise("wav").as("format"))

  /** STUB decode of one batch — deterministic md5-derived features.
    * Production: replace body with a real codec (payload → pixels /
    * samples), keeping the batch-in/rows-out signature. */
  private def decodeBatch(batch: Seq[(Long, Array[Byte], String)]): Seq[MediaFeatures] = {
    val md = java.security.MessageDigest.getInstance("MD5") // one per batch, reset per row
    batch.map { case (id, bytes, fmt) =>
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val h   = java.lang.Long.parseLong(hex.take(15), 16)
      MediaFeatures(
        doc_id = id,
        format = fmt,
        n_bytes = bytes.length.toLong,
        width = 64L + h % 1217L,
        height = 64L + (h / 1217L) % 953L,
        n_frames = 1L + bytes.length.toLong / 256L,
        feat_hash = h)
    }
  }

  /** Batched decode over the media table: `mapPartitions` with
    * `grouped(BatchSize)` — the Spark-side shape a real decoder needs
    * (per-partition init, bounded batches, typed output encoder). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
      .toDF()
  }

  /** STUB resize: new dimensions fitting inside (maxW, maxH) with
    * aspect ratio preserved (integer arithmetic — exact on any
    * engine), plus the md5-derived "resized payload" hash a real
    * resizer would recompute. Same batched mapPartitions shape as
    * [[decodeFeatures]]; swap the hash line for a codec call in
    * production. */
  def resizeStub(decoded: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded
      .select(col("doc_id"), col("width"), col("height"), col("feat_hash"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, w, h, fh) =>
        // scale = min(maxW/w, maxH/h) in exact rational arithmetic:
        // compare maxW*h vs maxH*w to pick the binding dimension
        val (nw, nh) =
          if (maxW * h <= maxH * w) (maxW, maxW * h / w) // width binds
          else (maxH * w / h, maxH)                      // height binds
        val md  = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"${fh}_${nw}x$nh".getBytes("UTF-8")).map("%02x".format(_)).mkString
        (id, w, h, nw, nh, java.lang.Long.parseLong(hex.take(15), 16))
      }))
      .toDF("doc_id", "width", "height", "new_width", "new_height", "resized_hash")
  }

  /** Frame sampling: every `stride`-th frame index of each media item,
    * as (doc_id, frame_idx, frame_hash) rows — the exploded shape a
    * vision pipeline feeds to per-frame feature extraction. Pure
    * column expressions (sequence + explode), no decoder needed for
    * the index math; frame_hash stands in for frame bytes. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .select(
        col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))
      .withColumn(
        "frame_hash",
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("_"), col("frame_idx").cast("string"))), 1, 15), 16, 10)
          .cast("long"))
}
