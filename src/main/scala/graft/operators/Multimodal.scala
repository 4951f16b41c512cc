package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in BATCHES via
  * `mapPartitions` (the JVM analogue of a pandas batch UDF — one
  * decoder init per partition, rows processed in fixed-size batches).
  *
  * The IMAGE path is REAL: payloads are PNG bytes, decoded with
  * `javax.imageio` (public JDK stdlib) — [[decodeImages]] reads actual
  * pixels out of the compressed stream and [[resizeImages]] resamples
  * them. Correctness is oracle-checkable because the test fixtures are
  * generated from a closed-form manifest ([[syntheticImages]]): DuckDB
  * recomputes the expected dimensions and pixel hash from the formula,
  * and PNG being lossless, a correct encode→decode round trip matches
  * bit-for-bit.
  *
  * The AUDIO path is REAL too: payloads are complete RIFF/WAVE files,
  * decoded with `javax.sound.sampled` (the JDK's WAV codec) —
  * [[decodeAudioFrames]] reads actual PCM16 samples out of the
  * container and computes per-frame energies from them, with the same
  * closed-form-manifest trick ([[syntheticAudio]]) making the round
  * trip oracle-checkable.
  *
  * VIDEO is REAL too since round 10 ([[syntheticVideo]] /
  * [[decodeVideoFrames]]): RIFF/AVI containers with PNG-coded frames
  * ("MPNG" — the JDK decodes each frame losslessly), parsed by a
  * genuine chunk walker. [[decodeFeatures]] remains as the GENERIC
  * deterministic stub decoder (mixed-format metadata extraction with
  * the batch-in/rows-out shape any codec drops into) — it is no
  * longer the video story, just the catch-all.
  *
  * Scale notes: payloads never leave their partition (no shuffle in
  * decode); batching bounds peak memory to batchSize·payload; the
  * output is columnar rows, not nested blobs, so downstream pruning
  * works. At 100 TB the input would be partitioned parquet with the
  * binary column in its own chunk — column pruning skips it unless
  * decode is requested.
  */
object Multimodal {

  /** Decoded-feature row produced by the stub (audio/video) decoder. */
  case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      feat_hash: Long)

  /** Decoded-image row: dimensions as reported by the PNG decoder and
    * a position-sensitive pixel hash over the decoded raster. */
  case class ImageFeatures(
      doc_id: Long,
      format: String,
      width: Long,
      height: Long,
      pixel_sum: Long)

  val BatchSize = 64

  // ---------------------------------------------------------------
  // Real image path (javax.imageio)
  // ---------------------------------------------------------------

  /** Deterministic grayscale test image for `id`: the FIXTURE MANIFEST.
    *   width  = 4 + id mod 13   (4..16)
    *   height = 3 + id mod 11   (3..13)
    *   pixel(x, y) = (id·31 + x·7 + y·13) mod 256
    * Every number below is recomputable in SQL, which is what lets the
    * DuckDB oracle check a real codec round trip. */
  def manifestDims(id: Long): (Int, Int) = ((4 + id % 13).toInt, (3 + id % 11).toInt)
  def manifestPixel(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt

  private def encodePng(id: Long): Array[Byte] = {
    val (w, h) = manifestDims(id)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, manifestPixel(id, x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** PNG-payload media table generated from the manifest — the local
    * stand-in for `spark.read.format("binaryFile")` over an image
    * corpus. Encoding runs distributed (mapPartitions, no shuffle);
    * at scale this stage is replaced by reading real files and the
    * decode/resize operators below are unchanged. */
  def syntheticImages(docs: DataFrame, id: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(id.as("doc_id"))
      .as[Long]
      .mapPartitions(_.map(i => (i, encodePng(i))))
      .toDF("doc_id", "payload")
  }

  /** Position-sensitive raster hash over ALL bands:
    * Σ_b Σ_{x,y} pixel_b(x,y)·(b·W·H + y·W + x + 1) — a permutation-
    * detecting checksum cheap to mirror in SQL; for a grayscale image
    * (1 band, the fixture manifest) it reduces to
    * Σ p(x,y)·(y·W + x + 1). Multi-band PNGs (RGB/RGBA) hash every
    * channel, so two images equal in one channel but not another never
    * collide. Exact in Long at any sane image size. */
  private def rasterSum(img: java.awt.image.BufferedImage): Long = {
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val bands  = raster.getNumBands
    var acc = 0L
    var b = 0
    while (b < bands) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          acc += raster.getSample(x, y, b).toLong *
            (b.toLong * w * h + y.toLong * w + x + 1)
          x += 1
        }
        y += 1
      }
      b += 1
    }
    acc
  }

  private val PngMagic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)

  /** REAL batched image decode: `javax.imageio` reads the compressed
    * PNG stream back into pixels; format comes from magic-byte
    * sniffing, dimensions from the decoder, and the pixel hash from
    * the decoded raster — nothing is derived from the input bytes'
    * hash. Batched `mapPartitions`, one in-memory codec (no disk
    * cache) per partition; a corrupt payload throws with the doc id
    * rather than silently skewing the corpus. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
          val fmt =
            if (bytes.length >= 4 && bytes.take(4).sameElements(PngMagic)) "png" else "unknown"
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for doc_id=$id")
          ImageFeatures(id, fmt, img.getWidth.toLong, img.getHeight.toLong, rasterSum(img))
        })
      }
      .toDF()
  }

  /** REAL image resize: decode, aspect-fit into (maxW, maxH) with
    * exact integer arithmetic, then NEAREST-NEIGHBOR resample the
    * decoded raster — src = (x'·W div NW, y'·H div NH) — and hash the
    * resized pixels. Deterministic on any JVM (no float filtering),
    * so the oracle mirrors the same mapping in SQL. Same batched
    * per-partition shape as [[decodeImages]]. */
  def resizeImages(media: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    require(maxW > 0 && maxH > 0, s"target box must be positive: ${maxW}x$maxH")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for doc_id=$id")
          val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
          // scale = min(maxW/w, maxH/h) via cross-multiplication; the
          // non-binding dimension floors but never to 0 (max(1, ·))
          val (nw, nh) =
            if (maxW * h <= maxH * w) (maxW, math.max(1L, maxW * h / w))
            else (math.max(1L, maxH * w / h), maxH)
          val raster = img.getRaster
          val bands  = raster.getNumBands
          var acc = 0L
          var b = 0
          while (b < bands) {
            var y = 0L
            while (y < nh) {
              var x = 0L
              while (x < nw) {
                val p = raster.getSample((x * w / nw).toInt, (y * h / nh).toInt, b)
                acc += p.toLong * (b * nw * nh + y * nw + x + 1)
                x += 1
              }
              y += 1
            }
            b += 1
          }
          (id, w, h, nw, nh, acc)
        })
      }
      .toDF("doc_id", "width", "height", "new_width", "new_height", "resized_sum")
  }

  /** Perceptual average-hash (aHash) of each image — the 64-bit
    * fingerprint image DEDUP rides: decode, block-average the luma
    * into an 8×8 grid, threshold each cell against the grid mean
    * (strict >, ties → 0), bit k = cell (k div 8, k mod 8). Exact
    * integer arithmetic end to end (block sums, integer div means),
    * so the hash is bit-identical on any JVM and partitioning — two
    * re-encodes of the same pixels collide, and small perturbations
    * (brightness touch-ups, single-pixel edits) land within a few
    * bits. Output (doc_id, sh) plugs straight into
    * [[TextDedup.simhashPairsFromHashes]] — the banded hamming join
    * (never all-pairs) is SHARED between text simhash and image aHash,
    * one pair machinery for both modalities.
    *
    * Public technique: average hash as popularized by the pHash
    * family (Zauner '10, "Implementation and Benchmarking of
    * Perceptual Image Hash Functions"). Batched `mapPartitions` like
    * every codec path here — the one place Catalyst can't go. */
  def aHash64(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for doc_id=$id")
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          val bands  = raster.getNumBands
          // 8×8 block means in exact ints; blocks never empty (the
          // max(lo+1, ·) bound nearest-neighbors images smaller than 8)
          val cell = new Array[Long](64)
          var gy = 0
          while (gy < 8) {
            val y0 = gy * h / 8; val y1 = math.max(y0 + 1, (gy + 1) * h / 8)
            var gx = 0
            while (gx < 8) {
              val x0 = gx * w / 8; val x1 = math.max(x0 + 1, (gx + 1) * w / 8)
              var sum = 0L; var n = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  // luma = mean over bands (grayscale: the band itself)
                  var b = 0; var p = 0L
                  while (b < bands) { p += raster.getSample(x, y, b); b += 1 }
                  sum += p / bands; n += 1
                  x += 1
                }
                y += 1
              }
              cell(gy * 8 + gx) = sum / n
              gx += 1
            }
            gy += 1
          }
          val mean = cell.sum / 64
          var sh = 0L; var k = 0
          while (k < 64) { if (cell(k) > mean) sh |= (1L << k); k += 1 }
          (id, sh)
        })
      }
      .toDF("doc_id", "sh")
  }

  /** Image near-duplicate candidate pairs at hamming ≤ `maxHamming`
    * over [[aHash64]] fingerprints — [[TextDedup.simhashPairsFromHashes]]'
    * pigeonhole band join, so cost is banded, never corpus². The
    * verdict/keeper/cluster machinery downstream is the same one text
    * dedup uses ([[TextDedup.dedupVerdicts]]). */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int): DataFrame =
    TextDedup.simhashPairsFromHashes(aHash64(media), maxHamming, bands = 8)

  // ---------------------------------------------------------------
  // Stub audio/video path (no codec in this container)
  // ---------------------------------------------------------------

  /** Wrap a text table as a media table: payload = UTF-8 bytes,
    * format assigned deterministically by id (stands in for real
    * audio/video payload ingestion). */
  def asMediaTable(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("doc_id"),
      encode(text, "UTF-8").as("payload"),
      when(id % 3 === 0, "mp4").when(id % 3 === 1, "mkv").otherwise("wav").as("format"))

  /** STUB decode of one batch — deterministic md5-derived features.
    * Production: replace body with a real codec (payload → samples /
    * frames), keeping the batch-in/rows-out signature. */
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

  /** Batched STUB decode over the audio/video media table:
    * `mapPartitions` with `grouped(BatchSize)` — the Spark-side shape
    * a real decoder needs (per-partition init, bounded batches, typed
    * output encoder). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
      .toDF()
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
      .withColumn("frame_hash", frameHash(col("doc_id"), col("frame_idx")))

  /** ONE definition of the stub per-frame hash (md5 60-bit of
    * "docId_frameIdx") — shared by [[sampleFrames]] and
    * [[vadSegments]] so frame-level consumers can never diverge. */
  private def frameHash(docId: Column, frameIdx: Column): Column =
    conv(substring(md5(concat(docId.cast("string"), lit("_"), frameIdx.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  // ---------------------------------------------------------------
  // Real audio path (javax.sound.sampled — the JDK's WAV codec)
  // ---------------------------------------------------------------

  /** Decoded per-frame audio row: exact integer mean-square energy of
    * one `AudioFrameLen`-sample frame, from REAL decoded PCM. */
  case class AudioFrame(doc_id: Long, n_frames: Long, frame_idx: Long, rms_sq: Long)

  /** Samples per analysis frame (20 ms at the 8 kHz manifest rate). */
  val AudioFrameLen = 160

  /** Deterministic audio FIXTURE MANIFEST (the PNG trick, cited at
    * [[manifestDims]], applied to WAV): clip `id` is PCM16 mono 8 kHz,
    *   frames  = 3 + id mod 11                    (3..13)
    *   amp(f)  = (id·37 + f·101) mod 1000         per-frame amplitude
    *   sample(f, j) = ±amp(f), sign alternating per sample
    * so each frame's mean-square energy is EXACTLY amp², an integer
    * DuckDB recomputes from the formula — which is what lets a real
    * codec round trip (encode → RIFF/WAVE container → decode → frame
    * energies) be oracle-checked bit-for-bit. */
  def audioManifestFrames(id: Long): Int = (3 + id % 11).toInt
  def audioManifestAmp(id: Long, f: Long): Int = ((id * 37 + f * 101) % 1000).toInt

  private def encodeWav(id: Long): Array[Byte] = {
    val nF = audioManifestFrames(id)
    val n  = nF * AudioFrameLen
    val pcm = new Array[Byte](n * 2)
    var f = 0
    while (f < nF) {
      val a = audioManifestAmp(id, f.toLong)
      var j = 0
      while (j < AudioFrameLen) {
        val s = if (j % 2 == 0) a else -a
        val k = (f * AudioFrameLen + j) * 2
        pcm(k) = (s & 0xff).toByte
        pcm(k + 1) = ((s >> 8) & 0xff).toByte
        j += 1
      }
      f += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL WAV-payload media table generated from the audio manifest —
    * the audio sibling of [[syntheticImages]]: every payload is a
    * complete RIFF/WAVE file (44-byte header + PCM16 data) built by
    * the JDK's audio writer. Distributed, no shuffle; at scale this
    * stage is `binaryFile` reads of a real clip corpus and the decode
    * below is unchanged. */
  def syntheticAudio(docs: DataFrame, id: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(id.as("doc_id"))
      .as[Long]
      .mapPartitions(_.map(i => (i, encodeWav(i))))
      .toDF("doc_id", "payload")
  }

  /** REAL batched audio decode: `javax.sound.sampled.AudioSystem`
    * parses the RIFF/WAVE container (format chunk → sample layout,
    * data chunk → PCM bytes) and the per-frame mean-square energy is
    * computed from the DECODED int16 samples — nothing is derived
    * from the payload's hash. One row per `AudioFrameLen`-sample
    * frame (a trailing partial frame is dropped, the standard
    * frame-analysis convention); `n_frames` rides every row so
    * downstream segmentation never joins back to the media table.
    * Batched `mapPartitions` like [[decodeImages]]; a corrupt payload
    * throws with the doc id rather than silently skewing the corpus. */
  def decodeAudioFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeWavBatch))
      .toDF()
  }

  private def decodeWavBatch(batch: Seq[(Long, Array[Byte])]): Seq[AudioFrame] =
    batch.flatMap { case (id, bytes) =>
      val pcm =
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          require(
            fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
            s"unsupported wav layout: $fmt")
          in.readAllBytes()
        } catch {
          case e: Exception =>
            throw new IllegalArgumentException(s"audio decode failed for doc $id", e)
        }
      val nFrames = (pcm.length / 2) / AudioFrameLen
      (0 until nFrames).map { f =>
        var acc = 0L
        var j = 0
        while (j < AudioFrameLen) {
          val k = (f * AudioFrameLen + j) * 2
          acc += {
            val s = (((pcm(k) & 0xff) | (pcm(k + 1) << 8)).toShort).toLong
            s * s
          }
          j += 1
        }
        AudioFrame(id, nFrames.toLong, f.toLong, acc / AudioFrameLen)
      }
    }

  // ---------------------------------------------------------------
  // Real video path (RIFF/AVI container, PNG-coded frames — the
  // "MPNG" FourCC: motion-PNG inside AVI, a real lossless codec the
  // JDK can decode frame-by-frame via ImageIO. Lossless matters: a
  // JPEG-coded frame would decode to codec-dependent pixels, killing
  // the closed-form oracle; PNG frames round-trip bit-exactly, the
  // same reason q40's image path uses PNG.)
  // ---------------------------------------------------------------

  /** Decoded per-frame video row: exact integer mean luma of one
    * decoded frame, from REAL container + image decode. */
  case class VideoFrame(doc_id: Long, n_frames: Long, frame_idx: Long, mean_luma: Long)

  /** Video fixture manifest (the PNG/WAV trick for moving pictures):
    * clip `id` has 2 + id mod 7 frames of 8×6 8-bit gray, pixel
    * (x, y) of frame f = (id·31 + f·17 + x·7 + y·13) mod 256 — so a
    * frame's mean luma is EXACTLY Σpixels div 48, an integer DuckDB
    * recomputes from the formula while the engine derives it from
    * container-parsed, PNG-decoded samples. */
  val VideoW = 8
  val VideoH = 6
  def videoManifestFrames(id: Long): Int = (2 + id % 7).toInt
  def videoManifestPixel(id: Long, f: Long, x: Int, y: Int): Int =
    ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }
  /** One RIFF chunk: fourcc + LE size + body (+ the RIFF odd-size pad). */
  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] = if (body.length % 2 == 1) Array(0.toByte) else Array.empty
    fourcc(id) ++ le32(body.length) ++ body ++ pad
  }
  private def riffList(kind: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fourcc(kind) ++ body)

  private def pngVideoFrame(
      id: Long, f: Int,
      pixel: (Long, Long, Int, Int) => Int = videoManifestPixel): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      VideoW, VideoH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < VideoH) {
      var x = 0
      while (x < VideoW) {
        img.getRaster.setSample(x, y, 0, pixel(id, f.toLong, x, y))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode clip `id` as a complete, structurally valid AVI: RIFF
    * 'AVI ' with an 'hdrl' list (avih main header + one 'vids'/'MPNG'
    * stream: strh + BITMAPINFOHEADER strf) and a 'movi' list of one
    * '00dc' chunk per PNG-coded frame. Every size field is real —
    * the decoder walks the chunks, it never assumes offsets. */
  private def encodeAvi(
      id: Long,
      pixel: (Long, Long, Int, Int) => Int = videoManifestPixel): Array[Byte] = {
    val n      = videoManifestFrames(id)
    val frames = (0 until n).map(pngVideoFrame(id, _, pixel))
    // AVIMAINHEADER (56 bytes = 14 LE dwords)
    val avih = riffChunk("avih",
      le32(100000) ++ le32(0) ++ le32(0) ++ le32(0) ++ // usec/frame, maxBps, padding, flags
        le32(n) ++ le32(0) ++ le32(1) ++ le32(0) ++    // totalFrames, initial, streams, bufSize
        le32(VideoW) ++ le32(VideoH) ++                // width, height
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))      // reserved[4]
    // AVISTREAMHEADER (56 bytes)
    val strh = riffChunk("strh",
      fourcc("vids") ++ fourcc("MPNG") ++ le32(0) ++ le32(0) ++ // type, handler, flags, prio+lang
        le32(0) ++ le32(1) ++ le32(10) ++ le32(0) ++            // initialFrames, scale, rate, start
        le32(n) ++ le32(0) ++ le32(0) ++ le32(0) ++             // length, bufSize, quality, sampleSize
        le32(0) ++ le32(0))                                     // rcFrame (4×16-bit)
    // BITMAPINFOHEADER (40 bytes), biCompression = 'MPNG'
    val strf = riffChunk("strf",
      le32(40) ++ le32(VideoW) ++ le32(VideoH) ++
        le32(1 | (8 << 16)) ++ fourcc("MPNG") ++ le32(0) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi", frames.flatMap(riffChunk("00dc", _)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** REAL AVI-payload media table from the video manifest — the video
    * sibling of [[syntheticImages]]/[[syntheticAudio]]: every payload
    * is a complete RIFF/AVI file with PNG-coded frames. Distributed,
    * no shuffle; at scale this stage is `binaryFile` reads of a real
    * clip corpus and the decode below is unchanged. */
  def syntheticVideo(docs: DataFrame, id: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(id.as("doc_id"))
      .as[Long]
      .mapPartitions(_.map(i => (i, encodeAvi(i))))
      .toDF("doc_id", "payload")
  }

  /** A hash-DIVERSE synthetic clip corpus for harnesses (YearSim's
    * veto-gate arm): the same container/codec path as
    * [[syntheticVideo]] — real RIFF/AVI, PNG-coded MPNG frames — but a
    * high-entropy mixed pixel formula. The manifest formula is LINEAR
    * in (x, y), so its keyframe aHash space saturates at ~48 distinct
    * values across ANY number of clips — perfect for dup-dense gate
    * fixtures, useless for simulating an index that must GROW for
    * years. NOT oracle-mirrored; the oracle-checked queries read
    * [[syntheticVideo]] only. */
  def syntheticVideoDiverse(docs: DataFrame, id: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mixed: (Long, Long, Int, Int) => Int = (i, f, x, y) => {
      var h = i * 0x9E3779B97F4A7C15L + f * 0xC2B2AE3D27D4EB4FL +
        x.toLong * 0x165667B19E3779F9L + y.toLong * 0x27D4EB2F165667C5L
      h ^= h >>> 29; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 32
      (h & 0xff).toInt
    }
    docs
      .select(id.as("doc_id"))
      .as[Long]
      .mapPartitions(_.map(i => (i, encodeAvi(i, mixed))))
      .toDF("doc_id", "payload")
  }

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rdFourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** REAL batched video decode: a genuine RIFF chunk walk — validate
    * `RIFF…AVI `, read the main header's frame count out of the
    * 'hdrl' list, collect every '00dc' payload from the 'movi' list
    * (skipping unknown chunks by their declared size + odd-byte pad,
    * never assuming offsets), decode each frame's PNG via ImageIO,
    * and emit its exact integer mean luma. The declared frame count
    * must match the frames found — a truncated container fails
    * loudly with the doc id, like the audio path. Batched
    * `mapPartitions`; one row per frame; `n_frames` rides every row
    * so downstream ops never join back to the media table. */
  def decodeVideoFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.grouped(BatchSize).flatMap(_.flatMap((decodeAviClip _).tupled))
      }
      .toDF()
  }

  /** The validated chunk walk shared by [[decodeVideoFrames]] and
    * [[videoKeyframes]]: every frame's PNG payload, in stream order,
    * with the declared-vs-found frame-count cross-check. */
  private def aviFramePayloads(id: Long, bytes: Array[Byte]): Seq[Array[Byte]] =
    try {
      require(bytes.length >= 12 && rdFourcc(bytes, 0) == "RIFF" &&
        rdFourcc(bytes, 8) == "AVI ", "not a RIFF/AVI container")
      val end = math.min(bytes.length.toLong, 8L + rdLe32(bytes, 4)).toInt
      var declaredFrames = -1
      val frames = Seq.newBuilder[Array[Byte]]
      // walk chunks at [off, limit); recurse into hdrl/movi lists
      def walk(off0: Int, limit: Int): Unit = {
        var off = off0
        while (off + 8 <= limit) {
          val cid  = rdFourcc(bytes, off)
          val size = rdLe32(bytes, off + 4)
          require(size >= 0 && off + 8 + size <= limit, s"chunk '$cid' overruns container")
          if (cid == "LIST") {
            val kind = rdFourcc(bytes, off + 8)
            if (kind == "hdrl" || kind == "movi" || kind == "strl")
              walk(off + 12, off + 8 + size)
          } else if (cid == "avih") {
            declaredFrames = rdLe32(bytes, off + 8 + 16) // dwTotalFrames
          } else if (cid == "00dc") {
            frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + size)
          } // anything else (strh/strf/idx1/JUNK…): skipped by size
          off += 8 + size + (size % 2) // RIFF pads odd chunks
        }
      }
      walk(12, end)
      val got = frames.result()
      require(declaredFrames >= 0, "missing avih main header")
      require(got.size == declaredFrames,
        s"container declares $declaredFrames frames, found ${got.size}")
      got
    } catch {
      case e: Exception =>
        throw new IllegalArgumentException(s"video decode failed for doc $id", e)
    }

  private def decodeAviClip(id: Long, bytes: Array[Byte]): Seq[VideoFrame] = {
    val got = aviFramePayloads(id, bytes)
    got.zipWithIndex.map { case (png, f) =>
      val img =
        try {
          val i = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          require(i != null, s"undecodable frame $f")
          i
        } catch {
          case e: Exception =>
            throw new IllegalArgumentException(s"video decode failed for doc $id", e)
        }
      val raster = img.getRaster
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      VideoFrame(id, got.size.toLong, f.toLong,
        sum / (img.getWidth.toLong * img.getHeight))
    }
  }

  /** Sampled KEYFRAME extraction — every `everyK`-th frame of each
    * clip, as a standalone IMAGE payload row (doc_id, n_frames,
    * frame_idx, payload). NO transcode happens: MPNG frames ARE
    * complete PNG streams, so extraction is a pure container walk and
    * the rows feed the image operators ([[aHash64]], [[decodeImages]])
    * unchanged — which is what makes CROSS-MODAL dedup (video stills
    * vs the image corpus, q209) one keyed join in the shared 64-bit
    * hamming space instead of a bespoke pipeline. Batched
    * `mapPartitions`, no shuffle; at scale the still payloads are a
    * tiny fraction of the clip bytes, so the keyframe relation is the
    * cheap side of every downstream join. */
  /** Stride of the PACKED keyframe id (`video_id·stride + frame_idx`)
    * that lets keyframe fingerprints ride the generic (doc_id, sh)
    * hamming machinery — [[keyframeId]] to pack,
    * [[keyframeVideoId]]/[[keyframeFrameIdx]] to decompose. The
    * synthetic manifest caps clips at 8 frames, but the operators are
    * general: packing a frame_idx ≥ stride would silently attribute a
    * near-dup to the WRONG video, so [[keyframeId]] fails loudly
    * instead. */
  val KeyframeIdStride = 16L

  /** Pack (video id, frame idx) into one id — fails loudly (not
    * silently corrupting) past the stride. */
  def keyframeId(videoId: Column, frameIdx: Column): Column =
    when(frameIdx < 0 || frameIdx >= KeyframeIdStride,
      raise_error(concat(
        lit(s"frame_idx outside the keyframe-id stride ($KeyframeIdStride): "),
        frameIdx.cast("string"),
        lit(" — sample with a larger everyK or widen KeyframeIdStride"))))
      .otherwise(videoId * KeyframeIdStride + frameIdx)

  /** Shift width of the power-of-two stride — the decompose runs in
    * pure INTEGER arithmetic (`shiftright` + `pmod`). Spark's `/` is
    * double division, which silently loses precision above 2^53
    * (~5.6e14 video ids) — the inconsistent-failure-mode twin of
    * [[keyframeId]]'s loud overflow check. Arithmetic shift pairs with
    * pmod's non-negative remainder exactly: kfId =
    * (kfId >> shift)·stride + pmod(kfId, stride) for ALL longs. */
  private val KeyframeIdShift: Int = {
    val s = java.lang.Long.numberOfTrailingZeros(KeyframeIdStride)
    require(KeyframeIdStride == (1L << s),
      s"KeyframeIdStride must be a power of two for the shift decompose (got $KeyframeIdStride)")
    s
  }

  def keyframeVideoId(kfId: Column): Column =
    shiftright(kfId.cast("long"), KeyframeIdShift)

  def keyframeFrameIdx(kfId: Column): Column = pmod(kfId, lit(KeyframeIdStride))

  def videoKeyframes(media: DataFrame, everyK: Int = 4): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1 (got $everyK)")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap(_.flatMap { case (id, bytes) =>
          val got = aviFramePayloads(id, bytes)
          got.zipWithIndex.collect {
            case (png, f) if f % everyK == 0 =>
              (id, got.size.toLong, f.toLong, png)
          }
        })
      }
      .toDF("doc_id", "n_frames", "frame_idx", "payload")
  }

  /** 64-bit audio fingerprint over the DECODED energy envelope — the
    * audio sibling of [[aHash64]], emitting the same (doc_id, sh)
    * contract so it feeds the SHARED hamming machinery unchanged
    * ([[graft.operators.TextDedup.simhashPairsFromHashes]] /
    * `simhashProbeIndex` / `hammingDedupVerdicts` — q164's generalized
    * bands).
    *
    * Shape: a time × level THERMOMETER barcode. The clip's per-frame
    * mean-square energies ([[decodeAudioFrames]] output, REAL decoded
    * PCM) are resampled to 8 time cells (cell c reads frame
    * (c·n) div 8 — the nearest-frame rule [[aHash64]] uses for its
    * 8×8 grid), and each cell carries an 8-bit thermometer of its
    * energy RELATIVE to the clip maximum: bit (c·8 + l) is set iff
    * 9·e_c ≥ (l+1)·max_e — no division, so Spark and a SQL oracle
    * agree bit for bit. Hamming distance between two barcodes is then
    * the L1 distance of the quantized envelopes, which is what makes
    * a re-encoded / slightly-regained copy land within a small radius
    * while unrelated clips scatter. A straight 1-bit-per-cell aHash is
    * useless here: 3–13-frame clips give it ≤ 13 bits of entropy and
    * everything collides (measured 12.8% of random pairs within
    * hamming 7); the thermometer spends the 64 bits on energy LEVELS
    * instead. All-silent clips (max_e = 0) collapse to the all-ones
    * barcode — exact dups by construction, which is what the exact
    * layer should do with them.
    *
    * Scale shape: one groupBy(doc) for the per-clip max (map-side
    * combined), an 8-cell explode joined back on (doc_id, frame_idx)
    * — both sides hash-partition on doc_id — then one bit_or agg
    * (overflow-free bit assembly). Linear in total frame count. */
  def audioHash64(frames: DataFrame): DataFrame =
    envelopeHash64(frames, col("rms_sq"))

  /** The video sibling: the same thermometer barcode over
    * [[decodeVideoFrames]]' per-frame mean lumas — ONE fingerprint
    * definition for every per-frame scalar envelope, so audio clips,
    * video clips and (with a caller-supplied feature) any future
    * modality all feed the same banded hamming machinery. */
  def videoHash64(frames: DataFrame): DataFrame =
    envelopeHash64(frames, col("mean_luma"))

  /** Shared core: 8 resampled time cells × 8 relative levels over any
    * per-frame scalar `value` ((doc_id, n_frames, frame_idx, value)
    * rows → (doc_id, sh)). Integer-exact (9·v ≥ (l+1)·max — no
    * division); all-constant-zero envelopes collapse to the all-ones
    * barcode (exact dups by construction). */
  private def envelopeHash64(frames: DataFrame, value: Column): DataFrame = {
    val vals = frames.select(
      col("doc_id"), col("n_frames"), col("frame_idx"), value.as("__v"))
    vals
      .groupBy(col("doc_id"), col("n_frames"))
      .agg(max(col("__v")).as("__max"))
      .select(col("doc_id"), col("n_frames"), col("__max"),
        explode(sequence(lit(0L), lit(7L))).as("c"))
      .withColumn("frame_idx", expr("(c * n_frames) div 8"))
      .join(vals.select(col("doc_id"), col("frame_idx"), col("__v")),
        Seq("doc_id", "frame_idx"))
      .select(col("doc_id"), col("c"), col("__v"), col("__max"),
        explode(sequence(lit(0L), lit(7L))).as("l"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "bit_or(CASE WHEN __v * 9 >= (l + 1) * __max " +
          "THEN shiftleft(1L, cast(c * 8 + l AS int)) ELSE 0L END)").as("sh"))
  }

  /** Voice-activity segmentation over REAL per-frame energies
    * ([[decodeAudioFrames]] output): a frame is voiced iff its
    * mean-square energy ≥ `threshold` (default 250 000 = amplitude
    * 500 on the PCM16 scale), maximal voiced runs become segments via
    * the shared gaps-and-islands core. Same output contract as
    * [[vadSegments]]; all-silent clips drop out. */
  def vadSegmentsFromEnergies(frames: DataFrame, threshold: Long = 250000L): DataFrame =
    islandSegments(frames.filter(col("rms_sq") >= threshold))

  /** Bright-scene segmentation over REAL decoded frame lumas
    * ([[decodeVideoFrames]] output) — the video twin of
    * [[vadSegmentsFromEnergies]] through the SAME gaps-and-islands
    * core: a frame is "bright" iff mean_luma ≥ `threshold`, maximal
    * bright runs become segments; all-dark clips drop out. */
  def sceneSegmentsFromLumas(frames: DataFrame, threshold: Long = 128L): DataFrame =
    islandSegments(frames.filter(col("mean_luma") >= threshold))

  /** Voice-activity segmentation over the decoded audio/video table —
    * the silence-trimming pass a speech-training pipeline runs before
    * transcription/alignment (energy-threshold VAD, the classic
    * pre-neural baseline). Frame ENERGY is the stub decode's
    * deterministic per-frame feature (`frameHash % 1000` standing in
    * for RMS energy of real samples — swap [[frameHash]]'s body for a
    * real frame decode and nothing downstream changes); a frame is
    * voiced iff energy ≥ `threshold`, and maximal runs of voiced
    * frames become segments via the gaps-and-islands key
    * (frame_idx − row_number over voiced frames — exact because
    * frame indices are dense).
    *
    * Output per media item with ≥ 1 voiced frame: n_frames,
    * n_segments, n_active (voiced frames), longest_seg, voiced_ppm.
    * All-silent items drop out (they'd be dropped by the trim anyway).
    *
    * Scale shape: ONE pass over the decoded relation (n_frames rides
    * through the explode, so no join back to the media table), one
    * doc_id shuffle for the per-item window — partition-parallel in
    * the number of media items, frames never cross items — then two
    * map-side-combined hash-aggs. Linear in total frame count at any
    * corpus size. */
  def vadSegments(decoded: DataFrame, threshold: Long = 600L): DataFrame = {
    require(threshold >= 0L && threshold <= 1000L, s"threshold in [0,1000]: $threshold")
    islandSegments(
      decoded
        .select(
          col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
        .filter(pmod(frameHash(col("doc_id"), col("frame_idx")), lit(1000L)) >= threshold))
  }

  /** Shared gaps-and-islands core over VOICED (doc_id, n_frames,
    * frame_idx) rows — exact because frame indices are dense: maximal
    * runs via frame_idx − row_number, then two map-side-combined
    * hash-aggs. One doc_id shuffle for the per-item window
    * (partition-parallel in media items, frames never cross items);
    * linear in total frame count at any corpus size. */
  private def islandSegments(voiced: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    voiced
      .withColumn("__seg", col("frame_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("n_frames"), col("__seg"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col("doc_id"), col("n_frames"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("__len")).as("n_active"),
        max(col("__len")).as("longest_seg"))
      .withColumn("voiced_ppm", expr("n_active * 1000000L div n_frames"))
  }
}
