package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One sampled frame of a binary payload. */
case class FrameSample(doc_id: Long, frame_idx: Int, frame_len: Int,
                       first_byte: Int)

/** Per-asset features decoded from the container header. Decode-derived
  * fields are Options: a malformed payload yields a null-feature row
  * (kind/width/height/channels/n_frames all null), never a task failure.
  */
case class MediaFeatures(
    doc_id: Long,
    byte_len: Int,
    kind: Option[String],
    width: Option[Int],
    height: Option[Int],
    channels: Option[Int],
    first_byte: Int,
    n_frames: Option[Int])

/** Parsed container header. */
case class MediaMeta(kind: String, width: Option[Int], height: Option[Int],
                     channels: Int, nFrames: Int)

/** One resampled asset: dims/frames of the output container plus a
  * position-weighted checksum over the resampled payload bytes (weights
  * break the flip/transpose symmetries a plain sum cannot see). */
case class ResizedMedia(doc_id: Long, kind: Option[String],
                        out_w: Option[Int], out_h: Option[Int],
                        out_frames: Option[Int], resized_len: Option[Int],
                        checksum: Option[Long])

/** Multimodal-column plumbing: treat image/audio/video as opaque
  * `binary` columns plus typed metadata, and run decode/feature-extract
  * as a partition-wise batch operator.
  *
  * The decode is REAL: [[decodeHeader]] parses the two dependency-free
  * container formats a pure JVM can handle byte-level — BMP
  * (BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian dims at offsets
  * 18/22/28) and canonical 44-byte RIFF/WAVE (channels/bits/blockAlign
  * at 22/34/32, data size at 40). The fixtures carry no media, so
  * [[withContainerPayload]] SYNTHESIZES valid containers deterministic
  * in (doc_id, n_chars) — which keeps the DuckDB oracle able to predict
  * every decoded field: if the parser misreads an offset, the oracle
  * hash-mismatches. Rows with `doc_id % 11 == 3` get a deliberately
  * malformed payload to keep the null-row path under test. The analog
  * in the reference is its byte-level codec wrappers
  * (src/Merger/SnappyDecompressor.cc:60-108, LzoDecompressor.cc:151-167).
  *
  * Scale design: the binary payload never leaves its input partition —
  * synthesis, decode, resize and frame sampling are map-only stages
  * fused with the scan; 100 TB of media shards across executors with
  * zero shuffle. Heavier codecs (JPEG, FLAC) swap into [[decodeHeader]]
  * with the same bytes-in, meta-out signature, amortizing decoder init
  * across each partition's iterator.
  */
object Multimodal {

  // ---- little-endian byte helpers ------------------------------------

  private def i32(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def i16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  // ---- container writers (fixture synthesis) -------------------------

  /** 54-byte BMP header (24bpp, uncompressed) + raw data. */
  private[graft] def bmpPayload(width: Int, height: Int,
                                     data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(54 + data.length)
    out.write('B'); out.write('M')
    out.write(i32(54 + data.length)); out.write(i32(0)); out.write(i32(54))
    out.write(i32(40)); out.write(i32(width)); out.write(i32(height))
    out.write(i16(1)); out.write(i16(24)); out.write(i32(0))
    out.write(i32(data.length)); out.write(i32(2835)); out.write(i32(2835))
    out.write(i32(0)); out.write(i32(0))
    out.write(data)
    out.toByteArray
  }

  /** Canonical 44-byte RIFF/WAVE header (PCM16 @ 16 kHz) + raw data. */
  private[graft] def wavPayload(channels: Int,
                                     data: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2
    val out = new java.io.ByteArrayOutputStream(44 + data.length)
    out.write("RIFF".getBytes("US-ASCII")); out.write(i32(36 + data.length))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); out.write(i32(16))
    out.write(i16(1)); out.write(i16(channels)); out.write(i32(16000))
    out.write(i32(16000 * blockAlign)); out.write(i16(blockAlign))
    out.write(i16(16))
    out.write("data".getBytes("US-ASCII")); out.write(i32(data.length))
    out.write(data)
    out.toByteArray
  }

  /** Deterministic container for a doc: even ids → BMP with dims derived
    * from n_chars, odd ids → WAV with 1-2 channels; every `% 11 == 3` id
    * → a 4-byte junk payload that must decode to a null-feature row. */
  private[graft] def synthesizePayload(id: Long, text: Array[Byte],
                                            nChars: Long): Array[Byte] =
    if (id % 11 == 3) "BAD!".getBytes("US-ASCII")
    else if (id % 2 == 0)
      bmpPayload((nChars % 64 + 1).toInt, ((nChars / 64) % 64 + 1).toInt, text)
    else wavPayload((nChars % 2 + 1).toInt, text)

  // ---- the decoder ----------------------------------------------------

  /** Parse a BMP or WAV header; None for anything malformed (too short,
    * bad magic, nonsense dims) — the caller emits a null-feature row. */
  def decodeHeader(b: Array[Byte]): Option[MediaMeta] =
    try {
      if (b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
        val w = rd32(b, 18); val h = rd32(b, 22); val bpp = rd16(b, 28)
        if (w <= 0 || h <= 0 || bpp <= 0 || bpp % 8 != 0) None
        else Some(MediaMeta("bmp", Some(w), Some(h), bpp / 8, 1))
      } else if (b.length >= 44 && ascii(b, 0, "RIFF") &&
                 ascii(b, 8, "WAVE") && ascii(b, 12, "fmt ")) {
        val ch = rd16(b, 22); val blockAlign = rd16(b, 32)
        val dataSize = rd32(b, 40)
        if (ch <= 0 || blockAlign <= 0 || dataSize < 0) None
        else Some(MediaMeta("wav", None, None, ch, dataSize / blockAlign))
      } else None
    } catch { case _: ArrayIndexOutOfBoundsException => None }

  /** Attach a binary "payload" column (utf-8 bytes of the text) — the
    * raw-bytes surface frame sampling and resize run on. */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))

  /** Attach a synthesized CONTAINER payload (BMP/WAV/junk per
    * [[synthesizePayload]]) as a binary column — map-only, fused with
    * the scan. */
  def withContainerPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions(_.map { case (id, text, nChars) =>
        (id, synthesizePayload(id, text.getBytes("UTF-8"), nChars))
      })
      .toDF("doc_id", "payload")
  }

  // ---- real resampling ------------------------------------------------

  /** Deterministic media byte for the decodable fixture — a pure
    * function of (doc_id, position), so the DuckDB oracle predicts
    * every byte the resampler is supposed to keep. For BMP, (x, y, c)
    * are pixel coordinates + channel; for WAV, (frame, byteInSample,
    * channel). */
  private[graft] def mediaByte(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 31 + x * 7 + y * 13 + c * 17) % 256).toInt

  private def bmpStride(w: Int): Int = ((w * 3 + 3) / 4) * 4

  /** A FULLY decodable container: the BMP carries a real bottom-up
    * 4-byte-row-aligned 24 bpp pixel array and the WAV a real PCM16
    * frame sequence, every byte [[mediaByte]]-deterministic in
    * (doc_id, n_chars) — unlike [[synthesizePayload]], whose data
    * region is opaque text. `% 11 == 3` ids stay junk. */
  private[graft] def synthesizeDecodableMedia(id: Long,
                                              nChars: Long): Array[Byte] =
    if (id % 11 == 3) "BAD!".getBytes("US-ASCII")
    else if (id % 2 == 0) {
      val w = (nChars % 64 + 1).toInt
      val h = ((nChars / 64) % 64 + 1).toInt
      val stride = bmpStride(w)
      val data = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            // bottom-up row order, per the BMP spec
            data((h - 1 - y) * stride + x * 3 + c) = mediaByte(id, x, y, c).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      bmpPayload(w, h, data)
    } else {
      val ch = (nChars % 2 + 1).toInt
      val nf = (nChars % 50 + 5).toInt
      val data = new Array[Byte](2 * ch * nf)
      var i = 0
      while (i < nf) {
        var c = 0
        while (c < ch) {
          data(i * 2 * ch + c * 2) = mediaByte(id, i, 0, c).toByte
          data(i * 2 * ch + c * 2 + 1) = mediaByte(id, i, 1, c).toByte
          c += 1
        }
        i += 1
      }
      wavPayload(ch, data)
    }

  /** REAL 2× nearest-neighbor downsample of a decoded BMP pixel array
    * (stride-aware, bottom-up) — output pixel (x2, y2) = input
    * (2·x2, 2·y2) — re-encoded as a valid BMP; returns the new payload
    * and the weighted checksum over the resampled pixels. */
  private[graft] def resizeBmp(b: Array[Byte]): (Array[Byte], Long) = {
    val w = rd32(b, 18); val h = rd32(b, 22); val dataOff = rd32(b, 10)
    val stride = bmpStride(w)
    val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
    val stride2 = bmpStride(w2)
    val out = new Array[Byte](stride2 * h2)
    var sum = 0L
    var y2 = 0
    while (y2 < h2) {
      var x2 = 0
      while (x2 < w2) {
        var c = 0
        while (c < 3) {
          val px = b(dataOff + (h - 1 - 2 * y2) * stride + 2 * x2 * 3 + c) & 0xFF
          out((h2 - 1 - y2) * stride2 + x2 * 3 + c) = px.toByte
          sum += px.toLong * (1 + (x2 * 5 + y2 * 3 + c) % 7)
          c += 1
        }
        x2 += 1
      }
      y2 += 1
    }
    (bmpPayload(w2, h2, out), sum)
  }

  /** REAL 2× decimation of a decoded WAV frame sequence (every even
    * frame survives, all channels of its PCM16 sample kept intact),
    * re-encoded as a valid WAV; returns the new payload and the
    * weighted checksum over the surviving sample bytes. */
  private[graft] def resizeWav(b: Array[Byte]): (Array[Byte], Long) = {
    val ch = rd16(b, 22); val blockAlign = rd16(b, 32)
    val frames = rd32(b, 40) / blockAlign
    val outFrames = (frames + 1) / 2
    val out = new Array[Byte](blockAlign * outFrames)
    var sum = 0L
    var j = 0
    while (j < outFrames) {
      System.arraycopy(b, 44 + 2 * j * blockAlign, out, j * blockAlign,
        blockAlign)
      var c = 0
      while (c < ch) {
        var bb = 0
        while (bb < 2) {
          val v = out(j * blockAlign + c * 2 + bb) & 0xFF
          sum += v.toLong * (1 + (j * 5 + c * 3 + bb) % 7)
          bb += 1
        }
        c += 1
      }
      j += 1
    }
    (wavPayload(ch, out), sum)
  }

  /** Partition-wise media resampling: synthesize the decodable
    * container, decode it, and resample for real — 2× nearest-neighbor
    * pixel downsample for images, 2× frame decimation for audio —
    * re-encoding a valid container either way. Map-only: the payload
    * never leaves its input partition; only the small per-asset summary
    * row (dims, re-encoded length, weighted checksum) flows downstream.
    * Malformed payloads yield a null-feature row, never a task failure. */
  def resizeMedia(spark: SparkSession, docs: DataFrame): Dataset[ResizedMedia] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val bytes = synthesizeDecodableMedia(id, nChars)
        decodeHeader(bytes) match {
          case Some(m) if m.kind == "bmp" =>
            val (out, sum) = resizeBmp(bytes)
            ResizedMedia(id, Some("bmp"), Some((m.width.get + 1) / 2),
              Some((m.height.get + 1) / 2), None, Some(out.length), Some(sum))
          case Some(m) =>
            val (out, sum) = resizeWav(bytes)
            ResizedMedia(id, Some("wav"), None, None,
              Some((m.nFrames + 1) / 2), Some(out.length), Some(sum))
          case None =>
            ResizedMedia(id, None, None, None, None, None, None)
        }
      })
  }

  /** Frame sampling: every `step`-th fixed-size frame of the payload,
    * emitted as one row per sampled frame — the video-keyframe /
    * audio-window access pattern. A map-only flatMap fused with the
    * scan: the payload is sliced where it lives, only the (small)
    * per-frame rows flow downstream. */
  def sampleFrames(spark: SparkSession, docs: DataFrame,
                   frameSize: Int = 256, step: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(1, (bytes.length + frameSize - 1) / frameSize)
        (0 until nFrames by step).map { f =>
          val start = f * frameSize
          val len = math.max(0, math.min(frameSize, bytes.length - start))
          FrameSample(id, f, len, if (len > 0) bytes(start) & 0xFF else -1)
        }
      }
  }

  /** Partition-wise feature extraction: synthesize the container column,
    * then decode each payload's REAL header where it lives. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withContainerPayload(spark, docs)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch shape: the iterator IS the batch — a real codec would
        // amortize init (decoder context, model load) across the
        // partition here, exactly like mapInPandas batches in PySpark.
        it.map { case (id, bytes) =>
          val fb = if (bytes.nonEmpty) bytes(0) & 0xFF else -1
          decodeHeader(bytes) match {
            case Some(m) => MediaFeatures(id, bytes.length, Some(m.kind),
              m.width, m.height, Some(m.channels), fb, Some(m.nFrames))
            case None => MediaFeatures(id, bytes.length, None, None, None,
              None, fb, None)
          }
        }
      }
  }
}
