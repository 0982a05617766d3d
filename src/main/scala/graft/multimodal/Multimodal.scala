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

  /** STUB resize: deterministic byte-decimation of the payload (every
    * `factor`-th byte) — stands in for image/audio resampling. Map-only:
    * the payload is rewritten in place in its partition, never shuffled;
    * a real resampler swaps in with the same bytes→bytes signature. */
  def resizePayload(spark: SparkSession, docs: DataFrame,
                    factor: Int): DataFrame = {
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          (id, out, bytes.length, out.length)
        }
      }
      .toDF("doc_id", "payload", "orig_len", "resized_len")
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
