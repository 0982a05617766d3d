package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted per-asset features. In a real pipeline width/height/channels
  * come from an image codec; here the decode is a deterministic STUB
  * (the container has no image/audio libs) while the Spark-side plumbing
  * — binary column, schema, partition-wise batching — is real.
  */
/** One sampled frame of a binary payload. */
case class FrameSample(doc_id: Long, frame_idx: Int, frame_len: Int,
                       first_byte: Int)

case class MediaFeatures(
    doc_id: Long,
    byte_len: Int,
    width: Int,
    height: Int,
    channels: Int,
    first_byte: Int,
    n_frames: Int)

/** Multimodal-column plumbing: treat image/audio/video as opaque
  * `binary` columns plus typed metadata, and run decode/feature-extract
  * as a partition-wise batch operator.
  *
  * Scale design: the binary payload never leaves its input partition —
  * `mapPartitions` is a map-only stage fused with the scan; 100 TB of
  * media shards across executors with zero shuffle. The decode stub is
  * the ONLY thing to swap for a real codec (same signature: bytes in,
  * features out, batch-at-a-time per partition).
  */
object Multimodal {

  /** Attach a binary "payload" column (here: utf-8 bytes of the text —
    * the fixtures carry no real media, so documents stand in for a
    * media manifest). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))

  /** STUB decode: deterministic pseudo-metadata from the bytes. A real
    * implementation would parse the container header here. */
  private[multimodal] def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Int, Int) = {
    val len = bytes.length
    val width = len % 64 + 1
    val height = (len / 64) % 64 + 1
    val channels = 3
    val firstByte = if (len > 0) bytes(0) & 0xFF else -1
    val nFrames = math.max(1, (len + 255) / 256) // 256-byte "frames"
    (width, height, channels, firstByte, nFrames)
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

  /** Partition-wise feature extraction over (doc_id, payload) rows. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch shape: the iterator IS the batch — a real codec would
        // amortize init (model load, decoder context) across the
        // partition here, exactly like mapInPandas batches in PySpark.
        it.map { case (id, bytes) =>
          val (w, h, c, fb, nf) = decodeStub(bytes)
          MediaFeatures(id, bytes.length, w, h, c, fb, nf)
        }
      }
  }
}
