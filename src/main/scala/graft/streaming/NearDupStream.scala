package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.StandingIndex

/** A document row as a streaming ingest sees it: id, text, and the
  * ingest event time the watermark runs on. */
case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** STREAMING ingest against the PERSISTED standing near-dup index
  * (VERDICT r14 item 6 — the natural join of the r14 index family and
  * the streaming family): documents arrive as an unbounded stream and
  * every micro-batch is served through [[StandingIndex.serveNearDup]],
  * so each new document is checked against the standing corpus the
  * moment it lands — the real-time ingest shape a production pipeline
  * runs (crawl frontier → near-dup gate → store).
  *
  * Semantics, in pipeline order:
  *
  *  - at-least-once sources re-deliver: a stateful
  *    `dropDuplicatesWithinWatermark(doc_id)` collapses duplicate
  *    deliveries BEFORE the serve, with state evicted as the watermark
  *    passes (the unbounded-stream viability contract — the dedup state
  *    holds only the watermark window, not the stream's history);
  *
  *  - each micro-batch serves through the SAME index tables every batch
  *    query uses ([[StandingIndex.serveNearDup]] — batch shingles/signs
  *    itself, the standing corpus is never re-shingled); the index is
  *    ensured ONCE before the stream starts, so steady-state batches
  *    pay serve cost only;
  *
  *  - the sink is EXACTLY-ONCE by idempotent replay: each batch's pairs
  *    land in a `batch_id=<id>` partition via dynamic partition
  *    overwrite, so a batch replayed after a crash overwrites its own
  *    partition instead of appending a duplicate (the standard
  *    foreachBatch idempotence protocol; the upsert sink's key-merge
  *    variant lives in [[EventsStreaming.toUpsertSink]]).
  */
object NearDupStream {

  /** Start the stream: `docs` (doc_id, text, ts) → watermarked duplicate
    * drop → per-batch near-dup serve vs the standing index of `d` →
    * exactly-once parquet sink at `outPath` (pairs + batch_id). */
  def start(spark: SparkSession, d: String, docs: DataFrame,
            outPath: String, checkpoint: String,
            threshold: Double = 0.9,
            watermarkDelay: String = "10 minutes",
            trigger: Option[Trigger] = None): StreamingQuery = {
    val idx = StandingIndex.ensureNearDup(spark, d) // build once, up front
    val deduped = docs
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id")
    val w = deduped.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StandingIndex
          .serveNearDup(spark, idx, batch.select("doc_id", "text"), threshold)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }
    trigger.fold(w)(w.trigger).start()
  }
}
