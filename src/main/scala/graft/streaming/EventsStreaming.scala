package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}

/** One event row as the streaming surface sees it. */
case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double)

/** Per-user running state for the stateful example. */
case class UserAgg(user_id: Long, n_events: Long, sum_value: Double,
                   last_ts: Long)

/** Structured Streaming surface over the `events` shape: watermarked
  * tumbling/sliding/session windows and custom keyed state. The same
  * logical transformations run over `readStream` in production and over
  * MemoryStream in the test suite — Spark's incrementalizer turns them
  * into stateful operators with the watermark bounding state size (late
  * rows beyond the watermark are dropped, state for closed windows is
  * evicted — that bound is what makes the operator viable on an
  * unbounded 100 TB/day stream).
  */
object EventsStreaming {

  /** Tumbling 1-hour counts/sums, 30-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Event-time session windows (30-minute gap) per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user_id"), col("n"))

  /** Custom keyed state via mapGroupsWithState: running per-user totals
    * with processing-time timeout eviction. */
  def runningUserTotals(spark: SparkSession,
                        events: Dataset[EventRow]): Dataset[UserAgg] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserAgg(uid, acc.n_events + 1, acc.sum_value + e.value,
              math.max(acc.last_ts, e.ts.getTime))
          }
          state.update(next)
          next
      }
  }

  /** Streaming exact dedup: one row per event_id, duplicate arrivals
    * within the watermark horizon dropped. State is keyed on event_id
    * and evicted once the watermark passes each key's expiry — the
    * bound that keeps an unbounded stream's dedup state finite (the
    * north-star dedup operator, incrementalized). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream inner join: attribute each purchase to
    * the views by the same user in the preceding hour. BOTH sides carry
    * a watermark and the join condition bounds event time on both sides,
    * so each side's buffered state is evictable once the watermark
    * passes the bound — without the time bound a stream-stream join
    * must buffer both streams forever. */
  def viewPurchaseJoin(views: DataFrame, purchases: DataFrame,
                       joinType: String = "inner"): DataFrame = {
    val v = views.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    // left_outer additionally emits (view, null) once the watermark
    // proves no in-bound purchase can still arrive — the state-eviction
    // deadline doubles as the null-emission trigger
    v.join(p, col("v_user") === col("p_user") &&
      col("p_ts") >= col("v_ts") &&
      col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"), joinType)
  }

  /** transformWithState (Spark 4 arbitrary-stateful-processing v2): a
    * typed per-user high-water-mark alert — emit (user, value) only
    * when a purchase exceeds the user's previous maximum. ValueState
    * lives in the RocksDB state store across micro-batches (v2 state
    * requires the RocksDB provider); unlike mapGroupsWithState the
    * handle API composes multiple typed states, timers, and per-state
    * TTL — this is the engine's exemplar of the v2 API surface. */
  class HighWaterMarkProcessor
      extends StatefulProcessor[Long, EventRow, (Long, Double)] {
    @transient private var hwm: ValueState[Double] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hwm = getHandle.getValueState[Double]("hwm",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[(Long, Double)] = {
      val prev = if (hwm.exists()) hwm.get() else Double.NegativeInfinity
      val top = rows.foldLeft(Double.NegativeInfinity)(
        (m, e) => math.max(m, e.value))
      if (top > prev) { hwm.update(top); Iterator.single((key, top)) }
      else Iterator.empty
    }
  }

  /** New per-user maxima as they stream in (see
    * [[HighWaterMarkProcessor]]). */
  def highWaterMarks(spark: SparkSession,
                     events: Dataset[EventRow]): Dataset[(Long, Double)] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new HighWaterMarkProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** The EVOLVED [[HighWaterMarkProcessor]] a later deploy would ship:
    * same "hwm" ValueState plus a NEW "n_beats" counter state. The
    * state-schema-evolution contract under test: restarting from a v1
    * checkpoint must retain each user's recovered hwm (the v2 handle
    * binds the existing column family) and initialize the added state
    * empty — no state migration job, no checkpoint rebuild. */
  class HighWaterMarkProcessorV2
      extends StatefulProcessor[Long, EventRow, (Long, Double, Long)] {
    @transient private var hwm: ValueState[Double] = _
    @transient private var nBeats: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      hwm = getHandle.getValueState[Double]("hwm",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
      nBeats = getHandle.getValueState[Long]("n_beats",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[EventRow],
        timerValues: TimerValues): Iterator[(Long, Double, Long)] = {
      val prev = if (hwm.exists()) hwm.get() else Double.NegativeInfinity
      val top = rows.foldLeft(Double.NegativeInfinity)(
        (m, e) => math.max(m, e.value))
      if (top > prev) {
        val n = (if (nBeats.exists()) nBeats.get() else 0L) + 1
        hwm.update(top); nBeats.update(n)
        Iterator.single((key, top, n))
      } else Iterator.empty
    }
  }

  /** Per-user maxima with the evolved state schema (see
    * [[HighWaterMarkProcessorV2]]). */
  def highWaterMarksV2(spark: SparkSession,
      events: Dataset[EventRow]): Dataset[(Long, Double, Long)] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new HighWaterMarkProcessorV2,
        TimeMode.None(), OutputMode.Update())
  }

  /** Stream-static enrichment join: every micro-batch joins against a
    * STATIC dimension (broadcast; re-resolved per batch, so a reloaded
    * dim path picks up new data). Stateless — no watermark, no join
    * state to evict — this is the online feature-lookup / dimension-
    * enrichment pattern, and the streaming face of `q_join_bcast`. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"))

  /** Checkpointed parquet sink: the recovery story. The checkpoint dir
    * holds source offsets + operator state (WAL) and the sink's
    * `_spark_metadata` commit log makes file output exactly-once — a
    * restarted query resumes from the last committed batch without
    * re-emitting it, the Spark analog of the reference consumer's
    * fallback+replay path
    * (plugins/shared/.../UdaShuffleConsumerPluginShared.java:162-344). */
  def toParquetSink(df: DataFrame, path: String,
                    checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()

  /** foreachBatch → batch MERGE: the streaming CDC-apply pattern. Each
    * micro-batch is upserted into a parquet target with the batch
    * engine's [[graft.operators.Upsert.merge]] (latest row per key
    * wins within the batch first, so replays are idempotent). This is
    * the bridge every production pipeline needs between a stream and a
    * queryable table when the sink has no native MERGE: foreachBatch
    * hands the micro-batch to arbitrary BATCH code while the streaming
    * engine still tracks offsets/commits in the checkpoint.
    *
    * Scale design: the target is hive-partitioned on `_kb =
    * hash(keys) % nBuckets`, and a batch rewrites ONLY the bucket
    * directories its keys hash into — both the target read (partition-
    * pruned) and the rewrite are proportional to the update's key
    * spread, never to table size.
    *
    * Durability: buckets swap in via a backup-rename protocol — the live
    * bucket is renamed aside (to a sibling `<target>_bak` root, outside
    * the partition-discovery tree), the new bucket renamed in, and the
    * backups deleted only after EVERY bucket has swapped; a failure
    * mid-swap restores the backups, and a crash that outruns the restore
    * is healed by the recovery sweep at the start of the next batch
    * (checkpoint replay), which moves any orphaned backup whose live
    * bucket is missing back into place. Rename is the only primitive
    * used on live data, and every rename/delete return value is checked.
    *
    * Layout guard: nBuckets and the key order are persisted in a
    * `_graft_bucketing` metadata file under the target on first write;
    * a restart with a different layout fails fast instead of scattering
    * new versions of keys across directories their stale versions don't
    * live in.
    *
    * Exactly-once: the last committed (checkpoint, batchId) pair is
    * persisted in a `_graft_last_batch` marker (written only after every
    * bucket has swapped and the backups are deleted), and a checkpoint
    * replay of an already-committed batch is skipped outright — so replay safety no
    * longer rests solely on the merge being idempotent (it is, for
    * latest-by-orderCol upserts, but a non-idempotent aggregate merged
    * through this sink would stay correct too). A crash BEFORE the
    * marker write replays the batch over the recovered state (the
    * idempotent path); a torn marker parses as absent and does the
    * same. */
  def toUpsertSink(updates: DataFrame, targetPath: String,
                   checkpoint: String, keys: Seq[String],
                   orderCol: String, nBuckets: Int = 64,
                   outputMode: String = "update",
                   trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val writer = updates.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.hadoop.fs.Path
        val s = batch.sparkSession
        val conf = s.sparkContext.hadoopConfiguration
        val targetP = new Path(targetPath)
        val fs = targetP.getFileSystem(conf)
        def checked(ok: Boolean, what: => String): Unit =
          if (!ok) throw new java.io.IOException(s"upsert sink: $what failed")

        // ---- layout guard -------------------------------------------------
        val metaP = new Path(targetP, "_graft_bucketing")
        val metaStr = s"nBuckets=$nBuckets\nkeys=${keys.mkString(",")}\n"
        if (fs.exists(metaP)) {
          val in = fs.open(metaP)
          val existing =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          require(existing == metaStr,
            s"bucket layout mismatch at $targetPath: target has " +
              s"[${existing.trim.replace('\n', ' ')}], sink configured " +
              s"[${metaStr.trim.replace('\n', ' ')}] — updates would land in " +
              "different _kb directories than the rows they replace")
        }

        // ---- crash recovery from a previous half-finished swap -----------
        val bakRoot = new Path(targetPath + "_bak")
        if (fs.exists(bakRoot)) {
          fs.listStatus(bakRoot).foreach { st =>
            val dst = new Path(targetP, st.getPath.getName)
            if (!fs.exists(dst)) checked(fs.rename(st.getPath, dst),
              s"recovery rename ${st.getPath} -> $dst")
            else checked(fs.delete(st.getPath, true),
              s"recovery delete ${st.getPath}")
          }
          checked(fs.delete(bakRoot, true), s"recovery delete $bakRoot")
        }

        // ---- replay guard -------------------------------------------------
        // batchIds are only monotone WITHIN one checkpoint lineage (a
        // fresh checkpoint restarts at 0), so the marker records
        // (checkpoint, batchId) — the same scoping as Delta's
        // txnAppId/txnVersion idempotent-writes pattern. A different
        // checkpoint never skips; it just re-merges idempotently.
        val lastBatchP = new Path(targetP, "_graft_last_batch")
        val lastCommitted: Option[Long] =
          if (fs.exists(lastBatchP)) {
            val in = fs.open(lastBatchP)
            try scala.util.Try {
              val lines = scala.io.Source.fromInputStream(in, "UTF-8")
                .mkString.linesIterator.toSeq
              if (lines.head == checkpoint) Some(lines(1).trim.toLong) else None
            }.toOption.flatten
            finally in.close()
          } else None
        // skip a checkpoint replay of a batch whose swap already
        // completed (the marker is written strictly after the swap)
        if (lastCommitted.forall(_ < batchId)) {

        val latest = {
          // latest row per key within the batch (a batch can carry
          // several updates for one key; MERGE wants one). Pinned
          // (persist, released in the finally below) because TWO
          // actions consume it — the bucket-list collect and the merge
          // write — and an unpinned batch re-reads the micro-batch
          // SOURCE once per action (measured: the bench's rate probe
          // counted 2× numInputRows, i.e. doubled source IO per batch
          // at stream scale). persist, NOT localCheckpoint: the cache
          // keeps lineage (an executor loss recomputes from source
          // instead of failing the query) and unpersist releases the
          // blocks per batch instead of letting a long-running stream
          // accumulate them until a driver GC (review r14).
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keys.map(col): _*)
            .orderBy(col(orderCol).desc)
          batch.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1).drop("_rn")
            .withColumn("_kb", pmod(hash(keys.map(col): _*), lit(nBuckets)))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
        try {
        val buckets = latest.select(col("_kb")).distinct()
          .collect().map(_.getInt(0)).sorted
        val target =
          if (fs.exists(targetP) && fs.listStatus(targetP)
              .exists(_.getPath.getName.startsWith("_kb=")))
            s.read.schema(latest.schema).parquet(targetPath)
              .filter(col("_kb").isin(buckets.map(Integer.valueOf): _*))
          else latest.limit(0)
        val merged = graft.operators.Upsert
          .merge(target, latest.select(target.columns.map(col).toIndexedSeq: _*),
            keys)
        val tmp = new Path(targetPath + "_tmp")
        merged.write.mode("overwrite").partitionBy("_kb").parquet(tmp.toString)
        fs.mkdirs(targetP)
        if (!fs.exists(metaP)) {
          val out = fs.create(metaP, true)
          try out.write(metaStr.getBytes("UTF-8")) finally out.close()
        }

        // ---- backup-rename swap ------------------------------------------
        val moved = collection.mutable.Buffer[(Path, Path)]() // (bak, dst)
        try {
          buckets.foreach { b =>
            val src = new Path(tmp, s"_kb=$b")
            val dst = new Path(targetP, s"_kb=$b")
            val bak = new Path(bakRoot, s"_kb=$b")
            if (fs.exists(src)) {
              if (fs.exists(dst)) {
                fs.mkdirs(bakRoot)
                checked(fs.rename(dst, bak), s"rename $dst -> $bak")
                moved += ((bak, dst))
              }
              checked(fs.rename(src, dst), s"rename $src -> $dst")
            }
          }
          // all buckets swapped — the backups are now garbage
          if (fs.exists(bakRoot))
            checked(fs.delete(bakRoot, true), s"delete $bakRoot")
        } catch { case e: Throwable =>
          moved.foreach { case (bak, dst) =>
            if (fs.exists(bak)) {
              fs.delete(dst, true) // dst may hold the half-swapped new bucket
              fs.rename(bak, dst)  // best-effort restore; recovery sweep
            }                      // finishes the job on replay
          }
          throw e
        }
        fs.delete(tmp, true)
        // commit marker LAST: everything before this line is replay-safe
        val out = fs.create(lastBatchP, true)
        try out.write(s"$checkpoint\n$batchId\n".getBytes("UTF-8"))
        finally out.close()
        } finally latest.unpersist(blocking = false)
        }
        ()
      }
    trigger.fold(writer)(writer.trigger).start()
  }

  /** Flat-map variant emitting one record per closed session (append
    * mode compatible): demonstrates flatMapGroupsWithState. */
  def perUserEventCounts(spark: SparkSession,
                         events: Dataset[EventRow]): Dataset[UserAgg] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserAgg(uid, acc.n_events + 1, acc.sum_value + e.value,
              math.max(acc.last_ts, e.ts.getTime))
          }
          state.update(next)
          Iterator.single(next)
      }
  }
}
