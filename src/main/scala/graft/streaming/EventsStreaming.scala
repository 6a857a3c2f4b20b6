package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events schema: the streaming
  * counterparts of the batch operators in [[graft.ops.Events]].
  *
  * The reference is batch-only (SURVEY.md §2.1: streaming ABSENT), so
  * this module is pure extension: file-source streams → watermarked
  * event-time windows → memory/parquet sinks, plus keyed custom state
  * via mapGroupsWithState. The same code drives a Kafka source at scale —
  * only the `readStream.format` changes; windows, watermarks, and state
  * stores shard by key across executors.
  */
object EventsStreaming {

  /** File-source stream of events with `ts` normalized to a
    * micro-precision timestamp. `maxFilesPerTrigger` (caller-set option)
    * turns a directory of parquet files into a multi-batch stream.
    *
    * A file stream needs an explicit schema, but the physical encoding of
    * `ts` (nanos-as-long vs NTZ micros vs LTZ micros) is a property of
    * files we don't produce — so by default probe it with a one-off batch
    * read of the directory footer metadata, then normalize through the
    * SAME dispatch as the batch loader
    * ([[graft.ops.Tables.normalizeEventTs]]). Hard-coding one encoding
    * here once turned an upstream re-encode into silent 1970-era
    * timestamps; the probe makes both fronts absorb an encoding flip
    * identically.
    *
    * The probe needs at least one file present. A landing directory that
    * is empty at startup (the stream-before-data production shape) can't
    * be probed — pass `schema` explicitly for that case; `ts` still goes
    * through the same normalization dispatch.
    *
    * Nano-vintage files (true TIMESTAMP(NANOS)) additionally need
    * `spark.sql.legacy.parquet.nanosAsLong` set at session construction
    * ([[graft.GraftSession.configure]] does it) — a source builder
    * mutating session conf would be a hidden global side effect. */
  def readEvents(spark: SparkSession, srcDir: String, maxFilesPerTrigger: Int = 1,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val physicalSchema = schema.getOrElse(spark.read.parquet(srcDir).schema)
    val stream = spark.readStream
      .schema(physicalSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    graft.ops.Tables.normalizeEventTs(stream)
  }

  /** Tumbling 1-hour event-time windows with a 30-minute watermark:
    * count + revenue per (window, type). Late data beyond the watermark
    * is dropped; state for closed windows is evicted — bounded memory on
    * an unbounded stream. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact-dedup on event_id with BOUNDED state:
    * `dropDuplicatesWithinWatermark` evicts per-key state once the
    * watermark passes (plain `dropDuplicates("event_id")` would keep one
    * state entry per id forever when the event-time column is not part
    * of the key). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  final case class UserCount(user_id: Long, n_events: Long, total_value: Double)

  /** Keyed custom state via mapGroupsWithState: running per-user event
    * count + value total, updated every micro-batch. State lives in the
    * executor-sharded state store (RocksDB/HDFS-backed on a cluster). */
  def runningUserCounts(spark: SparkSession, events: DataFrame): Dataset[UserCount] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[(Long, Double)], state: GroupState[UserCount]) =>
          val prev = state.getOption.getOrElse(UserCount(userId, 0L, 0.0))
          var n = prev.n_events
          var v = prev.total_value
          batch.foreach { case (_, value) => n += 1; v += value }
          val next = UserCount(userId, n, v)
          state.update(next)
          next
      }
  }

  final case class SessionState(start_us: Long, last_us: Long, n: Long, value: Double)
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, session_value: Double)

  /** Streaming gap sessionization via flatMapGroupsWithState: per-user
    * state carries the open session; a new event past the gap CLOSES the
    * previous session and emits it (0..n outputs per invocation — the
    * flatMap shape). The final open session per user stays in state;
    * [[closedSessionsWithTimeout]] is the production variant that also
    * closes it via an event-time timeout once the watermark passes. */
  def closedSessions(spark: SparkSession, events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[(Long, Long, Double)], state: GroupState[SessionState]) =>
          // events within one micro-batch are not ordered per key: sort
          val evs = batch.toSeq.sortBy(e => (e._2, e._3))
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var cur = state.getOption
          evs.foreach { case (_, us, value) =>
            cur match {
              case Some(s) if us - s.last_us > gapUs =>
                closed += ClosedSession(userId, s.start_us, s.last_us, s.n, s.value)
                cur = Some(SessionState(us, us, 1, value))
              case Some(s) =>
                cur = Some(s.copy(last_us = us, n = s.n + 1, value = s.value + value))
              case None =>
                cur = Some(SessionState(us, us, 1, value))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** Production sessionizer: [[closedSessions]] plus an EVENT-TIME TIMEOUT
    * so the final open session per user also closes once the watermark
    * passes its gap (without it, the last session per key sits in state
    * forever). The input must carry an event-time watermark — set here on
    * `ts` before the keyed state op. Timeout registration: fire once
    * event time passes `last_us + gapUs` (timestamps are in ms for the
    * state API; +1 ms so the close is strictly after the gap). */
  def closedSessionsWithTimeout(spark: SparkSession, events: DataFrame,
      gapUs: Long = 30L * 60 * 1000000, watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      // the watermarked ts column must flow INTO the state op (the
      // analyzer rejects event-time timeout otherwise); `us` carries the
      // same instant as a plain long for the session arithmetic
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"), col("ts"))
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[(Long, Long, Double, java.sql.Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's gap: close and clear
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.start_us, s.last_us, s.n, s.value))
          } else {
            val evs = batch.toSeq.sortBy(e => (e._2, e._3))
            val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var cur = state.getOption
            evs.foreach { case (_, us, value, _) =>
              cur match {
                case Some(s) if us - s.last_us > gapUs =>
                  closed += ClosedSession(userId, s.start_us, s.last_us, s.n, s.value)
                  cur = Some(SessionState(us, us, 1, value))
                case Some(s) =>
                  cur = Some(s.copy(last_us = us, n = s.n + 1, value = s.value + value))
                case None =>
                  cur = Some(SessionState(us, us, 1, value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_us / 1000 + gapUs / 1000 + 1)
            }
            closed.iterator
          }
      }
  }

  /** Stream-static enrichment join: streaming events against a static
    * customer dimension. The static side is broadcast — each micro-batch
    * is enriched map-side with NO shuffle and no streaming state at all
    * (the canonical production shape for dimension lookups on a stream;
    * at scale the dim can also be a Delta/parquet snapshot re-read per
    * batch). */
  def enrichedEvents(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
      events("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment").as("segment"))

  /** Stream-stream interval join: purchases matched to the same user's
    * signups within [signup, signup + window]. BOTH sides are watermarked
    * and the join condition carries an event-time bound, so each side's
    * buffered state is evicted once the watermark passes the bound —
    * bounded state on two unbounded streams. Without the time bound (or
    * the watermarks) Spark would have to buffer both streams forever. */
  def purchasesAfterSignup(events: DataFrame, windowSpan: String = "1 hour"): DataFrame = {
    val signups = events
      .where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("signup_id"))
      .withWatermark("s_ts", "30 minutes")
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "30 minutes")
    purchases.join(signups,
      expr(s"p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval $windowSpan"))
      .select(col("purchase_id"), col("signup_id"), col("p_user").as("user_id"), col("value"))
  }

  /** Streaming ingest into the daily sketch-rollup artifact
    * (graft.ops.Sketches): each micro-batch folds through
    * `appendDailyDelta` via foreachBatch — the streaming half of the
    * q148/q149 lifecycle, mirroring how the text/image gates feed the
    * dedup artifacts.
    *
    * The rollup's ingest unit is the CLOSED day (its own grain), so
    * the stream must deliver day-aligned batches — the nightly-rollup
    * cadence a production pipeline runs (one file/object per closed
    * day; file-source streams preserve that alignment at
    * maxFilesPerTrigger=1). The artifact's day-level replay guard then
    * makes redelivery idempotent: a restarted stream that re-reads an
    * already-rolled-up day appends nothing (EventsStreamingSpec pins
    * redelivery). A batch that SPLITS a day USED to under-roll it
    * silently; the sink now folds through the VERIFIED append
    * ([[graft.ops.Sketches.appendDailyDeltaVerified]]): any of the
    * batch's days already in the artifact with a disagreeing count — a
    * prior partial trigger — is retracted and re-rolled from this batch
    * before the normal day-guarded append runs, so a redelivery that
    * carries the day in full CONVERGES the artifact instead of relying
    * on the cadence contract alone (the contract still names the
    * convergence condition: the repairing batch must carry each of its
    * days in full). */
  def rollupIngest(events: DataFrame, indexDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Sketches.appendDailyDeltaVerified(batch, indexDir): Unit
      }
      .start()

  /** Run a streaming query over `src` into an in-memory table and block
    * until every available file is processed (test/dev harness; a
    * production job would use a durable sink + checkpoint dir and
    * Trigger.ProcessingTime/AvailableNow). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
