package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.Tables

/** Streaming specs: feed the sf0.001 events parquet through file-source
  * streams (multi-batch via maxFilesPerTrigger) and assert the streaming
  * results converge to the batch answers.
  */
class EventsStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** Copy the events parquet twice into a fresh dir so the stream runs
    * as (at least) two micro-batches with duplicate event_ids across
    * batches. */
  private def mkStreamDir(copies: Int): String = {
    val dir = Files.createTempDirectory("graft-stream")
    val src = java.nio.file.Path.of(s"$sfDir/events.parquet")
    (1 to copies).foreach { i =>
      Files.copy(src, dir.resolve(s"events_$i.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  test("windowed hourly counts over the stream match the batch answer") {
    val dir = mkStreamDir(1)
    val stream = EventsStreaming.readEvents(spark, dir)
    EventsStreaming.runToMemory(
      EventsStreaming.hourlyCounts(stream), "hourly_stream", OutputMode.Complete())
    val streamed = spark.table("hourly_stream")
      .orderBy("hour_start", "event_type").collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour_start", "event_type").collect()
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch))
  }

  test("streaming dropDuplicates dedups event_ids across micro-batches") {
    val dir = mkStreamDir(2) // same events twice, in two files/batches
    val stream = EventsStreaming.readEvents(spark, dir, maxFilesPerTrigger = 1)
    EventsStreaming.runToMemory(
      EventsStreaming.dedupedEvents(stream).select("event_id"), "dedup_stream", OutputMode.Append())
    val n = spark.table("dedup_stream").count()
    val batchN = Tables.events(spark, sfDir).count()
    assert(n == batchN, s"streamed dedup $n vs batch $batchN")
  }

  test("flatMapGroupsWithState emits exactly the non-final sessions") {
    val dir = mkStreamDir(1)
    val stream = EventsStreaming.readEvents(spark, dir)
    EventsStreaming.runToMemory(
      EventsStreaming.closedSessions(spark, stream).toDF(), "closed_sessions", OutputMode.Append())
    val closed = spark.table("closed_sessions")
    // the batch sessionizer (oracle-checked q13) gives the ground truth:
    // every session except each user's LAST should have been closed
    val batchSessions = graft.ops.Events.sessions(spark, sfDir)
    val expectedClosed = batchSessions.count() -
      batchSessions.select("user_id").distinct().count()
    assert(closed.count() == expectedClosed,
      s"closed=${closed.count()} expected=$expectedClosed")
    // spot-check shape: closed sessions match the batch rows on (user, start)
    import org.apache.spark.sql.functions._
    val joined = closed.join(
      batchSessions.withColumnRenamed("n_events", "batch_n"),
      Seq("user_id"), "left_semi")
    assert(joined.count() == closed.count())
  }

  test("event-time timeout closes the final open sessions via the watermark") {
    // batch 1: the real events; batch 2: one far-future sentinel event that
    // drags the watermark past every open session's gap, so EVERY real
    // session — including each user's last — must be emitted
    val dir = java.nio.file.Path.of(mkStreamDir(1))
    val sentinelTmp = Files.createTempDirectory("graft-sentinel")
    val maxTs = Tables.events(spark, sfDir).agg(max(unix_micros(col("ts")))).head().getLong(0)
    val sentinelUs = maxTs + 365L * 86400 * 1000000 // +1 year
    // the sentinel file must carry ts in the SAME physical encoding as the
    // copied events files — readEvents probes one schema for the whole dir
    val sentinelTs = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => lit(sentinelUs * 1000) // nanos-as-long
      case org.apache.spark.sql.types.TimestampNTZType =>
        timestamp_micros(lit(sentinelUs)).cast(org.apache.spark.sql.types.TimestampNTZType)
      case _ => timestamp_micros(lit(sentinelUs))
    }
    spark.range(1)
      .select(lit(-1L).as("event_id"),
        sentinelTs.as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit(null).cast("string").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(sentinelTmp.toString)
    val part = Files.list(sentinelTmp).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    Files.copy(part, dir.resolve("zz_sentinel.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = EventsStreaming.readEvents(spark, dir.toString, maxFilesPerTrigger = 1)
    EventsStreaming.runToMemory(
      EventsStreaming.closedSessionsWithTimeout(spark, stream).toDF(),
      "timeout_sessions", OutputMode.Append())
    val closed = spark.table("timeout_sessions").where(col("user_id") =!= -1L)
    val batchSessions = graft.ops.Events.sessions(spark, sfDir)
    assert(closed.count() == batchSessions.count(),
      s"closed=${closed.count()} batch=${batchSessions.count()}")
    // every closed session matches a batch q13 session on its aggregates
    val streamedKeyed = closed.select(col("user_id"),
      (col("end_us") - col("start_us")).as("duration_us"), col("n_events"),
      round(col("session_value"), 2).as("session_value"))
    val batchKeyed = batchSessions.select(col("user_id"), col("duration_us"),
      col("n_events"), col("session_value"))
    assert(streamedKeyed.exceptAll(batchKeyed).count() == 0, "streamed sessions not in batch")
    assert(batchKeyed.exceptAll(streamedKeyed).count() == 0, "batch sessions not streamed")
  }

  test("stream-static broadcast join enriches every event with its segment") {
    val dir = mkStreamDir(1)
    val stream = EventsStreaming.readEvents(spark, dir)
    val customers = Tables(spark, sfDir, "customer")
    EventsStreaming.runToMemory(
      EventsStreaming.enrichedEvents(stream, customers), "enriched_stream", OutputMode.Append())
    val streamed = spark.table("enriched_stream")
    val batchEvents = Tables.events(spark, sfDir)
    assert(streamed.count() == batchEvents.count(), "left join must not drop events")
    // every user_id with a matching customer row carries its segment
    val expected = batchEvents.join(
      customers.select(col("c_custkey"), col("c_mktsegment")),
      batchEvents("user_id") === col("c_custkey"))
      .count()
    assert(streamed.where(col("segment").isNotNull).count() == expected)
  }

  test("stream-stream interval join matches the batch time-bounded join") {
    val dir = mkStreamDir(1)
    val stream = EventsStreaming.readEvents(spark, dir)
    EventsStreaming.runToMemory(
      EventsStreaming.purchasesAfterSignup(stream), "ss_join_stream", OutputMode.Append())
    val streamed = spark.table("ss_join_stream")
      .orderBy("purchase_id", "signup_id").collect()
    val ev = Tables.events(spark, sfDir)
    val s = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"), col("event_id").as("signup_id"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"), col("value"))
    val batch = p.join(s,
      expr("p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 1 hour"))
      .select(col("purchase_id"), col("signup_id"), col("p_user").as("user_id"), col("value"))
      .orderBy("purchase_id", "signup_id").collect()
    assert(batch.nonEmpty, "fixture should produce at least one purchase-after-signup pair")
    assert(streamed.sameElements(batch))
  }

  test("streaming rollup ingest converges to the monolithic artifact and survives redelivery") {
    import graft.ops.Sketches
    val ev = Tables.events(spark, sfDir)
    // two CLOSED-day batches (the rollup's ingest grain): days 1-15, 16-31
    val streamDir = Files.createTempDirectory("graft-rollup-stream")
    val ingestDir = Files.createTempDirectory("graft-rollup-ingest").toString
    val ckptDir = Files.createTempDirectory("graft-rollup-ckpt").toString
    def writeBatch(name: String, cond: org.apache.spark.sql.Column): Unit = {
      val tmp = Files.createTempDirectory("graft-rollup-batch").toString
      ev.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, java.nio.file.Path.of(s"$streamDir/$name.parquet"))
    }
    writeBatch("day01_15", to_date(col("ts")) < lit("2024-01-16"))
    val stream = EventsStreaming.readEvents(spark, streamDir.toString, maxFilesPerTrigger = 1,
      schema = Some(spark.read.parquet(s"$sfDir/events.parquet").schema))
    val q = EventsStreaming.rollupIngest(stream, ingestDir, ckptDir)
    q.processAllAvailable()
    writeBatch("day16_31", to_date(col("ts")) >= lit("2024-01-16"))
    q.processAllAvailable()
    // streamed artifact == monolithic artifact, sketch for sketch
    val monoDir = Files.createTempDirectory("graft-rollup-mono").toString
    Sketches.saveDailyRollup(ev, monoDir)
    val served = Sketches.distinctUsersFromRollup(spark, ingestDir, Sketches.DefaultRanges)
      .orderBy("range_id", "event_type").collect()
    val mono = Sketches.distinctUsersFromRollup(spark, monoDir, Sketches.DefaultRanges)
      .orderBy("range_id", "event_type").collect()
    assert(served.nonEmpty && served.sameElements(mono))
    // redelivery: the same closed days land again -> day-level replay
    // guard appends nothing
    Files.copy(java.nio.file.Path.of(s"$streamDir/day16_31.parquet"),
      java.nio.file.Path.of(s"$streamDir/day16_31_redelivered.parquet"))
    q.processAllAvailable()
    q.stop()
    val after = Sketches.distinctUsersFromRollup(spark, ingestDir, Sketches.DefaultRanges)
      .orderBy("range_id", "event_type").collect()
    assert(after.sameElements(served))
  }

  test("a PARTIAL trigger followed by full-day redelivery converges the streamed rollup") {
    import graft.ops.Sketches
    val ev = Tables.events(spark, sfDir)
    val streamDir = Files.createTempDirectory("graft-rollup-partial")
    val ingestDir = Files.createTempDirectory("graft-rollup-partial-ingest").toString
    val ckptDir = Files.createTempDirectory("graft-rollup-partial-ckpt").toString
    def writeBatch(name: String, rel: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = Files.createTempDirectory("graft-rollup-pbatch").toString
      rel.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, java.nio.file.Path.of(s"$streamDir/$name.parquet"))
    }
    val day = to_date(col("ts")) === lit("2024-01-10")
    // trigger 1: HALF of one day's events — the mid-day crash/partial
    // delivery the cadence contract forbids but reality ships anyway
    writeBatch("day10_partial", ev.where(day && pmod(col("event_id"), lit(2)) === 0))
    val stream = EventsStreaming.readEvents(spark, streamDir.toString, maxFilesPerTrigger = 1,
      schema = Some(spark.read.parquet(s"$sfDir/events.parquet").schema))
    val q = EventsStreaming.rollupIngest(stream, ingestDir, ckptDir)
    try {
      q.processAllAvailable()
      // the partial day persisted (this is the failure mode)
      val partialN = spark.read.parquet(s"$ingestDir/daily")
        .agg(sum("n_events")).head.getLong(0)
      // trigger 2: the SAME day redelivered in full — the verified
      // append must detect the disagreeing count, retract, re-roll
      writeBatch("day10_full", ev.where(day))
      q.processAllAvailable()
      val monoDir = Files.createTempDirectory("graft-rollup-partial-mono").toString
      Sketches.saveDailyRollup(ev.where(day), monoDir)
      val served = Sketches.distinctUsersFromRollup(spark, ingestDir, Sketches.DefaultRanges)
        .orderBy("range_id", "event_type").collect()
      val mono = Sketches.distinctUsersFromRollup(spark, monoDir, Sketches.DefaultRanges)
        .orderBy("range_id", "event_type").collect()
      assert(served.sameElements(mono),
        "the streamed artifact did not converge after a full-day redelivery")
      assert(spark.read.parquet(s"$ingestDir/daily")
          .agg(sum("n_events")).head.getLong(0) > partialN,
        "the repair never replaced the partial day")
      // the OPPOSITE direction must be safe: a late-straggler batch
      // carrying a few events of the now-COMPLETE day must not retract
      // it and re-roll from the stragglers alone (the direction guard:
      // only stored < recount days repair from a batch)
      val beforeStraggler = Sketches
        .distinctUsersFromRollup(spark, ingestDir, Sketches.DefaultRanges)
        .orderBy("range_id", "event_type").collect()
      writeBatch("day10_stragglers",
        ev.where(day && pmod(col("event_id"), lit(97)) === 0))
      q.processAllAvailable()
      val afterStraggler = Sketches
        .distinctUsersFromRollup(spark, ingestDir, Sketches.DefaultRanges)
        .orderBy("range_id", "event_type").collect()
      assert(afterStraggler.sameElements(beforeStraggler),
        "a late-straggler batch destroyed a complete day")
    } finally q.stop()
  }

  test("theta/KLL/freq columns of a stream-built rollup serve within their verdict bounds") {
    import graft.ops.Sketches
    import graft.functions.{FreqFunctions, KllFunctions, ThetaFunctions}
    val ev = Tables.events(spark, sfDir)
    val streamDir = Files.createTempDirectory("graft-rollup-sk-stream")
    val ingestDir = Files.createTempDirectory("graft-rollup-sk-ingest").toString
    val ckptDir = Files.createTempDirectory("graft-rollup-sk-ckpt").toString
    def writeBatch(name: String, cond: org.apache.spark.sql.Column): Unit = {
      val tmp = Files.createTempDirectory("graft-rollup-sk-batch").toString
      ev.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, java.nio.file.Path.of(s"$streamDir/$name.parquet"))
    }
    writeBatch("day01_15", to_date(col("ts")) < lit("2024-01-16"))
    val stream = EventsStreaming.readEvents(spark, streamDir.toString, maxFilesPerTrigger = 1,
      schema = Some(spark.read.parquet(s"$sfDir/events.parquet").schema))
    val q = EventsStreaming.rollupIngest(stream, ingestDir, ckptDir)
    q.processAllAvailable()
    writeBatch("day16_31", to_date(col("ts")) >= lit("2024-01-16"))
    q.processAllAvailable()
    q.stop()
    val daily = spark.read.parquet(s"$ingestDir/daily")
    val evd = ev.withColumn("day", to_date(col("ts")))
    // THETA retention (the q151 algebra) from the streamed artifact:
    // below k the sketch is exact-mode, so the weekly estimates and the
    // intersection equal the exact counts outright at this SF (past k
    // only the 10 % bound would be pinned — the verdict-flag rule)
    val (a1, a2) = ("2024-01-08", "2024-01-15")
    val (b1, b2) = ("2024-01-15", "2024-01-22")
    def week(from: String, until: String, name: String) =
      daily.where(col("day") >= lit(from) && col("day") < lit(until))
        .groupBy("event_type")
        .agg(ThetaFunctions.thetaUnionAgg(col("users_theta")).as(name))
    val approx = week(a1, a2, "sk_a").join(week(b1, b2, "sk_b"), Seq("event_type"))
      .select(col("event_type"),
        ThetaFunctions.thetaEstimate(col("sk_a")).as("ea"),
        ThetaFunctions.thetaIntersectEstimate(col("sk_a"), col("sk_b")).as("eboth"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def users(from: String, until: String) =
      evd.where(col("day") >= lit(from) && col("day") < lit(until))
        .select("event_type", "user_id").distinct()
    val exactA = users(a1, a2).groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactBoth = users(a1, a2).join(users(b1, b2), Seq("event_type", "user_id"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactA.foreach { case (t, n) =>
      assert(approx(t)._1 == n, s"streamed theta week-A estimate for $t: ${approx(t)._1} != $n")
      assert(approx(t)._2 == exactBoth.getOrElse(t, 0L),
        s"streamed theta intersection for $t drifted")
    }
    // KLL (the q152 rank gate — estimates are randomized, the rank
    // guarantee is the contract): the streamed p50's exact rank must
    // sit within ±5 % of the median
    val kll = daily.where(col("day") >= lit(a1) && col("day") < lit(a2))
      .groupBy("event_type")
      .agg(KllFunctions.kllUnionAgg(col("value_kll")).as("sk"))
      .select(col("event_type"), KllFunctions.kllQuantile(col("sk"), 0.5).as("p50"))
    val ranked = evd.where(col("day") >= lit(a1) && col("day") < lit(a2))
      .join(broadcast(kll), Seq("event_type"))
      .groupBy("event_type").agg(
        sum(when(col("value") < col("p50"), 1L).otherwise(0L)).as("lt"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le"),
        count(col("value")).as("n"))
      .collect()
    assert(ranked.nonEmpty)
    ranked.foreach { r =>
      val (lt, le, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lt + 1 <= 0.55 * n && le >= 0.45 * n,
        s"streamed KLL p50 rank out of bound for ${r.getString(0)}: lt=$lt le=$le n=$n")
    }
    // FREQ (the q157 bound theorem): per-type week-A user counts must
    // sit within [lb, ub] of the streamed artifact's merged sketch
    val freq = daily.where(col("day") >= lit(a1) && col("day") < lit(a2))
      .groupBy("event_type")
      .agg(FreqFunctions.freqUnionAgg(col("users_freq")).as("sk"))
    val counts = evd.where(col("day") >= lit(a1) && col("day") < lit(a2))
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
    val bounds = counts.join(broadcast(freq), Seq("event_type"))
      .select(col("event_type"), col("c"),
        FreqFunctions.freqLowerBound(col("sk"), col("user_id")).as("lb"),
        FreqFunctions.freqUpperBound(col("sk"), col("user_id")).as("ub"))
      .collect()
    assert(bounds.nonEmpty)
    bounds.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(1) <= r.getLong(3),
        s"streamed freq bound violated for ${r.getString(0)}")
    }
  }

  test("mapGroupsWithState running counts converge to batch totals") {
    val dir = mkStreamDir(1)
    val stream = EventsStreaming.readEvents(spark, dir, maxFilesPerTrigger = 1)
    EventsStreaming.runToMemory(
      EventsStreaming.runningUserCounts(spark, stream).toDF(), "counts_stream", OutputMode.Update())
    // running counts only grow, so the max per user is the final state
    val finalCounts = spark.table("counts_stream")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .orderBy("user_id").collect()
    val batch = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy("user_id").collect()
    assert(finalCounts.sameElements(batch))
  }
}
