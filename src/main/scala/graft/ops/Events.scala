package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table (batch forms; the
  * streaming equivalents live in graft.streaming).
  *
  * Timestamps are emitted as formatted strings and durations as integer
  * microseconds — both bit-stable across engines — because the events
  * table is written with nanosecond parquet timestamps, which Spark reads
  * at microsecond precision while other engines keep ns; comparing raw
  * timestamp surfaces would hash-mismatch spuriously.
  */
object Events {

  /** Tumbling 1-hour windows: count + revenue per (window, event_type).
    * Epoch-aligned `date_trunc` is the batch equivalent of
    * `window($"ts", "1 hour")` (same bucketing, scalar output). */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour_start", "event_type")

  /** THE session rule (30-minute inactivity gap): lag → new-session
    * flag → cumulative sum, all in integer microseconds. One shared
    * definition — q13, q80's sweep, and q85's transitions must agree on
    * what a session is, so they all call this instead of re-deriving
    * it. Adds `us` and `session_id` columns to the events. */
  private def sessionized(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cumulative = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_sess",
        when(lag("us", 1).over(byUser).isNull || col("us") - lag("us", 1).over(byUser) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(cumulative))
  }

  /** Gap-based sessionization: per-session event counts, duration, and
    * value (q13). */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    sessionized(spark, dir)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max("us") - min("us")).as("duration_us"),
        round(sum("value"), 2).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Gap-based sessions via the built-in `session_window` (the native
    * Catalyst session operator — merges events closer than the gap;
    * equivalent to the lag/cumsum formulation in [[sessions]] except at
    * exact-gap boundaries, which cannot occur in microsecond data).
    * Bounds emitted as integer micros for cross-engine determinism. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "start_us")

  /** Two-phase salted aggregation — the hot-key skew mitigation. Phase 1
    * shuffles on (key, salt): a key holding 20% of a 100 TB table spreads
    * over `salt` reducers instead of melting one. Phase 2 merges the
    * tiny per-salt partials. The salt is a deterministic pmod of the row
    * id (not rand()) so results are reproducible. Identical answer to a
    * plain groupBy — the oracle IS the plain groupBy. */
  def saltedTypeStats(spark: SparkSession, dir: String, salt: Int = 16): DataFrame =
    Tables.events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(salt)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum("value").as("pv"))
      .groupBy("event_type")
      .agg(sum("pn").cast("long").as("n"), round(sum("pv"), 2).as("sum_value"))
      .orderBy("event_type")

  /** Semi-structured extraction: pull the numeric `k` field out of the
    * JSON `props` column (`get_json_object` is codegen'd; no UDF) and
    * aggregate by decile bucket. */
  def propsBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
      .where(col("k").isNotNull)
      .groupBy(expr("k div 10").as("k_bucket"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("k_bucket")

  /** Cross-table as-of join: for each event, the user's most recent order
    * at-or-before the event time (user_id ↔ o_custkey). Composed from a
    * union + last_value-ignore-nulls window — preference order (a) of the
    * custom-operator ladder: a tagged union sorted per key is exactly the
    * merge an as-of join performs, and Spark plans it as one shuffle +
    * one sort, the same cost as a dedicated sort-merge as-of operator.
    * The oracle is DuckDB's NATIVE `ASOF JOIN`, so the semantics are
    * checked against an independent first-class implementation. */
  def asofUserOrder(spark: SparkSession, dir: String): DataFrame = {
    // one order per (user, date): order dates are day-granular, so a user
    // can have several orders at the same as-of key — an ambiguity every
    // as-of implementation resolves arbitrarily. Dedup makes the match
    // unique and the oracle deterministic.
    val perDay = Window.partitionBy("o_custkey", "o_orderdate").orderBy(desc("o_orderkey"))
    val orders = Tables(spark, dir, "orders")
      .withColumn("dr", row_number().over(perDay)).where(col("dr") === 1)
      .select(col("o_custkey").as("user_id"),
        // o_orderdate surfaces as TIMESTAMP_NTZ; session TZ is UTC so the
        // LTZ cast is value-preserving
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        lit(null).cast("long").as("event_id"),
        col("o_orderkey"))
    val events = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), lit(null).cast("long").as("o_orderkey"))
    // tag=0 sorts orders before events at equal timestamps → "at-or-before"
    val tagged = orders.withColumn("tag", lit(0))
      .unionByName(events.withColumn("tag", lit(1)))
    val w = Window.partitionBy("user_id").orderBy("us", "tag", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_order", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("last_order"))
      .orderBy("event_id")
  }

  /** As-of lookup: for each purchase, the user's most recent prior signup
    * event (an as-of join against the same stream, composed from window
    * functions — preference order (a) of the custom-operator ladder:
    * built-ins express it, so no custom plan node is needed). */
  def purchaseAfterSignup(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .withColumn("prior_signup",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(byUser))
      .where(col("event_type") === "purchase")
      .select("event_id", "user_id", "prior_signup")
      .orderBy("event_id")
  }

  /** q80: peak concurrent sessions per day — the sweep-line / interval
    * overlap-counting operator. Sessions (q13's gap rule) explode to the
    * calendar days they touch, clip to day bounds, then each emits
    * +1/(end+1µs)−1 deltas; a per-day running sum's max is the peak.
    * End+1µs makes the boundary exclusive WITHOUT tie-break rules, and
    * netting deltas per (day, µs) first means the running sum never sees
    * an ambiguous intra-timestamp order.
    *
    * Scale shape: the sweep partitions by DAY (bounded state per
    * partition, parallel across days) instead of one global ordering —
    * the day-clip explode is what buys that partitioning; sessions
    * crossing midnight contribute to both days. */
  def maxConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionized(spark, dir)
      .groupBy("user_id", "session_id")
      .agg(min("us").as("s_us"), max("us").as("e_us"))
    val clipped = sess
      .select(col("s_us"), col("e_us"),
        explode(sequence(to_date(timestamp_micros(col("s_us"))),
          to_date(timestamp_micros(col("e_us"))))).as("day_d"))
      .select(
        date_format(col("day_d"), "yyyy-MM-dd").as("day"),
        greatest(col("s_us"), unix_micros(col("day_d").cast("timestamp"))).as("cs"),
        least(col("e_us"), unix_micros(date_add(col("day_d"), 1).cast("timestamp")) - 1).as("ce"))
    val deltas = clipped
      .select(col("day"), explode(array(
        struct(col("cs").as("us"), lit(1L).as("d")),
        struct((col("ce") + 1).as("us"), lit(-1L).as("d")))).as("x"))
      .select(col("day"), col("x.us").as("us"), col("x.d").as("d"))
    val wDay = Window.partitionBy("day").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.groupBy("day", "us").agg(sum("d").as("nd"))
      .withColumn("conc", sum("nd").over(wDay))
      .groupBy("day").agg(max("conc").cast("long").as("max_concurrent"))
      .orderBy("day")
  }

  /** q81: weekly cohort retention — users bucketed by first-activity
    * week, activity counted per (cohort, weeks-since) cell: the
    * retention matrix every growth dashboard renders. Week offsets are
    * exact integer day arithmetic between Monday-truncated dates (both
    * engines truncate weeks to Monday), so no float drift. Two hash
    * aggregates plus one shuffle join on user_id. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(spark, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val cohorts = weekly.groupBy("user_id").agg(min("wk").as("cohort"))
    weekly.join(cohorts, Seq("user_id"))
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("wk"), col("cohort")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** q85: session path transitions — the first-order Markov matrix of
    * event types within gap-sessions (q13's rule): for every observed
    * (prev → next) step, its count and conditional probability. The
    * path-analysis read behind "what do users do after X". One
    * sessionize pass (user-partitioned window), one hash aggregate over
    * (prev, next), and a |types|²-row window for the row-normalized
    * probabilities — nothing scales past the event count. Probabilities
    * are exact integer ratios rounded to 4. */
  def pathTransitions(spark: SparkSession, dir: String): DataFrame = {
    val bySession = Window.partitionBy("user_id", "session_id").orderBy("us", "event_id")
    val steps = sessionized(spark, dir)
      .withColumn("prev_type", lag("event_type", 1).over(bySession))
      .where(col("prev_type").isNotNull)
    val counts = steps.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val perPrev = Window.partitionBy("prev_type")
    counts
      .withColumn("p", round(col("n") / sum("n").over(perPrev), 4))
      .orderBy("prev_type", "next_type")
  }

  /** q86: hourly volume anomalies — the monitoring read over event
    * streams: hours whose per-type count sits more than `zThresh`
    * sample standard deviations from that type's mean. Two hash
    * aggregates (hourly counts, then per-type moments) and a broadcast
    * join of the |types|-row stats back onto the hourly series. The
    * filter compares the ROUNDED z on both engines so last-ulp moment
    * differences cannot flip a boundary row. */
  def hourlyAnomalies(spark: SparkSession, dir: String, zThresh: Double = 2.0): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy("event_type")
      .agg(avg("n").as("mu"), stddev_samp("n").as("sigma"))
    hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", round((col("n") - col("mu")) / col("sigma"), 4))
      .where(abs(col("z")) > zThresh)
      .select("hour_start", "event_type", "n", "z")
      .orderBy("hour_start", "event_type")
  }

  /** q84: trailing-7-day active users per day — the sliding-window
    * distinct count (WAU) no tumbling window expresses. Each (user, day)
    * activity fact is exploded to the 7 report days it keeps the user
    * active for, then one countDistinct per report day; report days are
    * clamped to the observed range so no day reports a partial lookback
    * tail past the data. Cost is a fixed 7× row amplification of the
    * per-day DISTINCT facts (not raw events), then one hash aggregate —
    * the scalable exact form; a sketch union (HLL per day) is the
    * approximate path at extreme cardinality. */
  def rollingActive(spark: SparkSession, dir: String, windowDays: Int = 7): DataFrame = {
    val facts = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val bounds = facts.agg(max("d").as("max_d"))
    facts
      .select(col("user_id"),
        explode(sequence(col("d"), date_add(col("d"), windowDays - 1))).as("report_d"))
      .join(broadcast(bounds), col("report_d") <= col("max_d"))
      .groupBy(date_format(col("report_d"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("day")
  }

  /** q73: ordered conversion funnel signup → view → click → purchase,
    * each stage within 24 h of the one before. Stage times chain as four
    * partition-wide conditional minima over the SAME user partitioning —
    * Catalyst plans ONE shuffle and stacks the Window operators on it
    * (each `t{i}` is a per-partition constant, so the next stage's
    * condition reads it per row). Null chaining matches SQL three-valued
    * logic: a missing stage nulls every later stage. The final global
    * roll-up is a single-row aggregate (counts per stage + exact µs
    * conversion-time sum). */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val day = 86400000000L // 24 h in µs
    def stage(tPrev: String, typ: String): Column =
      min(when(col("event_type") === typ &&
        col("us") > col(tPrev) && col("us") <= col(tPrev) + day, col("us"))).over(w)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("t1", min(when(col("event_type") === "signup", col("us"))).over(w))
      .withColumn("t2", stage("t1", "view"))
      .withColumn("t3", stage("t2", "click"))
      .withColumn("t4", stage("t3", "purchase"))
      .select("user_id", "t1", "t2", "t3", "t4").distinct()
      .agg(
        count(lit(1)).as("n_users"),
        count("t1").as("n_signup"), count("t2").as("n_view"),
        count("t3").as("n_click"), count("t4").as("n_purchase"),
        coalesce(sum(col("t4") - col("t1")), lit(0L)).cast("long").as("sum_convert_us"))
  }
}
