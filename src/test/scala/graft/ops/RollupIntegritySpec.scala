package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Day-integrity guard of the sketch rollup (verifyDays/repairDays/
  * appendDailyDeltaVerified) and the q157 frequency-sketch serve.
  *
  * The day-granular replay guard's known gap: a PARTIAL-day append
  * followed by a replay of the full day is silently dropped (the
  * anti-join sees the day as already indexed). The rollup stores exact
  * per-day event counts, so the verified append detects the
  * disagreement and repairs for ∝ one-day cost. */
class RollupIntegritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val splitDay = "2024-01-20"

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ev: DataFrame = Tables.events(spark, dir)

  /** The artifact's served essence: per-(day, type) exact counts plus
    * the HLL and theta estimates (both deterministic functions of a
    * day's value set at this scale) — byte-compare-free convergence. */
  private def essence(indexDir: String): Seq[String] =
    spark.read.parquet(s"$indexDir/daily")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("event_type"),
        col("n_events"),
        hll_sketch_estimate(col("users_hll")).as("hll_est"),
        graft.functions.ThetaFunctions.thetaEstimate(col("users_theta")).as("theta_est"))
      .orderBy("day", "event_type")
      .collect().map(_.toString).toSeq

  test("partial-day append: plain replay is a silent no-op, verifyDays flags it, verified append repairs") {
    val broken = tmpDir("graft-rollup-partial")
    val mono = tmpDir("graft-rollup-mono")
    try {
      Sketches.saveDailyRollup(ev, mono)
      Sketches.saveDailyRollup(ev.where(to_date(col("ts")) < lit(splitDay)), broken)
      val tail = ev.where(to_date(col("ts")) >= lit(splitDay))
      // the partial ingest: only even event_ids of the tail days land
      Sketches.appendDailyDelta(tail.where(pmod(col("event_id"), lit(2)) === 0), broken)
      // the documented gap: a plain replay of the FULL tail is dropped
      // day-granularly — nothing changes
      val afterPartial = essence(broken)
      Sketches.appendDailyDelta(tail, broken)
      assert(essence(broken) == afterPartial,
        "the plain day-granular guard should silently drop the replay (the gap)")
      assert(essence(broken) != essence(mono), "the partial day must actually disagree")
      // the integrity half: verifyDays names exactly the tail days
      val flagged = Sketches.verifyDays(spark, broken, tail)
      val expectedDays = tail.select(to_date(col("ts")).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      assert(flagged == expectedDays, s"verifyDays flagged $flagged, expected $expectedDays")
      // ...and the verified append converges to the monolithic artifact
      val repaired = Sketches.appendDailyDeltaVerified(tail, broken)
      assert(repaired == expectedDays)
      assert(essence(broken) == essence(mono),
        "repaired artifact diverged from the monolithic rollup")
    } finally { rm(new java.io.File(broken)); rm(new java.io.File(mono)) }
  }

  test("the verified append is idempotent on a healthy artifact") {
    val out = tmpDir("graft-rollup-verified")
    try {
      Sketches.saveDailyRollup(ev.where(to_date(col("ts")) < lit(splitDay)), out)
      val tail = ev.where(to_date(col("ts")) >= lit(splitDay))
      assert(Sketches.appendDailyDeltaVerified(tail, out).nonEmpty == false)
      val once = essence(out)
      // the production retry: repairs nothing, appends nothing
      assert(Sketches.appendDailyDeltaVerified(tail, out) == Nil)
      assert(essence(out) == once, "a replayed verified append changed the artifact")
      assert(Sketches.verifyDays(spark, out, ev) == Nil,
        "a healthy full-corpus recount should verify clean")
    } finally rm(new java.io.File(out))
  }

  test("LongsSketch bound theorem holds in estimation mode across partition layouts") {
    import graft.functions.FreqFunctions._
    import spark.implicits._
    // skewed synthetic stream far past maxMapSize = 64 counters: item i
    // of 600 appears 1 + (i*2654435761 mod 97) + heavy boost for i < 10
    val counts = (0L until 600L).map(i =>
      i -> (1L + Math.floorMod(i * 2654435761L, 97L) + (if (i < 10) 3000L else 0L)))
    val rows = counts.flatMap { case (i, c) => Seq.fill(c.toInt)(i) }
    for (layout <- Seq(1, 7, 32)) {
      val df = rows.toDF("item").repartition(layout)
      val sk = df.agg(freqSketchAgg(col("item"), 64).as("sk"))
      val verdict = sk.crossJoin(counts.toDF("item", "exact"))
        .select(col("item"), col("exact"),
          freqLowerBound(col("sk"), col("item")).as("lb"),
          freqUpperBound(col("sk"), col("item")).as("ub"))
        .collect()
      verdict.foreach { r =>
        val (exact, lb, ub) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(lb <= exact && exact <= ub,
          s"bound theorem violated at layout $layout item ${r.getLong(0)}: " +
            s"lb=$lb exact=$exact ub=$ub")
      }
      // every genuinely heavy item (count > maximum error) must be
      // tracked with a positive lower bound — the capture guarantee
      verdict.filter(_.getLong(1) >= 3000L).foreach { r =>
        assert(r.getLong(2) > 0L, s"heavy item ${r.getLong(0)} not captured at layout $layout")
      }
    }
  }

  test("q157 verdict: nonempty, every row captured within bound") {
    val out = Sketches.rangeHeavyHitters(spark, dir).collect()
    assert(out.nonEmpty, "the mean-relative heavy set is empty at sf0.001")
    assert(out.forall(_.getAs[Long]("captured_bounded") == 1L),
      "a heavy hitter fell outside the merged sketch's bound theorem")
  }
}
