package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q148/q149 (daily HLL rollup artifact) and q150 (Misra-Gries heavy
  * hitters) contracts beyond the hash gates: the incremental build is
  * exactly the monolithic build, the day append is replay-safe, and
  * the MG verdict is partition-layout-independent (the gate's flag is
  * a theorem, not a lucky layout). */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q148 verdict: every (range, event_type) row is within bound") {
    val rows = Sketches.sketchDistinctRollup(spark, dir).collect()
    assert(rows.length == 10) // 2 ranges x 5 event types
    assert(rows.forall(_.getAs[Long]("within_bound") == 1L))
    // the mid-stream week is a strict subset of the full stream
    val byRange = rows.groupBy(_.getAs[Long]("range_id"))
    assert(byRange(1L).map(_.getAs[Long]("n_events")).sum <
      byRange(2L).map(_.getAs[Long]("n_events")).sum)
  }

  test("q149 incremental rollup serves exactly q148's answers") {
    val full = Sketches.sketchDistinctRollup(spark, dir).collect().toSeq
    val incr = Sketches.sketchRollupIncremental(spark, dir).collect().toSeq
    assert(incr == full)
  }

  test("replayed day append is a no-op") {
    val indexDir = Sketches.rollupDirFor(spark, s"$dir#rollup-incr:2024-01-25").get
    val before = spark.read.parquet(s"$indexDir/daily")
      .agg(count(lit(1)), sum("n_events")).collect().head
    // replay the whole delta (and some base days for good measure):
    // every day is already rolled up, so nothing may append
    Sketches.appendDailyDelta(
      Tables.events(spark, dir).where(to_date(col("ts")) >= lit("2024-01-20")), indexDir)
    val after = spark.read.parquet(s"$indexDir/daily")
      .agg(count(lit(1)), sum("n_events")).collect().head
    assert(after == before)
  }

  test("q153 corrected rollup serves exactly q148's answers; retraction bites") {
    val full = Sketches.sketchDistinctRollup(spark, dir).collect().toSeq
    val corrected = Sketches.sketchRollupCorrected(spark, dir).collect().toSeq
    assert(corrected == full)
    // retraction alone (no re-append) must change the served answer —
    // otherwise the gate proves nothing about the correction path
    val scratch = java.nio.file.Files.createTempDirectory("graft-retract").toString
    Sketches.saveDailyRollup(Tables.events(spark, dir), scratch)
    val before = Sketches.distinctUsersFromRollup(spark, scratch, Sketches.DefaultRanges)
      .agg(sum("n_events")).collect().head.getLong(0)
    Sketches.retractDays(spark, scratch, Seq("2024-01-09"))
    val after = Sketches.distinctUsersFromRollup(spark, scratch, Sketches.DefaultRanges)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(after < before)
  }

  test("q154 rolling actives: every day in bound, WAU >= DAU, WAU monotone-ish") {
    val rows = Sketches.rollingActives(spark, dir).collect()
    assert(rows.length >= 25) // ~30 days in the corpus
    assert(rows.forall(_.getAs[Long]("within_bound") == 1L))
    rows.foreach { r =>
      assert(r.getAs[Long]("wau_exact") >= r.getAs[Long]("dau_exact"))
    }
  }

  test("range serve prunes to the covered day partitions") {
    val indexDir = Sketches.rollupDirFor(spark, s"$dir#rollup-full").get
    val days = spark.read.parquet(s"$indexDir/daily")
      .where(col("day") >= lit("2024-01-08") && col("day") < lit("2024-01-15"))
      .select("day").distinct().collect().map(_.getDate(0).toString).sorted
    assert(days.nonEmpty && days.forall(d => d >= "2024-01-08" && d < "2024-01-15"))
  }

  test("rollup serve scan prunes day partitions in the executed plan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val indexDir = Sketches.rollupDirFor(spark, s"$dir#rollup-full").get
    val df = Sketches.distinctUsersFromRollup(spark, indexDir,
      Seq((1L, "2024-01-08", "2024-01-15")))
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      self ++ kids.flatMap(scans)
    }
    val allScans = scans(df.queryExecution.executedPlan)
    val rollupScans = allScans
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("daily")))
    assert(rollupScans.nonEmpty)
    // the headline claim: the SERVE plan contains no raw-events
    // relation at all — every file scan reads the artifact
    assert(allScans.size == rollupScans.size,
      s"serve plan scans a non-artifact relation: ${allScans.map(_.relation.location.rootPaths)}")
    // the day range must land as PARTITION filters (directory pruning),
    // not data filters — and actually prune: 7 of ~30 day dirs read
    rollupScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty, "day range fell out of partition pruning")
      assert(s.selectedPartitions.partitionCount == 7,
        s"expected 7 pruned day partitions, read ${s.selectedPartitions.partitionCount}")
    }
  }

  test("MG partial: bounded counters, underestimates, bounded undercount") {
    val rnd = new scala.util.Random(42)
    // zipf-ish: token i with weight ~ 1/(i+1)
    val stream = Seq.fill(20000)(s"t${(math.pow(rnd.nextDouble(), 3) * 200).toInt}")
    val k = 16
    val est = Sketches.mgPartials(stream.iterator, k).toMap
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.size <= k)
    est.foreach { case (t, e) =>
      assert(e <= exact(t), s"$t overestimated")
      assert(exact(t) - e <= stream.size / (k + 1), s"$t undercount out of bound")
    }
    // absent terms are bounded too: a true count above n/(k+1) must survive
    exact.foreach { case (t, c) =>
      if (c > stream.size / (k + 1)) assert(est.contains(t), s"heavy $t lost")
    }
  }

  test("q150 verdict is partition-layout-independent and fully captured") {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val narrow = Sketches.heavyHittersMgOf(docs.repartition(1), 1024, 500).collect().toSeq
    val wide = Sketches.heavyHittersMgOf(docs.repartition(7), 1024, 500).collect().toSeq
    assert(narrow == wide)
    assert(narrow.nonEmpty)
    assert(narrow.forall(_.getAs[Long]("captured_bounded") == 1L))
  }

  test("theta algebra: estimate/union/intersection exact below k, any layout") {
    import graft.functions.ThetaFunctions._
    def sk(from: Long, until: Long, parts: Int) =
      spark.range(from, until, 1, parts).agg(thetaSketchAgg(col("id")).as("sk"))
    val r = sk(0, 500, 1).crossJoin(sk(300, 800, 8).withColumnRenamed("sk", "sk_b"))
      .select(
        thetaEstimate(col("sk")).as("ea"),
        thetaEstimate(col("sk_b")).as("eb"),
        thetaIntersectEstimate(col("sk"), col("sk_b")).as("eboth"))
      .collect().head
    assert(r.getLong(0) == 500L && r.getLong(1) == 500L && r.getLong(2) == 200L)
    val diff = sk(0, 500, 1).crossJoin(sk(300, 800, 8).withColumnRenamed("sk", "sk_b"))
      .select(thetaDifferenceEstimate(col("sk"), col("sk_b")))
      .collect().head.getLong(0)
    assert(diff == 300L)
    // two partial sketches merged by the union AGGREGATE = the direct sketch
    val parts = sk(0, 400, 3).unionByName(sk(400, 800, 5))
    val merged = parts.agg(thetaUnionAgg(col("sk")).as("u"))
      .select(thetaEstimate(col("u"))).collect().head.getLong(0)
    assert(merged == 800L)
  }

  test("theta estimation mode: union/intersection bounds hold past k") {
    import graft.functions.ThetaFunctions._
    // 40k distinct values > k=2^14 retained — true estimation mode,
    // deterministic for a fixed input set
    def sk(from: Long, until: Long, parts: Int) =
      spark.range(from, until, 1, parts).agg(thetaSketchAgg(col("id")).as("sk"))
    val r = sk(0, 40000, 4).crossJoin(sk(20000, 60000, 8).withColumnRenamed("sk", "sk_b"))
      .select(
        thetaEstimate(col("sk")).as("ea"),
        thetaIntersectEstimate(col("sk"), col("sk_b")).as("eboth"),
        thetaDifferenceEstimate(col("sk"), col("sk_b")).as("ediff"))
      .collect().head
    assert(math.abs(r.getLong(0) - 40000L) <= 40000L * 3 / 100, s"union est ${r.getLong(0)}")
    assert(math.abs(r.getLong(1) - 20000L) <= 20000L * 10 / 100, s"intersect est ${r.getLong(1)}")
    assert(math.abs(r.getLong(2) - 20000L) <= 20000L * 10 / 100, s"diff est ${r.getLong(2)}")
  }

  test("MG bounds hold over randomized streams (fuzz)") {
    (0 until 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 2000 + rnd.nextInt(8000)
      val skew = 1 + rnd.nextInt(4)
      val stream = Seq.fill(n)(s"t${(math.pow(rnd.nextDouble(), skew) * 500).toInt}")
      val k = 8 << rnd.nextInt(4) // 8..64
      val est = Sketches.mgPartials(stream.iterator, k).toMap
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(est.size <= k)
      est.foreach { case (t, e) => assert(e <= exact(t) && exact(t) - e <= n / (k + 1)) }
      exact.foreach { case (t, c) =>
        if (c > n / (k + 1)) assert(est.contains(t), s"seed=$seed heavy $t lost")
      }
    }
  }

  test("q151 verdict: five in-bound rows, intersection within min(a, b)") {
    val rows = Sketches.thetaRetention(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Long]("within_bound") == 1L))
    rows.foreach { r =>
      val (a, b, both) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"),
        r.getAs[Long]("exact_both"))
      assert(both <= math.min(a, b) && both >= 0L)
    }
  }

  test("q155 churn: in-bound rows, churned <= week-A actives, algebra closes") {
    val churn = Sketches.thetaChurn(spark, dir).collect()
    assert(churn.length == 5)
    assert(churn.forall(_.getAs[Long]("within_bound") == 1L))
    // |A| = |A ∩ B| + |A \ B| exactly — the retention and churn gates
    // must account for every week-A user between them
    val ret = Sketches.thetaRetention(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_both"))).toMap
    churn.foreach { r =>
      val (a, both) = ret(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("exact_a") == a)
      assert(r.getAs[Long]("exact_churned") == a - both)
    }
  }

  test("KLL: exact below k, mergeable across layouts") {
    import graft.functions.KllFunctions._
    // 101 distinct values 0.0..100.0: below k=200 the sketch retains
    // everything, so INCLUSIVE quantiles are the exact order stats
    def sk(parts: Int) = TestSpark.spark.range(0, 101, 1, parts)
      .select((col("id") * lit(1.0)).as("v"))
      .agg(kllSketchAgg(col("v")).as("sk"))
    val direct = sk(1).select(
      kllQuantile(col("sk"), 0.5).as("p50"),
      kllQuantile(col("sk"), 0.95).as("p95")).collect().head
    assert(direct.getDouble(0) == 50.0 && direct.getDouble(1) == 95.0)
    // partial sketches over disjoint ranges merged by the union
    // aggregate = the direct one (101 values total, still exact mode)
    def part(from: Long, until: Long, parts: Int) =
      TestSpark.spark.range(from, until, 1, parts)
        .select((col("id") * lit(1.0)).as("v"))
        .agg(kllSketchAgg(col("v")).as("sk"))
    val merged = part(0, 60, 3).unionByName(part(60, 101, 2))
      .agg(kllUnionAgg(col("sk")).as("u"))
      .select(kllQuantile(col("u"), 0.5)).collect().head.getDouble(0)
    assert(merged == 50.0)
  }

  test("KLL estimation mode: rank guarantee holds past k") {
    import graft.functions.KllFunctions._
    // 100k uniform values >> k=200 — the estimate at rank phi must be
    // an item whose true normalized rank sits within the guarantee
    // (eps ~ 1.65% two-sided 99% at k=200; assert at 8%, far outside
    // any realistic draw of the randomized compaction)
    val q = spark.range(0, 100000, 1, 8)
      .select((col("id") * lit(1.0)).as("v"))
      .agg(kllSketchAgg(col("v")).as("sk"))
      .select(kllQuantile(col("sk"), 0.9)).collect().head.getDouble(0)
    assert(math.abs(q / 100000.0 - 0.9) <= 0.08, s"p90 estimate $q")
  }

  test("q152 verdict: every (range, event_type) row passes the rank gate") {
    val rows = Sketches.kllRangeQuantiles(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Long]("within_bound") == 1L))
    rows.foreach(r => assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p95_exact")))
  }

  test("MG capture guarantee under an adversarial tail (tiny k)") {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(7)
    // 3 heavy terms inside a sea of near-unique tail tokens
    // n = 2120; threshold n/12 ~ 177 — all three hot terms clear it
    val toks = Seq.fill(300)("hot1") ++ Seq.fill(220)("hot2") ++ Seq.fill(200)("hot3") ++
      (0 until 1400).map(i => s"tail_${i}_${rnd.nextInt(1000)}")
    val docs = rnd.shuffle(toks).grouped(40).map(_.mkString(" ")).toSeq
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val out = Sketches.heavyHittersMgOf(docs.repartition(5), 64, 12).collect()
    val terms = out.map(_.getAs[String]("term")).toSet
    assert(Set("hot1", "hot2", "hot3").subsetOf(terms))
    assert(out.forall(_.getAs[Long]("captured_bounded") == 1L))
  }
}
