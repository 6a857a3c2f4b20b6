package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Measures WHERE the flat IVF codebook stops bounding per-query work
  * and what the two-level index buys back — the probe the
  * [[Similarity.adaptiveIvfConfig]] scaladoc promises behind its 4096-
  * centroid cap.
  *
  * Method: synthesize an n-vector embeddings corpus (deterministic
  * xxhash64 components — isotropic, which is the HARD case for recall),
  * then for the flat adaptive config and a two-level config of ~equal
  * probed-list count, measure (a) index build wall, (b) query wall over
  * a 50-query batch, (c) recall@3 vs exact brute force, (d) the
  * measured list-length distribution — the quantity the cap stops
  * bounding: flat lists grow as n/4096 past n ≈ 4.19 M while two-level
  * lists stay ≈ n/(nCoarse·nSub).
  *
  *   sbt "runMain graft.tools.IvfCeilingProbe 2000000"
  *   sbt "runMain graft.tools.IvfCeilingProbe 8000000"
  */
object IvfCeilingProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nQueries = if (args.length > 1) args(1).toInt else 50
    val k = 3
    val dir = s"/tmp/ivfprobe_$n"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)

    if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
      println(s"[probe] synthesizing $n vectors at $dir")
      spark.range(n).toDF("vec_id")
        .select(col("vec_id"),
          transform(sequence(lit(1), lit(64)),
            i => ((pmod(xxhash64(col("vec_id"), i), lit(2048L)) - 1024L) / 1024.0)
              .cast("float")).as("embedding"),
          (col("vec_id") % 20).as("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    }

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def recallOf(exact: DataFrame, approx: DataFrame, nExact: Long): Double = {
      val hits = exact.join(approx.select(col("q_id"), col("neighbor_id"), lit(1).as("h")),
        Seq("q_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("h"), lit(0)))).collect()(0).getLong(0)
      hits.toDouble / nExact
    }
    def listStats(assigned: DataFrame, keys: Seq[String]): Unit = {
      val sizes = assigned.groupBy(keys.map(col): _*).count()
        .agg(count(lit(1)).as("lists"), avg("count").as("mean"),
          expr("percentile(count, 0.5)").as("p50"),
          expr("percentile(count, 0.95)").as("p95"), max("count").as("max"))
        .collect()(0)
      println(f"[probe]   lists=${sizes.getLong(0)} mean=${sizes.getDouble(1)}%.0f " +
        f"p50=${sizes.getDouble(2)}%.0f p95=${sizes.getDouble(3)}%.0f max=${sizes.getLong(4)}")
    }

    val exact = timed("brute force (baseline)") {
      val e = Similarity.bruteForceTopK(spark, dir, nQueries, k)
        .select(col("q_id"), col("neighbor_id")).cache()
      e.count(); e
    }
    val nExact = exact.count()

    // "sweeponly": skip the flat section (2511 s of build at 8 M that
    // the probe-budget sweep doesn't consume — its baseline is exact)
    val flatQuery: Long = if (args.contains("sweeponly")) -1L else {
      // flat adaptive config (the cap binds past ~4.19M)
      val flatCents = 0 // adaptive
      spark.catalog.clearCache()
      graft.ops.StageRegistry.releaseSession(spark)
      exact.cache().count()
      val flat = timed(s"flat IVF build+query (adaptive cap)") {
        val df = Similarity.ivfTopK(spark, dir, flatCents, nProbe = 8, nQueries, k).cache()
        df.count(); df
      }
      println(f"[probe] flat recall@$k = ${recallOf(exact, flat, nExact)}%.3f")
      listStats(Similarity.ivfAssignments(spark, dir, flatCents), Seq("cent_id"))
      timed("flat query only (warm index)") {
        Similarity.ivfTopK(spark, dir, flatCents, nProbe = 8, nQueries, k).count()
      }
    }

    // two-level config with ~the same probed-list COUNT (8 lists) but
    // list length n/(nCoarse*nSub) instead of n/4096
    val lists = math.max(16L, n / 1024)
    val nCoarse = math.min(4096L, math.max(8L, math.round(math.sqrt(lists.toDouble) * 4))).toInt
    val nSub = math.max(4L, (lists + nCoarse - 1) / nCoarse).toInt
    spark.catalog.clearCache()
    graft.ops.StageRegistry.releaseSession(spark)
    exact.cache().count()
    println(s"[probe] two-level config: nCoarse=$nCoarse nSub=$nSub (${nCoarse.toLong * nSub} lists)")
    val two = timed(s"two-level IVF build+query") {
      val df = Similarity.twoLevelIvfTopK(spark, dir, nCoarse, nSub,
        nProbe1 = 4, nProbe2 = 2, nQueries, k).cache()
      df.count(); df
    }
    println(f"[probe] two-level recall@$k = ${recallOf(exact, two, nExact)}%.3f")
    val (_, _, assigned2) = Similarity.twoLevelIvfStage(spark, dir, nCoarse, nSub)
    listStats(assigned2, Seq("cent_id", "sub_id"))
    val twoQuery = timed("two-level query only (warm index)") {
      Similarity.twoLevelIvfTopK(spark, dir, nCoarse, nSub,
        nProbe1 = 4, nProbe2 = 2, nQueries, k).count()
    }
    println(s"[probe] done n=$n flatWarmQuery/twoWarmQuery inline above " +
      s"($flatQuery/$twoQuery rows)")

    // --- probe sweep: the recall buy-back measurement ---------------
    // The index is warm (session stages cached); each (nProbe1, nProbe2)
    // point is query-side only. Rows: recall@k, warm query wall, and
    // scanned rows (lists probed x mean list length) — the evidence
    // behind adaptiveTwoLevelConfig's probe constants: pick the minimum
    // scanned-rows config with recall >= 0.95 at every measured n.
    if (args.contains("sweep") || args.contains("sweeponly")) {
      val meanList = n.toDouble / (nCoarse.toLong * nSub)
      println(f"[probe] sweep: nCoarse=$nCoarse nSub=$nSub meanList=$meanList%.0f")
      println("[probe] nProbe1\tnProbe2\tlists\t~rows/query\trecall@3\twall_s")
      // p2 = nSub is the "whole probed cell" point: the 2 M sweep showed
      // recall is a function of p2 ALONE (saturating at 0.94 with p2 = 8
      // of 12) — the loss is within-cell sub-RANKING, not missed cells,
      // so scanning entire top-p1 cells is the recall ceiling per p1
      for (p1 <- Seq(2, 4, 8, 16, 32, 64) if p1 <= nCoarse;
           p2 <- Seq(2, 4, 8, nSub).distinct if p2 <= nSub) {
        val t0 = System.nanoTime()
        val df = Similarity.twoLevelIvfTopK(spark, dir, nCoarse, nSub,
          p1, p2, nQueries, k).cache()
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        val r = recallOf(exact, df, nExact)
        df.unpersist(blocking = false)
        println(f"[probe] $p1\t$p2\t${p1 * p2}\t${p1 * p2 * meanList}%.0f\t$r%.3f\t$wall%.1f")
      }
    }
    spark.stop()
  }
}
