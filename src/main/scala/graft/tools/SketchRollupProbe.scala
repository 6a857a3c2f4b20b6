package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Sketches, Tables}

/** Measures the rollup-artifact economics the q148–q153 gates assert
  * qualitatively: (a) artifact size vs the raw events table — the
  * ratio that decides whether a year of rollups stays resident while
  * the raw table lives in cold storage; (b) warm serve wall of a
  * range-distinct from the rollup vs the exact distinct over raw
  * events; (c) the same for range quantiles. Run against a testdata
  * or ScaleGen events dir:
  *
  *   sbt "runMain graft.tools.SketchRollupProbe /tmp/scale100x"
  */
object SketchRollupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)

    def timed(what: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $what%-42s ${s}%8.3f s")
      s
    }

    def dirBytes(p: java.io.File): Long =
      if (p.isDirectory) Option(p.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
      else p.length()

    val ev = Tables.events(spark, dir)
    val nEvents = ev.count()
    val artifact = java.nio.file.Files.createTempDirectory("graft-rollup-probe").toString
    timed("rollup build (all days, 3 sketch columns)") {
      Sketches.saveDailyRollup(ev, artifact)
    }
    val rawBytes = dirBytes(new java.io.File(s"$dir/events.parquet"))
    val artBytes = dirBytes(new java.io.File(s"$artifact/daily"))
    println(f"[probe] events=$nEvents%,d raw=${rawBytes / 1e6}%.1f MB " +
      f"artifact=${artBytes / 1e6}%.3f MB ratio=${rawBytes.toDouble / artBytes}%.0fx")

    val ranges = Sketches.DefaultRanges
    // warm both paths once, then time the second pass (serve-path cost,
    // not JIT/listing noise)
    def serveRollup(): Unit =
      Sketches.distinctUsersFromRollup(spark, artifact, ranges).collect()
    def serveRaw(): Unit = {
      val d = ev.withColumn("day", to_date(col("ts")))
      ranges.map { case (rid, from, until) =>
        d.where(col("day") >= lit(from) && col("day") < lit(until))
          .groupBy("event_type").agg(countDistinct("user_id").as("u"))
          .select(lit(rid).as("range_id"), col("event_type"), col("u"))
      }.reduce(_.unionByName(_)).collect()
    }
    serveRollup(); serveRaw()
    val tSketch = timed("range-distinct from rollup (warm)")(serveRollup())
    val tRaw = timed("range-distinct from raw events (warm)")(serveRaw())
    println(f"[probe] distinct speedup ${tRaw / tSketch}%.1fx at this SF " +
      "(grows linearly with events/day; the artifact side is constant)")
    spark.stop()
  }
}
