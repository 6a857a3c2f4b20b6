package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Measures the LSH scale knob the Similarity scaladoc prescribes: as the
  * corpus grows, widen `bits` (bucket population ∝ n/2^bits) and trade
  * tables/probes to hold recall. For each (bits, tables, flips) config
  * this times lshTopK end-to-end on a FRESH signature stage and scores
  * recall@k against the exact brute-force answer on the same queries —
  * the evidence that the documented knob actually works at 100x, not
  * just on paper.
  *
  *   sbt "runMain graft.tools.AnnScaleProbe /tmp/scale100x 200"
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100x")
    val nQueries = if (args.length > 1) args(1).toInt else 200
    val k = 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)

    val exact = Similarity.bruteForceTopK(spark, dir, nQueries, k)
      .select(col("q_id"), col("neighbor_id")).cache()
    val nExact = exact.count()

    // sf0.1-tuned default first, then the wide-bucket configs the scale
    // path prescribes (bits x tables <= 64: tables hash disjoint dim ranges)
    val configs = Seq((8, 8, 2), (12, 5, 2), (16, 4, 2))
    configs.foreach { case (bits, tables, flips) =>
      // time the FULL path including the signature build: clearCache so a
      // prior config's stage never subsidizes this one
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val approx = Similarity.lshTopK(spark, dir, nQueries, k, bits, tables, flips)
        .select(col("q_id"), col("neighbor_id"), lit(1).as("hit"))
      val hits = exact.join(approx, Seq("q_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0)))).collect()(0).getLong(0)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"bits=$bits%2d tables=$tables flips=$flips " +
        f"wall=$wall%7.2fs recall@$k=${hits.toDouble / nExact}%.3f " +
        f"(buckets/table=${1 << bits}, masks=${Similarity.probeMasks(bits, flips).size})")
    }
    spark.stop()
  }
}
