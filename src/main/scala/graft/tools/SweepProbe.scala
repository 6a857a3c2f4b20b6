package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run the FULL-space q123 contamination sweep (every eval
  * id, default page width) and print pages + wall + verdict count — the
  * measurement behind BASELINE.md's "a full-space sweep is priced as
  * pages × per-page". Not part of the bench (its cost grows with the
  * corpus BY DESIGN: more eval docs = more retrieval work; the scale
  * claim is that each PAGE stays bounded, which the per-page wall here
  * makes checkable).
  *
  * Usage: runMain graft.tools.SweepProbe <sfDir> [batchWidth]
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batchWidth = if (args.length > 1) args(1).toLong else 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    val t0 = System.nanoTime()
    val n = graft.ops.Retrieval.contaminationRetrievalSweep(spark, sfDir,
      batchWidth = batchWidth).count()
    val wall = (System.nanoTime() - t0) / 1e9
    val pages = graft.ops.Retrieval.lastSweepBatches.get()
    println(f"[sweep-probe] dir=$sfDir width=$batchWidth pages=$pages " +
      f"verdicts=$n wall=$wall%.1fs per_page=${wall / math.max(pages, 1)}%.2fs")
    spark.stop()
  }
}
