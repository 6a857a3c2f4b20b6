package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: run one query N times and print its formatted plan.
  * Usage: runMain graft.Profile <queryName> <sfDir> [runs]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    val fn = SparkEntry.queries(name)
    sys.env.get("GRAFT_WARM_DIR").foreach { wd =>
      val t0 = System.nanoTime()
      fn(spark, wd).count()
      println(f"[profile] $name warmup on $wd: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
