package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run one SparkEntry query N times outside the bench
  * harness, print wall times and the formatted physical plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q34_simhash")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.contains("PROBE_EXPLAIN")) fn(spark, dir).explain("formatted")
    // the raw executedPlan string ExchangeAuditSpec counts over
    if (sys.env.contains("PROBE_SIMPLE"))
      println(fn(spark, dir).queryExecution.executedPlan.toString)
    spark.stop()
  }
}
