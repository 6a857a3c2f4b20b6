package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate the per-file fixed cost of scanning a partitioned tiny
  * store: write the same 16 k-row relation at several partition-dir
  * counts and time repeated full scans of each.
  */
object ScanCostProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)
    val base = java.nio.file.Files.createTempDirectory("scanprobe").toString
    val df = spark.range(16000)
      .select(col("id").as("vec_id"), (col("id") % 8).as("tbl"),
        pmod(col("id") * 7919, lit(256)).as("bucket"))
    val osb = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    for (nb <- Seq(64, 16, 4, 1)) {
      val p = s"$base/b$nb"
      df.withColumn("bb", pmod(col("vec_id"), lit(nb.toLong)))
        .repartition(col("bb"))
        .write.partitionBy("bb").parquet(p)
      // warm once, then time 3 scans
      spark.read.parquet(p).count()
      for (i <- 1 to 3) {
        val c0 = osb.getProcessCpuTime; val t0 = System.nanoTime()
        spark.read.parquet(p).where(col("bb").isin((0L until nb.toLong): _*))
          .groupBy("vec_id").count().count()
        println(f"dirs=$nb%3d run$i wall=${(System.nanoTime() - t0) / 1e9}%.3f " +
          f"cpu=${(osb.getProcessCpuTime - c0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
