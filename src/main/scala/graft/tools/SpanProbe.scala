package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probe for q103 (duplicated-span profile):
  * isolates scan, kernel, explode, fingerprint aggregate, and the full
  * query so regressions can be attributed. Usage:
  *
  *   sbt "runMain graft.tools.SpanProbe <sfDir>"
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $tag ${(System.nanoTime - t0) / 1e9}%.2f s -> $r")
    }
    val docs = graft.ops.Tables.documents(spark, dir)
    time("scan only")(docs.select(count(lit(1))).collect()(0))
    val fps = graft.functions.TextFunctions.winnowFingerprints(col("text"), 20, 8)
    time("kernel size only")(docs.where(length(col("text")) >= 27)
      .select(sum(size(fps))).collect()(0))
    val sel = docs.where(length(col("text")) >= 27)
      .select(col("doc_id"), col("source"), explode(fps).as("fp"))
    time("explode count")(sel.select(count(lit(1))).collect()(0))
    time("groupBy fp")(sel.groupBy("fp").agg(countDistinct("doc_id").as("nd"))
      .select(count(lit(1)), sum("nd")).collect()(0))
    time("full q103")(graft.ops.TextAnalysis.dupSpans(spark, dir).collect().length)
    time("full q103 again")(graft.ops.TextAnalysis.dupSpans(spark, dir).collect().length)
    spark.stop()
  }
}
