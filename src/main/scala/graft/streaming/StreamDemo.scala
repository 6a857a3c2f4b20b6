package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** Runnable streaming demo: stream an events parquet directory through
  * the watermarked hourly-window aggregation and print the result.
  *
  * Usage: runMain graft.streaming.StreamDemo [eventsDirOrFile]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val arg = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001/events.parquet"
    // Spark's file stream source takes a DIRECTORY; stage a lone file
    val argPath = java.nio.file.Path.of(arg)
    val src =
      if (java.nio.file.Files.isRegularFile(argPath)) {
        val dir = java.nio.file.Files.createTempDirectory("stream-demo")
        java.nio.file.Files.copy(argPath, dir.resolve(argPath.getFileName))
        dir.toString
      } else arg
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    val mode = if (args.length > 1) args(1) else "hourly"
    val events = EventsStreaming.readEvents(spark, src)
    mode match {
      case "sessions" =>
        EventsStreaming.runToMemory(
          EventsStreaming.closedSessions(spark, events).toDF(),
          "demo_sessions", OutputMode.Append())
        val out = spark.table("demo_sessions").orderBy("user_id", "start_us")
        println(s"[stream-demo] ${out.count()} closed sessions; first 5:")
        out.show(5, truncate = false)
      case _ =>
        EventsStreaming.runToMemory(
          EventsStreaming.hourlyCounts(events), "demo_hourly", OutputMode.Complete())
        val out = spark.table("demo_hourly").orderBy("hour_start", "event_type")
        println(s"[stream-demo] ${out.count()} (window, type) rows; first 10:")
        out.show(10, truncate = false)
    }
    spark.stop()
  }
}
