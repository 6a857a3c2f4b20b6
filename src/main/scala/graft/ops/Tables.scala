package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata table loader. Every operator reads through here so the scan
  * path (parquet, column pruning, filter pushdown) is uniform. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events table carries TIMESTAMP(NANOS) parquet columns, which
    // Spark 4 rejects outright unless they are surfaced as raw longs.
    // Setting this here (runtime SQLConf, no-op for non-nano files) keeps
    // the library usable in sessions we don't build ourselves.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Events with `ts` normalized to a micro-precision TimestampType
    * column regardless of the underlying parquet physical type (NANOS →
    * integer-div by 1000; integer division keeps full precision — nanos
    * since epoch overflow double's 2^53 exact-integer range). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
}
