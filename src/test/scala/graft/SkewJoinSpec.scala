package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime half of the skew story (the
  * compile-time half is the deterministic salting in
  * Events.saltedTypeStats). A 90%-hot key would pin one reducer at
  * 100 TB; AQE detects the oversized shuffle partition at runtime and
  * splits it across multiple tasks. This spec lowers the detection
  * thresholds to local scale and observes the split in the executed
  * plan.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 500k rows, ~90% on key 0, with a fat payload to trip the byte threshold
      val big = spark.range(500000)
        .select(
          when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 1000).as("k"),
          concat(lit("x" * 64), $"id".cast("string")).as("payload"))
      val small = spark.range(1000).select($"id".as("k"), lit(1).as("tag"))
      // NB: no groupBy on the join key afterwards — AQE skips the skew
      // split when the join output must keep a required hash
      // distribution (splitting would force an extra shuffle). Count the
      // payload, not lit(1): column pruning would otherwise reduce the
      // shuffled rows to a constant key that compresses below the skew
      // byte threshold.
      val joined = big.join(small, Seq("k")).agg(count(col("payload")).as("n"))
      val rows = joined.collect()
      // correctness: every big row matches exactly one small row
      assert(rows(0).getLong(0) == 500000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
