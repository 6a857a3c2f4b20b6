package graft

import org.apache.spark.sql.SparkSession

/** Shared session post-configuration for the library's entry points
  * (Bench / Verify / test harness). */
object GraftSession {

  /** One-stop session post-configuration: everything the library needs a
    * session to carry, applied ONCE at construction time. Per-query code
    * (loaders, operators) never mutates session conf — a `spark.conf.set`
    * hidden inside a loader is a global side effect a library caller
    * can't see (it once lived in `Tables.apply`, where a caller reading
    * nanos parquet THEY produced would silently get longs where they
    * expected an error).
    *
    *  - `nanosAsLong`: historical events corpora carried TIMESTAMP(NANOS)
    *    columns, which Spark 4 rejects outright unless surfaced as raw
    *    longs; [[graft.ops.Tables.normalizeEventTs]] then dispatches on
    *    the surfaced LongType. No-op for non-nano files.
    *  - a reliable checkpoint dir (see [[ensureCheckpointDir]]). */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ensureCheckpointDir(spark)
  }

  /** Ensure a RELIABLE checkpoint directory is configured: iterative ops
    * (Dedup.clusters' label propagation) truncate lineage per round, and
    * only reliable checkpoints survive executor loss on a cluster —
    * `localCheckpoint` is executor-memory-resident and dies with the
    * executor. Honors an explicit `graft.checkpoint.dir` conf first;
    * otherwise provisions a scratch dir under java.io.tmpdir so the
    * fault-tolerant path is the one actually exercised by default. */
  def ensureCheckpointDir(spark: SparkSession): Unit =
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val conf = spark.conf.get("graft.checkpoint.dir", "")
      val dir =
        if (conf.nonEmpty) conf
        else java.nio.file.Files.createTempDirectory("graft-ckpt").toString
      spark.sparkContext.setCheckpointDir(dir)
    }
}
