package graft

import org.apache.spark.sql.SparkSession

/** Shared session post-configuration for the library's entry points
  * (Bench / Verify / test harness). */
object GraftSession {

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
