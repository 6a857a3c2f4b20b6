package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: report the largest whole-stage-codegen generated
  * method per query at a given scale (the bench's reservoir-sampled
  * `max_method_bytes` can carry a value across queries, so attribution
  * needs a direct measurement). */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)
    import org.apache.spark.sql.execution.debug._
    for (q <- Seq("q38_ann_lsh", "q39_ann_ivf", "q92_ann_lsh_scaled", "q93_pack_assignment",
        "q94_minhash_lsh_scaled", "q95_embedding_neardup_lsh")) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      val stats = codegenStringSeq(df.queryExecution.executedPlan)
      val mx = if (stats.isEmpty) -1L else stats.map(_._3.maxMethodCodeSize).max
      println(s"[probe] $q subtrees=${stats.size} maxMethodCodeSize=$mx")
    }
    spark.stop()
  }
}
