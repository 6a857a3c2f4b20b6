package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the BM25 persisted-index lifecycle the q127 gate ships:
  * `save` = session postings/dl build + parquet write (the pay-once
  * cost); `serve` = answer a query batch in a FRESH session from the
  * artifact alone (the restart story the session cache can't tell).
  *
  *   sbt "runMain graft.tools.Bm25IndexProbe /tmp/scale100x /tmp/bm25idx save"
  *   sbt "runMain graft.tools.Bm25IndexProbe /tmp/scale100x /tmp/bm25idx serve"
  */
object Bm25IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val indexDir = args(1)
    val mode = args(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)
    val t0 = System.nanoTime()
    mode match {
      case "save" =>
        graft.ops.Retrieval.savePostingsIndex(spark, dir, indexDir)
        println(f"[probe] save (session build + write): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      case "serve" =>
        val n = graft.ops.Retrieval.bm25TopKFromIndex(spark, indexDir).count()
        println(f"[probe] cold serve from artifact: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        val t1 = System.nanoTime()
        graft.ops.Retrieval.bm25TopKFromIndex(spark, indexDir).count()
        println(f"[probe] second serve same session: ${(System.nanoTime() - t1) / 1e9}%.2f s")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
