package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Measures the PQ claims at scale over an [[IvfCeilingProbe]] corpus:
  * (a) artifact size — the codes-only inverted file vs the exact
  * vector store (the number that decides whether a 10⁹-vector index
  * stays memory-resident); (b) recall@3 of IVFADC + exact re-rank vs
  * brute force at escalating shortlist depths; (c) warm query wall of
  * the compressed path vs the exact two-level probe. Run AFTER
  * IvfCeilingProbe has synthesized the corpus:
  *
  *   sbt "runMain graft.tools.PqProbe 500000"
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val nQueries = if (args.length > 1) args(1).toInt else 50
    val kSub = if (args.length > 2) args(2).toInt else 256 // production PQ
    val m = if (args.length > 3) args(3).toInt else 8
    val k = 3
    val dir = s"/tmp/ivfprobe_$n"
    require(new java.io.File(s"$dir/embeddings.parquet").exists(),
      s"run IvfCeilingProbe $n first to synthesize $dir")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark)

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val exact = timed("brute force (baseline)") {
      val e = Similarity.bruteForceTopK(spark, dir, nQueries, k)
        .select("q_id", "neighbor_id").cache()
      e.count(); e
    }
    val nExact = exact.count()

    val c = Similarity.adaptiveTwoLevelConfig(n)
    println(s"[pq] config: nCoarse=${c.nCoarse} nSub=${c.nSub} " +
      s"probes=(${c.nProbe1},${c.nProbe2}) m=$m kSub=$kSub")
    val out = java.nio.file.Files.createTempDirectory("graft-pq-probe").toString
    timed("savePqIndex (train two-level + PQ, encode, write)") {
      Similarity.savePqIndex(spark, dir, out, c.nCoarse, c.nSub, m = m, k = kSub)
    }
    def bytes(sub: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
        else f.length()
      walk(new java.io.File(s"$out/$sub"))
    }
    val (cb, vb) = (bytes("codes"), bytes("vectors"))
    println(f"[pq] artifact: codes=${cb / 1e6}%.1f MB vectors=${vb / 1e6}%.1f MB " +
      f"ratio=${vb.toDouble / cb}%.1f x (codebooks ${(bytes("coarse") + bytes("subcents") + bytes("pqbook")) / 1e6}%.1f MB)")

    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      import org.apache.spark.sql.functions._
      val hits = exact.join(approx.select(col("q_id"), col("neighbor_id"), lit(1).as("h")),
        Seq("q_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("h"), lit(0)))).collect()(0).getLong(0)
      hits.toDouble / nExact
    }
    println("[pq] rerank\trecall@3\twarm_wall_s")
    for (rerank <- Seq(4, 16, 64)) {
      // first call per rerank warms nothing extra (index is on disk) —
      // time the SECOND call as the warm serving wall
      val df = Similarity.pqTopKFromIndex(spark, out, c.nProbe1, c.nProbe2,
        nQueries, k, rerank)
      val r = recallOf(df)
      val t0 = System.nanoTime()
      Similarity.pqTopKFromIndex(spark, out, c.nProbe1, c.nProbe2,
        nQueries, k, rerank).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[pq] $rerank\t$r%.3f\t$wall%.1f")
    }
    val t0 = System.nanoTime()
    Similarity.twoLevelIvfTopK(spark, dir, c.nCoarse, c.nSub,
      c.nProbe1, c.nProbe2, nQueries, k).count()
    println(f"[pq] exact two-level probe (session stage, same budget): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
