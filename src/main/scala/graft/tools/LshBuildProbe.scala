package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the LSH artifact build at scale. */
object LshBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale100x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val out = java.nio.file.Files.createTempDirectory("lsh-build-probe").toString
    val vecs = graft.ops.Similarity.unitEmbeddings(spark, dir)
    val n = t("count")(vecs.count())
    println(s"[probe] n=$n config=${graft.ops.Similarity.adaptiveLshConfig(n)}")
    t("write vectors")(vecs.write.mode("overwrite").parquet(s"$out/vectors"))
    val (bits, nTables) = graft.ops.Similarity.adaptiveLshConfig(n)
    val sig = graft.ops.Similarity.lshSignaturesOf(
      spark.read.parquet(s"$out/vectors"), bits, nTables)
    val buckets = sig
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
      .withColumn("bucket_bucket", pmod(xxhash64(col("tbl"), col("bucket")), lit(64L)))
    t("sig only (no explode) count")(println(
      sig.select(col("vec_id"), col("buckets")).count()))
    t("explode count")(println(
      sig.select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
        .count()))
    // barrier the signature computation behind a cache so the Generate
    // sees a materialized array column instead of collapsing the
    // projection into its generator
    val cached = sig.select(col("vec_id"), col("buckets")).cache()
    cached.count()
    t("explode from cache")(println(
      cached.select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
        .count()))
    t("explode behind exchange barrier")(println(
      sig.select(col("vec_id"), col("buckets"))
        .repartition(col("vec_id"))
        .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
        .count()))
    val out2 = java.nio.file.Files.createTempDirectory("lsh-real").toString
    t("REAL saveLshIndex end-to-end")(graft.ops.LshIndex.saveLshIndex(spark, dir, out2))
    t("REAL first serve")(println(
      graft.ops.LshIndex.lshTopKFromIndex(spark, out2).count()))
    t("REAL second serve")(println(
      graft.ops.LshIndex.lshTopKFromIndex(spark, out2).count()))
    spark.stop()
  }
}
