package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotProduct

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Two paths, mirroring how a production vector pipeline is layered:
  *  - [[bruteForceTopK]] / [[nearDup]]: exact cosine over a bounded query
  *    or candidate set — the correctness baseline. The pair join is a
  *    broadcast nested-loop on the (small) query side; the big side
  *    streams. At 100 TB you bound the left side, never the corpus.
  *  - [[lshTopK]]: sign-random-projection LSH (the 8 leading dimensions
  *    as hyperplane signs — deterministic, engine-portable). Buckets
  *    equi-join, so candidate generation is a hash join keyed on an
  *    8-bit code: the scale path (an IVF variant would replace the code
  *    with a nearest-centroid id; same join shape).
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions in
  * double precision, summed in index order — bit-reproducible in the
  * DuckDB oracle, codegen-friendly, no UDFs.
  */
object Similarity {

  /** Unit-normalized double vector (pre-normalizing turns every cosine
    * into a plain dot product — one sqrt per vector instead of per pair). */
  private def unitVec(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    val norm = sqrt(dotProduct(d, d))
    transform(d, x => x / norm)
  }

  /** Pair scoring uses the codegen'd [[graft.functions.DotProduct]]
    * expression: one fused loop, no per-pair intermediate array (the
    * `aggregate(zip_with(...))` HOF shape allocates one), identical
    * index-order summation. */
  private def dot(a: Column, b: Column): Column = dotProduct(a, b)

  private def unitEmbeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddingsSpread(spark, dir)
      .select(col("vec_id"), unitVec(col("embedding")).as("u"))

  /** Exact cosine top-k for a bounded query set against the full corpus. */
  def bruteForceTopK(spark: SparkSession, dir: String,
      nQueries: Int = 5, k: Int = 10): DataFrame = {
    val e = unitEmbeddings(spark, dir)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("u").as("qu"))
    val scored = broadcast(q).join(e, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), dot(col("qu"), col("u")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cos_sim"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** Embedding near-dup pairs: exact cosine >= threshold over a bounded
    * candidate set (vec_id < limit both sides). */
  def nearDup(spark: SparkSession, dir: String,
      limit: Int = 500, threshold: Double = 0.4): DataFrame = {
    val e = unitEmbeddings(spark, dir).where(col("vec_id") < limit)
    val a = e.select(col("vec_id").as("vec_a"), col("u").as("ua"))
    val b = e.select(col("vec_id").as("vec_b"), col("u").as("ub"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), round(dot(col("ua"), col("ub")), 4).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .orderBy("vec_a", "vec_b")
  }

  /** Sign-projection bucket code over the first `bits` dimensions. */
  private def signBucket(u: Column, bits: Int): Column =
    concat((1 to bits).map(i => when(element_at(u, i) >= 0, "1").otherwise("0")): _*)

  /** IVF-style ANN: assign every vector to its nearest of `nCentroids`
    * coarse centroids (the inverted file), then answer queries by
    * probing the `nProbe` nearest centroid lists and ranking exact
    * cosine within them.
    *
    * The centroid set here is the first `nCentroids` vectors — a
    * deterministic stand-in for a k-means codebook (training is an
    * offline job; the INDEX SHAPE is what matters and is identical:
    * candidate generation is an equi-join on centroid id, cost ∝
    * corpus/nCentroids × nProbe per query, never the full corpus). */
  def ivfTopK(spark: SparkSession, dir: String, nCentroids: Int = 16,
      nProbe: Int = 2, nQueries: Int = 100, k: Int = 3): DataFrame = {
    val e = unitEmbeddings(spark, dir)
    val cents = e.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("u").as("cu"))
    def nearestCentroids(src: DataFrame, idCol: String, vecCol: String, take: Int): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(round(col("cdot"), 6).desc, col("cent_id"))
      src.join(broadcast(cents))
        .withColumn("cdot", dot(col(vecCol), col("cu")))
        .withColumn("crn", row_number().over(w))
        .where(col("crn") <= take)
        .drop("cu", "cdot", "crn")
    }
    val assigned = nearestCentroids(e, "vec_id", "u", 1)
    val probes = nearestCentroids(
      e.where(col("vec_id") < nQueries).select(col("vec_id").as("q_id"), col("u").as("qu")),
      "q_id", "qu", nProbe)
    val scored = probes.join(assigned, Seq("cent_id"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), dot(col("qu"), col("u")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cos_sim"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** ANN via sign-LSH buckets: candidates share the 8-bit sign code
    * (hash equi-join), ranked by exact cosine within the bucket. */
  def lshTopK(spark: SparkSession, dir: String,
      nQueries: Int = 200, k: Int = 3, bits: Int = 8): DataFrame = {
    val e = unitEmbeddings(spark, dir)
      .withColumn("bucket", signBucket(col("u"), bits))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("u").as("qu"), col("bucket"))
    val scored = q.join(e, Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), dot(col("qu"), col("u")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(round(col("cos"), 6).desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), round(col("cos"), 4).as("cos_sim"), col("rank"))
      .orderBy("q_id", "rank")
  }
}
