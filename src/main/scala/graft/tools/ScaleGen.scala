package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate a larger, referentially-consistent copy of a testdata scale
  * directory by unioning N key-shifted copies of every fact table:
  *
  *   sbt "runMain graft.tools.ScaleGen <srcDir> <outDir> <factor>"
  *
  * Design (what a faithful SF-up must preserve):
  *  - Foreign keys stay valid: each copy i shifts every key column by
  *    `i * (max(key)+1)` using ONE offset per key domain (custkey offset is
  *    shared by customer.c_custkey, orders.o_custkey and events.user_id;
  *    orderkey by orders/lineitem; partkey by part/lineitem; suppkey by
  *    supplier/lineitem), so join fan-outs scale linearly, never N².
  *  - Dimension tables (region, nation) stay fixed — as in TPC-H, where
  *    their cardinality is scale-independent.
  *  - Document text is letter-rotated per copy (a deterministic Caesar
  *    shift of the two alphabets; digits/punct/whitespace untouched), so
  *    copies are NOT near-duplicates of each other: shingle/MinHash/
  *    SimHash workloads grow linearly with the corpus like a real SF-up,
  *    instead of quadratically like naive duplication (every naive copy is
  *    a true near-dup of its original — that measures the data, not the
  *    engine). Within-copy duplicate structure is preserved exactly.
  *  - Embeddings are elementwise perturbed per copy with a deterministic
  *    (copy, dimension)-keyed factor, so cross-copy vectors are not exact
  *    or near-cosine duplicates, while within-copy geometry is preserved
  *    up to a mild diagonal scaling.
  */
object ScaleGen {

  /** Per-copy letter substitution: a seeded Fisher-Yates PERMUTATION of
    * the alphabet (copy 0 = identity). Replaces the earlier Caesar
    * rotation, which has only 26 distinct values — at factors > 26, or
    * when two ScaleGen applications compose (10 × 10 → shift i+j), copies
    * landing on the same total shift had IDENTICAL text, seeding massive
    * cross-copy exact-dup clusters whose candidate-pair workload grows
    * quadratically (measured: the 100× confirmed-pair build at 981 s vs
    * the ~linear cost the corpus was supposed to exhibit — that measured
    * the data, not the engine). Distinct seeded permutations (26! space)
    * keep cross-copy docs shingle-disjoint at any factor, and two
    * compositions collide with ~zero probability. The seed is salted
    * with the source path so chained applications (sf0.1 → 10× → 100×)
    * draw from different permutation families — otherwise copy (i, 0)
    * and copy (0, i) would compose to the same single permutation and
    * collide exactly. */
  private def rotate(c: Column, copy: Int, seedSalt: Long): Column = {
    if (copy == 0) return c
    val lower = "abcdefghijklmnopqrstuvwxyz".toCharArray
    val rng = new scala.util.Random(0x5eedL + copy * 1000003L + seedSalt * 7919L)
    val perm = lower.clone()
    for (i <- perm.length - 1 to 1 by -1) {
      val j = rng.nextInt(i + 1)
      val t = perm(i); perm(i) = perm(j); perm(j) = t
    }
    val from = new String(lower) + new String(lower).toUpperCase
    val to = new String(perm) + new String(perm).toUpperCase
    translate(c, from, to)
  }

  /** Union `factor` copies of `df`, transforming copy i via `shifted`. */
  private def copies(df: DataFrame, factor: Int)(shifted: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => shifted(df, i)).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts passes through untouched, so whatever encoding the source
    // carries (nanos-as-long via this conf, NTZ micros, LTZ micros)
    // round-trips and Tables.normalizeEventTs absorbs it on read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    def offsetOf(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    // one offset per key DOMAIN, shared across every table referencing it
    val customer = read("customer"); val custOff = offsetOf(customer, "c_custkey")
    val orders = read("orders"); val orderOff = offsetOf(orders, "o_orderkey")
    val part = read("part"); val partOff = offsetOf(part, "p_partkey")
    val supplier = read("supplier"); val suppOff = offsetOf(supplier, "s_suppkey")
    val documents = read("documents"); val docOff = offsetOf(documents, "doc_id")
    val embeddings = read("embeddings"); val vecOff = offsetOf(embeddings, "vec_id")
    val events = read("events"); val eventOff = offsetOf(events, "event_id")

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(copies(customer, factor) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custOff))
    }, "customer")
    write(copies(supplier, factor) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppOff))
    }, "supplier")
    write(copies(part, factor) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * partOff))
    }, "part")
    write(copies(orders, factor) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * orderOff))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custOff))
    }, "orders")
    write(copies(read("lineitem"), factor) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * orderOff))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partOff))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppOff))
    }, "lineitem")
    write(copies(events, factor) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * eventOff))
        .withColumn("user_id", col("user_id") + lit(i * custOff))
    }, "events")
    write(copies(documents, factor) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docOff))
        .withColumn("text", rotate(col("text"), i, src.hashCode.toLong))
    }, "documents")
    write(copies(embeddings, factor) { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vecOff))
        .withColumn("embedding",
          // (copy, dim)-keyed ±3% diagonal perturbation: kills cross-copy
          // exact/near-cosine duplicates without reshaping within-copy geometry
          transform(col("embedding"), (x, j) =>
            (x * (lit(1.0f) + ((lit(i * 31) + j) % 7 - lit(3)).cast("float") * lit(0.01f)))
              .cast("float")))
    }, "embeddings")

    val counts = Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}")
    println(s"[scalegen] wrote $out at ${factor}x: ${counts.mkString(", ")}")
    spark.stop()
  }
}
