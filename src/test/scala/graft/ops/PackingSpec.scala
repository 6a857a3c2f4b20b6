package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariants tying [[Packing.packAssignment]] (the materialized
  * doc→sequence relation) to [[Packing.lengthPacking]] (the economics
  * report): the assignment must be a VALID packing — no pack over
  * capacity, slots dense — and its pack count must sit within the
  * sharding bound of the closed-form count (each shard's last pack may
  * run partial: at most `shards - 1` extra packs per (source, bucket)).
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val window = 128
  private val shards = 4

  private lazy val assign = Packing.packAssignment(spark, dir, window, shards).cache()

  test("no pack exceeds its bucket capacity and slots are dense from zero") {
    val bad = assign.where(col("bucket") < window)
      .groupBy("source", "bucket", "shard", "pack_seq")
      .agg(count(lit(1)).as("n"), max("slot").as("max_slot"), min("slot").as("min_slot"))
      .where(col("n") > lit(window) / col("bucket") ||
        col("max_slot") =!= col("n") - 1 || col("min_slot") =!= 0)
      .limit(5).collect()
    assert(bad.isEmpty, s"invalid packs:\n${bad.mkString("\n")}")
  }

  test("long docs (bucket == window) each own their pack at slot 0") {
    val long = assign.where(col("bucket") === window)
    val dup = long.groupBy("source", "bucket", "shard", "pack_seq")
      .agg(count(lit(1)).as("n")).where(col("n") > 1)
    assert(dup.isEmpty, "two long docs share a pack")
    assert(long.where(col("slot") =!= 0).isEmpty, "long doc at nonzero slot")
  }

  test("every document is assigned exactly once") {
    val docs = Tables.documents(spark, dir).count()
    assert(assign.count() == docs)
    assert(assign.select("doc_id").distinct().count() == docs)
  }

  test("pack counts match the economics report within the sharding bound") {
    val actual = assign.where(col("bucket") < window)
      .groupBy("source", "bucket")
      // multi-column distinct, not an arithmetic composite key — a
      // shard*C + pack_seq encoding silently collides once pack_seq
      // reaches C at larger scale factors
      .agg(countDistinct(col("shard"), col("pack_seq")).as("actual_packs"))
    val expected = Packing.lengthPacking(spark, dir, window)
      .where(col("bucket") < window)
      .select(col("source"), col("bucket"), col("n_packs"))
    val joined = actual.join(expected, Seq("source", "bucket")).collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      val (a, e) = (r.getAs[Long]("actual_packs"), r.getAs[Long]("n_packs"))
      assert(a >= e && a <= e + (shards - 1),
        s"${r.getAs[String]("source")}/bucket=${r.getAs[Long]("bucket")}: " +
          s"actual $a outside [$e, ${e + shards - 1}]")
    }
  }

  test("the assignment window shuffles on (source, bucket, shard) — the sharded keys") {
    val df = Packing.packAssignment(spark, dir, window, shards)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the window's exchange must carry ALL THREE keys: dropping `shard`
    // (or `bucket`) would re-concentrate each (source, bucket) group —
    // potentially corpus-scale — into one sort partition. (The trailing
    // orderBy(doc_id) adds a rangepartitioning for the gate's row-order
    // contract; a dataloader consumer drops that sort, so it is not the
    // subject here.)
    val windowExchange = raw"hashpartitioning\(source[^)]*bucket[^)]*shard".r
    assert(windowExchange.findFirstIn(p).isDefined,
      s"window exchange missing one of (source, bucket, shard):\n${p.take(2000)}")
  }
}
