package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout scale techniques the query suite can't show on
  * read-only single-file testdata: bucketed co-located joins and
  * partitioned writes with partition pruning. Both are write-side
  * decisions a 100 TB deployment makes once so that every downstream
  * join/scan gets cheaper; these specs prove the engine produces layouts
  * Spark then exploits (no shuffle / pruned scan), observed in the
  * physical plan.
  */
class StorageLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a killed prior run can leave orphan managed-table dirs behind
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucket join: no exchange may appear below the join
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0, plan.take(1500))
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles:\n${plan.take(2500)}")
    assert(!belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n${plan.take(2500)}")
  }

  test("partitioned write enables partition pruning (PartitionFilters in scan)") {
    val out = Files.createTempDirectory("graft-part").resolve("events_by_type").toString
    graft.ops.Tables.events(spark, dir)
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    val q = spark.read.parquet(out).where(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning:\n${plan.take(1500)}")
    // pruned scan must read only the one partition directory
    val n = q.collect()(0).getLong(0)
    val batchN = graft.ops.Tables.events(spark, dir)
      .where(col("event_type") === "purchase").count()
    assert(n == batchN)
  }
}
