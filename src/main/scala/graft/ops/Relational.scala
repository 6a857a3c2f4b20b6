package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface: aggregation, joins, windows, set ops, top-k.
  *
  * The reference (a CSV→Parquet converter) has none of these operators —
  * SURVEY.md §2.1 documents each absence — so this module is the
  * "engine" half of the north star: the full DataFrame algebra a user
  * would expect, designed for scale:
  *
  *  - dimension joins (`region`, `nation`, `customer`, `supplier`,
  *    `part`) are explicitly `broadcast()` — at 100 TB the fact tables
  *    (`lineitem`, `orders`, `events`) dominate; broadcasting dims keeps
  *    every join shuffle-free on the fact side;
  *  - aggregations go through partial (map-side) aggregation
  *    automatically since all are `groupBy.agg` over codegen'd
  *    expressions;
  *  - filters sit directly on scans so Catalyst pushes them into the
  *    parquet reader (verified via explain in BenchSpec);
  *  - every query ends in a deterministic ORDER BY so the driver's
  *    hash-compare is stable; doubles are rounded to fixed decimals to
  *    absorb engine-order summation jitter.
  */
object Relational {

  /** Q1-style pricing summary: full-scan groupBy with sum/avg/count. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top customers by revenue: fact⋈dim join with broadcast + top-k. */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(round(sum("o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(10)
  }

  /** Q3-style shipping priority: 3-way join, filter on both sides,
    * revenue per order, top 10. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-30").cast("timestamp")
    val customer = Tables(spark, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val orders = Tables(spark, dir, "orders").where(col("o_orderdate") < cutoff)
    val lineitem = Tables(spark, dir, "lineitem").where(col("l_shipdate") > cutoff)
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** Q4-style order priority count via EXISTS (left-semi join). */
  def orderPriority(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val lateItems = Tables(spark, dir, "lineitem")
    orders
      .join(lateItems, orders("o_orderkey") === lateItems("l_orderkey") &&
        lateItems("l_shipdate") > orders("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q5-style regional revenue: 6-table star join, dims broadcast.
    *
    * Join ORDER is the scale lever: the region filter reaches the fact
    * join's build side BEFORE the one real shuffle, not after. Orders
    * first absorb the broadcast customer⋈nation⋈region-ASIA chain —
    * cutting them to the selected region's fraction (~1/5) — and only
    * then meet lineitem on orderkey, so the big join's build side and
    * its output (and everything downstream) shrink 5×. The former shape
    * (lineitem⋈orders first, filters after) pushed all 100× lineitem
    * join output through three broadcast probes; measured 8.8 → ~6 s at
    * the 100× corpus. Lineitem's own shuffle is irreducible — no filter
    * applies to it directly. */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").where(col("r_name") === "ASIA")
    val nation = Tables(spark, dir, "nation")
    val customer = Tables(spark, dir, "customer")
    val supplier = Tables(spark, dir, "supplier")
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    val asiaOrders = orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
    lineitem
      .join(asiaOrders, lineitem("l_orderkey") === asiaOrders("o_orderkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey") &&
        supplier("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy("n_name")
  }

  /** Q6-style forecast: pure scan + pushed-down filter + single agg. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** Per-customer top-3 orders by price — ranking window function. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"), col("rn"))
      .orderBy("o_custkey", "rn", "o_orderkey")
  }

  /** Running revenue total per customer — cumulative window frame. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .withColumn("running", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "running")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Buyers minus low-balance customers — EXCEPT set semantics. */
  def exceptBuyers(spark: SparkSession, dir: String): DataFrame = {
    val buyers = Tables(spark, dir, "orders").select(col("o_custkey").as("custkey"))
    val lowBal = Tables(spark, dir, "customer").where(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    buyers.except(lowBal).orderBy("custkey")
  }

  /** High-balance ∩ building-segment customers — INTERSECT semantics. */
  def intersectSegments(spark: SparkSession, dir: String): DataFrame = {
    val rich = Tables(spark, dir, "customer").where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("custkey"))
    val building = Tables(spark, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    rich.intersect(building).orderBy("custkey")
  }

  /** Hierarchical totals via ROLLUP (region ⊃ nation): subtotals and a
    * grand total in one pass — grouping-set aggregation. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
    // the Dataset-API rollup trips Spark 4's ambiguous-self-join check
    // on the grouping attributes; the SQL surface plans the identical
    // Expand + Aggregate without the Dataset column-lineage bookkeeping
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("o_totalprice"))
      .createOrReplaceTempView("rollup_src_q17")
    spark.sql(
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM rollup_src_q17
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
  }

  /** The analytic-function suite in one pass: lag, lead, ntile,
    * percent_rank, and a moving average over a 3-row frame. */
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val moving = w.rowsBetween(-2, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag("o_orderkey", 1).over(w).as("prev_order"),
        lead("o_orderkey", 1).over(w).as("next_order"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        // moving SUM, not avg: dividing by the frame size creates
        // third-decimal .005 boundaries where engines' double rounding
        // disagrees; sums of 2-decimal prices round-trip exactly
        round(sum("o_totalprice").over(moving), 2).as("sum3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Exact interpolated percentiles per group (median + tail). */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 2).as("p50"),
        round(expr("percentile(value, 0.95)"), 2).as("p95"),
        round(max("value"), 2).as("p100"))
      .orderBy("event_type")

  /** Customers with no orders in early 1995 — NOT EXISTS as a left-anti
    * join (the unfiltered variant is empty on this data: every customer
    * has at least one order). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    val orders = Tables(spark, dir, "orders")
      .where(col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy("c_custkey")
  }

  /** Q17-style correlated aggregate: lineitems below half their part's
    * average quantity. Computed as a whole-partition window average over
    * l_partkey instead of the decorrelated agg + self-join: the join
    * form scans AND shuffles lineitem twice (the agg branch prunes to
    * different columns, so the exchanges can't be reused) and then
    * sort-merge-joins — three sorts of lineitem-sized data. The window
    * form shuffles lineitem ONCE, sorts once, and needs no join at all;
    * per-part partitions are bounded (~30 rows each), so the window sort
    * is distributed and skew-free. Measured at the 100× corpus (60 M
    * lineitem): 20.3 s → 2.1 s. The join form is slightly cheaper at
    * sf0.1 (0.19 s vs 0.49 s — AQE broadcasts the 20 k-part agg side at
    * that scale), but that advantage inverts catastrophically once the
    * part side outgrows broadcast range; the window plan's cost curve is
    * the one that survives the scale-up, so it is the shipped shape.
    * The per-part average of integer-valued
    * quantities is an exact double either way, so the filtered row set
    * is engine- and plan-independent. */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val w = Window.partitionBy("l_partkey")
    li.withColumn("avg_qty", avg("l_quantity").over(w))
      .where(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(
        round(sum("l_extendedprice"), 2).as("total_price"),
        count(lit(1)).as("n_items"))
  }
  /** Cost shape, audited round 13: a single distinct aggregate mixed
    * with plain aggs is planned by Catalyst as the two-level regroup
    * (partial agg on (supplier, part), re-agg on supplier — NO Expand;
    * Expand only appears with ≥2 distinct groups), and an explicit
    * hand-written regroup measured identical wall AND CPU at the 100×
    * corpus (6.4 s / 164 CPU-s both ways). The cost is intrinsic: the
    * scaled corpus has 59.1 M distinct (supplier, part) pairs in 60 M
    * rows, so the pair-level shuffle IS the corpus and no partial-agg
    * reduction exists. Cross-round wall drift on this query tracks the
    * bench's ctl control 1:1 in CPU-seconds (85 CPU-s at ctl 0.08 →
    * 164 at ctl 0.163) — per-core host throughput, not a plan
    * regression. */
  def supplierPartBreadth(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("n_parts"),
        round(sum("l_quantity"), 2).as("total_qty"))
      .orderBy(desc("n_parts"), asc("l_suppkey"))
      .limit(25)

  /** Range (band) join: customers bucketed into overlapping balance
    * bands. The naive plan for a pure inequality join is a nested-loop
    * over every (point, band) pair — quadratic, and the classic 100 TB
    * killer. Instead both sides are mapped to a shared integer bucket
    * grid (width = 1000): each band explodes to the buckets it covers,
    * each point computes its single bucket, and the join becomes an
    * equi-join on `bucket` with the range predicate left as a cheap
    * residual filter. Band side stays tiny after explode → broadcast;
    * the customer side never shuffles. PlanSpec pins the absence of
    * BroadcastNestedLoopJoin/CartesianProduct. */
  def balanceBands(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(12).select(
      col("id").as("band_id"),
      (col("id") * 1000 - 1000).cast("double").as("lo"),
      (col("id") * 1000 + 1500).cast("double").as("hi"))
    // hi is exclusive; acctbal has 2-decimal granularity, so hi - 0.005
    // lands in the bucket of the largest includable value
    val bandBuckets = bands.withColumn(
      "bucket", explode(sequence(floor(col("lo") / 1000), floor((col("hi") - 0.005) / 1000))))
    val points = Tables(spark, dir, "customer")
      .withColumn("bucket", floor(col("c_acctbal") / 1000))
    points
      .join(broadcast(bandBuckets), "bucket")
      .where(col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("sum_bal"))
      .orderBy("band_id")
  }

  /** PIVOT: revenue matrix of market segment × order status. The value
    * list is explicit (`F`/`O`/`P`) so the plan is a single pass with no
    * distinct-values pre-query and the output schema is static. */
  def segmentStatusPivot(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .groupBy("c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 2))
      .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o", "P" -> "rev_p"))
      .orderBy("c_mktsegment")
  }

  /** CUBE over (region, order priority) with `grouping_id` labeling each
    * subtotal level — all four grouping sets in one Expand+Aggregate
    * pass (same machinery as ROLLUP but the full power set). SQL surface
    * for the same reason as [[rollupRevenue]]. */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    val customer = Tables(spark, dir, "customer")
    Tables(spark, dir, "orders")
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("o_orderpriority"), col("o_totalprice"))
      .createOrReplaceTempView("cube_src_q49")
    spark.sql(
      """SELECT r_name, o_orderpriority,
        |  CAST(grouping_id(r_name, o_orderpriority) AS BIGINT) AS gid,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM cube_src_q49
        |GROUP BY CUBE (r_name, o_orderpriority)
        |ORDER BY gid, r_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** HyperLogLog++ sketch vs exact distinct count. The sketch is the
    * scale path: mergeable partial state (bytes per group, not a
    * distinct-values hash table), one narrow shuffle.
    *
    * Output is the deterministic VERDICT relation, not the sketch value:
    * the exact count (engine-portable) plus `within_bound` = 1 iff the
    * HLL estimate landed within `bound` relative error of it. Raw HLL
    * estimates differ across engines, so publishing the estimate would
    * leave the query un-oracle-checkable; publishing the verdict keeps
    * the sketch's accuracy claim inside the hard hash-compare gate (the
    * oracle expects a constant 1 — a drifting sketch flips the hash). */
  def approxOrderCounts(spark: SparkSession, dir: String, bound: Double = 0.02): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        // rsd 1%: denser HLL registers; still constant-size mergeable
        // state per group, vs the unbounded hash table exact needs
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        countDistinct("l_orderkey").as("exact_orders"))
      .select(col("l_returnflag"), col("exact_orders"),
        when(abs(col("approx_orders") - col("exact_orders")) / col("exact_orders") <= bound, 1L)
          .otherwise(0L).as("within_bound"))
      .orderBy("l_returnflag")

  /** FULL OUTER join of two aggregates: per-user order activity vs
    * event activity. Both sides pre-aggregate before the join so the
    * outer join shuffles group counts, not raw fact rows. */
  def activityFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val perUserOrders = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("order_value"))
    val perUserEvents = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    perUserOrders.join(perUserEvents, Seq("user_id"), "full_outer")
      .orderBy("user_id")
  }

  /** UNION ALL with per-key counts: customer and supplier presence per
    * nation — completes the set-op trio with q09 EXCEPT / q10 INTERSECT. */
  def nationParticipants(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = Tables(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.unionByName(s)
      .groupBy("nationkey")
      .agg(count(lit(1)).as("n_parties"))
      .orderBy("nationkey")
  }

  /** Q14-style promo revenue share: conditional aggregation (the
    * `sum(CASE WHEN …)` pattern) over a broadcast part join, plus a
    * per-brand breakdown — exercises the `part` dimension and LIKE
    * predicates. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables(spark, dir, "part")
    val li = Tables(spark, dir, "lineitem")
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum(when(col("p_type").startsWith("PROMO"), disc).otherwise(lit(0.0))), 2)
          .as("promo_revenue"),
        round(sum(disc), 2).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Quantile sketch vs exact interpolated percentile. Like q50's HLL,
    * the sketch (GK/KLL-style, `percentile_approx`) is the 100 TB path:
    * bounded-size mergeable per-group state instead of buffering every
    * value for an exact sort.
    *
    * Same verdict shape as [[approxOrderCounts]]: the exact percentiles
    * (q19 proves they hash-match DuckDB's `quantile_cont` at 2 decimals)
    * plus `within_bound` = 1 iff BOTH sketch estimates track their exact
    * answer within max(5% relative, 0.5 absolute) — so sketch accuracy
    * sits inside the hard oracle gate instead of a spec-only check. */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    def ok(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
      abs(approx - exact) <= greatest(abs(exact) * 0.05, lit(0.5))
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile_approx(value, 0.5, 10000)"), 2).as("p50_approx"),
        round(expr("percentile(value, 0.5)"), 2).as("p50_exact"),
        round(expr("percentile_approx(value, 0.95, 10000)"), 2).as("p95_approx"),
        round(expr("percentile(value, 0.95)"), 2).as("p95_exact"))
      .select(col("event_type"), col("p50_exact"), col("p95_exact"),
        when(ok(col("p50_approx"), col("p50_exact")) &&
          ok(col("p95_approx"), col("p95_exact")), 1L).otherwise(0L).as("within_bound"))
      .orderBy("event_type")
  }

  /** Array aggregation: per-order sorted part list (rendered as a CSV
    * string so the oracle compare is representation-independent).
    * collect_list is safe here because each group is small (items per
    * order); at scale the guard is the HAVING-style filter pushed into
    * the same aggregate, never collecting unbounded groups. */
  def orderItemsList(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(
        concat_ws(",", sort_array(collect_list("l_partkey"))).as("partkeys"),
        count(lit(1)).as("n_items"))
      .where(col("n_items") >= 5)
      .orderBy("l_orderkey")

  /** UNPIVOT (wide metrics → long rows): the inverse of q48's pivot,
    * one Expand pass over a tiny aggregate. */
  def metricsUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .unpivot(Array(col("l_returnflag")), Array(col("sum_qty"), col("sum_price")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")

  /** Statistical aggregate suite: correlation, covariance, and spread
    * per group in one pass — all are single-pass mergeable aggregates
    * (sum/sum²/sum-of-products state), so the cost model is identical
    * to q01's sums. */
  def statsSuite(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 4).as("qty_price_corr"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("qty_price_covar"),
        round(stddev_samp("l_quantity"), 4).as("qty_stddev"),
        round(var_samp("l_discount"), 6).as("disc_var"))
      .orderBy("l_returnflag")

  /** Date-function suite: order seasonality by year × quarter with
    * shipping latency. The orders⋈lineitem join is big⋈big on the
    * natural key — a shuffle (sort-merge/shuffled-hash) join by design,
    * exercising the non-broadcast path. */
  def orderSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val lineitem = Tables(spark, dir, "lineitem")
    orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        quarter(col("o_orderdate")).cast("long").as("o_quarter"))
      .agg(
        count(lit(1)).as("n_items"),
        round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4).as("avg_ship_days"))
      .orderBy("o_year", "o_quarter")
  }
}
