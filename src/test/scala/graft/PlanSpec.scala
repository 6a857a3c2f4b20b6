package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates. These pin the scale-critical plan
  * properties README claims: filters reach the parquet scan, scans prune
  * columns, dim joins broadcast, hot paths stay inside WholeStageCodegen,
  * and LSH candidate generation is an equi-join (never a cartesian /
  * nested-loop product).
  *
  * If a refactor regresses one of these, correctness tests stay green but
  * the 100x scale-up breaks — that's exactly what these specs catch.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q06: filters are pushed to the parquet scan and columns pruned") {
    val p = plan(SparkEntry.queries("q06_forecast_revenue")(spark, dir))
    assert(p.contains("PushedFilters"), p)
    assert(p.matches("(?s).*PushedFilters: \\[.*l_discount.*\\].*"), "discount filter not pushed")
    assert(p.matches("(?s).*PushedFilters: \\[.*l_quantity.*\\].*"), "quantity filter not pushed")
    // ReadSchema must carry only the three needed columns of lineitem's 11
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_discount") &&
      readSchema.contains("l_quantity"), readSchema)
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_orderkey"), readSchema)
  }

  test("q05: dimension joins broadcast (no shuffle on the fact side for dims)") {
    val p = plan(SparkEntry.queries("q05_region_revenue")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q01: aggregation runs inside WholeStageCodegen") {
    val df = SparkEntry.queries("q01_pricing_summary")(spark, dir)
    df.collect() // AQE finalizes the physical plan only on execution
    val p = df.queryExecution.executedPlan.toString
    // "*(N)" prefixes mark WholeStageCodegen stages in plan strings
    assert(p.contains("*("), p.take(2000))
    assert(p.contains("partial_sum"), "q1 should partial-aggregate map-side")
    assert(p.contains("HashAggregate"), "q1 should hash-aggregate")
  }

  test("converter cast projection stays codegen'd (custom GoCast expressions)") {
    import graft.core.{Converter, FieldType, InferredSchema}
    val schema = InferredSchema(Seq("a", "b"), Seq(FieldType.TInt64, FieldType.TFloat64))
    val tmp = java.nio.file.Files.createTempDirectory("plan")
    java.nio.file.Files.write(tmp.resolve("t.csv"), "a,b\n1,2.5\n".getBytes)
    val df = Converter.conversionPlan(spark, tmp.resolve("t.csv").toString, schema, ',')
    val p = plan(df)
    assert(p.contains("codegen id"), p.take(2000))
    assert(p.contains("go_long") && p.contains("go_double"), "GoCast expressions missing from plan")
  }

  test("LSH candidate joins are equi-joins, never cartesian") {
    for (q <- Seq("q32_minhash_lsh", "q35_simhash_neardup", "q38_ann_lsh",
        "q94_minhash_lsh_scaled", "q95_embedding_neardup_lsh",
        "q102_semantic_keepers")) {
      val p = plan(SparkEntry.queries(q)(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q uses a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q uses a nested-loop join")
    }
  }

  test("q103 winnowing runs inside a projection; fingerprint joins are equi-joins") {
    val p = plan(SparkEntry.queries("q103_dup_spans")(spark, dir))
    assert(!p.contains("CartesianProduct"), s"q103 uses a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"q103 uses a nested-loop join")
    // the k-gram hash + min-selection must NOT be a per-position explode
    // followed by a window sort — that shape shuffles len(text) rows per
    // doc; the array-expression formulation keeps selection per-row
    assert(!p.contains("Window"), "q103 winnowing fell back to a window function")
    // the only Generate nodes are the explode of the (winnowed, distinct)
    // selection — once per branch of the fingerprint self-join — never a
    // per-position explode of the raw k-gram hash array ("(N) Generate"
    // detail headers appear once per Generate node in formatted mode)
    val generates = p.linesIterator.count(_.matches("""\(\d+\) Generate.*"""))
    assert(generates <= 2, s"q103 explodes more than the winnowed selection:\n${p.take(2000)}")
  }

  test("q104 broadcasts the eval grams; corpus side never shuffles for the join") {
    val p = plan(SparkEntry.queries("q104_contamination_profile")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("IVF corpus assignment is a pure projection: no window, no join, no aggregate") {
    // round 9 strengthened the old "hash aggregate, never a window
    // sort" contract: the codegen'd codebook argmax (NearestInCodebook)
    // assigns each vector in a single projection over the corpus — the
    // former broadcast-join + max_by shape materialized n x nCentroids
    // candidate rows through the aggregate
    val p = plan(graft.ops.Similarity.ivfAssignments(spark, dir))
    assert(!p.contains("Window"), s"corpus assignment uses a window sort:\n${p.take(2000)}")
    assert(!p.contains("HashAggregate"),
      s"corpus assignment re-grew an aggregate:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"corpus assignment re-grew a join:\n${p.take(2000)}")
    assert(p.contains("nearest_in_codebook") || p.contains("Project"), p.take(2000))
  }

  test("q69 decontamination broadcasts the eval grams; corpus side never shuffles for the join") {
    val p = plan(SparkEntry.queries("q69_decontaminate")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q74 top-k plans as TakeOrderedAndProject (per-partition heaps), never a global sort") {
    val df = SparkEntry.queries("q74_top_ngrams")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(p.contains("partial_count"), "bigram counts must partial-aggregate map-side")
  }

  test("q72 curation composite: broadcast decontamination join, no cartesian") {
    val p = plan(SparkEntry.queries("q72_curation_pipeline")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q80 sweep-line windows partition by day, never a single global ordering") {
    val df = SparkEntry.queries("q80_max_concurrency")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the concurrency running sum must shuffle on the day key — a global
    // (unpartitioned) window would funnel the whole corpus through one task
    assert(p.contains("Exchange hashpartitioning(day"), p.take(2500))
  }

  test("q44 anti-join plans as a broadcast/hash anti join, not a cartesian") {
    val p = plan(SparkEntry.queries("q44_customers_without_orders")(spark, dir))
    assert(p.contains("LeftAnti"), p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("q47 range join is a bucketed equi-join, never a nested-loop product") {
    val p = plan(SparkEntry.queries("q47_range_join")(spark, dir))
    assert(!p.contains("CartesianProduct"), s"range join fell back to cartesian:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"range join is a nested loop:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q49 cube plans one Expand + aggregation, not a union of group-bys") {
    val p = plan(SparkEntry.queries("q49_cube")(spark, dir))
    assert(p.contains("Expand"), p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(!p.contains("Union"), "cube should not be a union of separate aggregations")
  }

  test("q30 exact dedup is a single hash-aggregate shuffle") {
    val df = SparkEntry.queries("q30_dedup_exact")(spark, dir)
    val p = df.queryExecution.executedPlan.toString // inline Exchange detail
    assert(p.contains("HashAggregate"), p.take(1500))
    // exactly one aggregation exchange (partial -> final) plus the sort
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges >= 1, "counter counted nothing — plan-string format changed?")
    assert(exchanges <= 2, s"too many shuffles for exact dedup:\n${p.take(2000)}")
  }

  test("q91 packing is one map-side-combined aggregate — no window, no join") {
    val df = SparkEntry.queries("q91_length_packing")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the closed-form pack math must never regress to rank-then-assign
    // (a per-bucket global ordering) or a self-join for the sums
    assert(!p.contains("Window"), s"q91 planned a window:\n${p.take(2000)}")
    assert(!p.contains("Join"), s"q91 planned a join:\n${p.take(2000)}")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "q91 should partial-aggregate map-side")
    // one aggregation exchange (+ the final orderBy's range exchange);
    // the AQE plan string can render the aggregate exchange twice
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges >= 1 && exchanges <= 2,
      s"q91 should shuffle once for the aggregate:\n${p.take(2000)}")
  }

  test("q103 whole-stage codegen compiles every method under the JIT limit") {
    // the winnow kernel is a static call inside the generated projection
    // (defineCodeGen) — it must not push any generated method over the
    // JIT compile limit the way the round-4 probe ladder did
    import org.apache.spark.sql.execution.debug._
    val df = SparkEntry.queries("q103_dup_spans")(spark, dir)
    df.collect()
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty, "expected at least one WholeStageCodegen subtree in q103")
    stats.foreach { case (subtree, _, s) =>
      assert(s.maxMethodCodeSize < 8000,
        s"generated method of ${s.maxMethodCodeSize} bytes exceeds the JIT compile " +
          s"limit in subtree:\n${subtree.linesIterator.take(5).mkString("\n")}")
    }
  }

  for (q <- Seq("q110_bm25_topk", "q111_principal_direction",
      "q113_bigram_logprob", "q116_frame_dups")) {
    test(s"$q whole-stage codegen compiles every method under the JIT limit") {
      // the moments flattening (q111: a 4161-cell per-row array), the
      // bigram struct explode (q113) and the frame explode (q116) all
      // generate sizable projections — pin them under the HotSpot
      // compile limit like the ANN/winnow paths
      import org.apache.spark.sql.execution.debug._
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val stats = codegenStringSeq(plan)
      // suite-order tolerance: another spec may have cached this exact
      // plan (DataFrame.cache of the same default call), in which case
      // it serves whole from an InMemoryRelation and there is nothing
      // to codegen-check here — the cold path is still covered by the
      // isolated run and by Verify/Bench fresh JVMs
      assert(stats.nonEmpty || plan.toString.contains("InMemoryTableScan"),
        s"expected a WholeStageCodegen subtree (or a cache scan) in $q")
      stats.foreach { case (subtree, _, s) =>
        assert(s.maxMethodCodeSize < 8000,
          s"generated method of ${s.maxMethodCodeSize} bytes exceeds the JIT compile " +
            s"limit in subtree:\n${subtree.linesIterator.take(5).mkString("\n")}")
      }
    }
  }

  for (q <- Seq("q38_ann_lsh", "q92_ann_lsh_scaled")) {
    test(s"$q probe ladder stays inside a bounded expression budget") {
      // round-4 regression guard: the flip-two probe ladder once expanded
      // to ~296 string-surgery structs over an inlined 64-term sign
      // expression — tens of thousands of expression nodes after projection
      // collapse. The integer-bucket + XOR-mask form sits near 150 nodes
      // REGARDLESS of bits/tables (masks are exploded data, q92's 79-mask
      // ladder must cost the same plan as q38's 37); the budget leaves
      // headroom for plan-shape drift but fails long before codegen is in
      // danger again.
      val df = SparkEntry.queries(q)(spark, dir)
      val nExpr = df.queryExecution.optimizedPlan
        .map(node => node.expressions.map(e => e.collect { case x => x }.size).sum).sum
      assert(nExpr < 2000, s"$q optimized plan carries $nExpr expression nodes — " +
        "probe generation is inflating expressions again (keep probes as exploded data)")
    }

    test(s"$q whole-stage codegen compiles every method under the JIT limit") {
      import org.apache.spark.sql.execution.debug._
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect() // finalize the AQE plan so all codegen subtrees exist
      val stats = codegenStringSeq(df.queryExecution.executedPlan)
      assert(stats.nonEmpty, s"expected at least one WholeStageCodegen subtree in $q")
      stats.foreach { case (subtree, _, s) =>
        // HotSpot never JIT-compiles methods over ~8 KiB bytecode
        // (DontCompileHugeMethods); a subtree at that size runs interpreted
        // and floods the code cache — the round-4 failure mechanism
        assert(s.maxMethodCodeSize < 8000,
          s"generated method of ${s.maxMethodCodeSize} bytes exceeds the JIT compile " +
            s"limit in subtree:\n${subtree.linesIterator.take(5).mkString("\n")}")
      }
    }
  }
}
