package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q163 falsifiability: RRF fusion semantics on planted pools, and the
  * gate-shape contract on the real testdata. */
class HybridRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("fusion: both-pool doc beats single-pool docs at equal ranks") {
    import spark.implicits._
    // query 1: doc 10 is rank 1 in BOTH pools; docs 11/12 are rank 1 in
    // exactly one pool each. RRF(1,1) = 2/(61) > RRF(1,-) = 1/61.
    val lex = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 0L))
      .filter(_._3 > 0L).toDF("query_id", "doc_id", "rank_lex")
    val den = Seq((1L, 10L, 1L), (1L, 12L, 1L))
      .toDF("query_id", "doc_id", "rank_dense")
    val out = Hybrid.fuse(lex, den, topK = 10, rrfK = 60)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val expectedBoth = 1000000000000L / 61 + 1000000000000L / 61
    assert(out.head == ((1L, 10L, 1L, 1L, expectedBoth, 1L)),
      s"both-pool doc must fuse to rank 1: $out")
    // single-pool rank-1 (doc 12) beats lexical rank-2 (doc 11):
    // 1e12/61 > 1e12/62
    assert(out.map(_._2) == Seq(10L, 12L, 11L), s"fused order wrong: $out")
    // absent-from-pool ranks surface as 0
    val d12 = out.find(_._2 == 12L).get
    assert(d12._3 == 0L && d12._4 == 1L, s"absent lexical rank must be 0: $d12")
  }

  test("fusion ties break by doc_id and integer scores are exact") {
    import spark.implicits._
    // two docs with identical pool ranks -> identical rrf_pico -> the
    // doc_id tiebreak must order them
    val lex = Seq((1L, 21L, 3L), (1L, 20L, 3L)).toDF("query_id", "doc_id", "rank_lex")
    val den = spark.emptyDataset[(Long, Long, Long)]
      .toDF("query_id", "doc_id", "rank_dense")
    val out = Hybrid.fuse(lex, den, topK = 10, rrfK = 60)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(20L, 21L), s"tie must break by doc_id: $out")
    assert(out.forall(_._5 == 1000000000000L / 63), s"exact floor division: $out")
  }

  test("q163 gate shape on testdata: ranks dense, provenance consistent") {
    val out = Hybrid.rrfTopK(spark, sf).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet, s"8 query docs expected: ${byQ.keySet}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(5)).sorted.toSeq == (1L to rows.length).toSeq,
        s"ranks must be dense 1..k for query $q")
      rows.foreach { r =>
        val (rl, rd, pico) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(rl > 0L || rd > 0L, s"every hit needs at least one pool rank: $r")
        val expected = (if (rl > 0) 1000000000000L / (60 + rl) else 0L) +
          (if (rd > 0) 1000000000000L / (60 + rd) else 0L)
        assert(pico == expected, s"rrf_pico must be the exact integer fusion: $r")
        assert(r.getLong(1) != q, "self-hit leaked through a pool")
      }
      // fused order is (rrf_pico desc, doc_id)
      val sortedPairs = rows.sortBy(_.getLong(5)).map(r => (-r.getLong(4), r.getLong(1)))
      assert(sortedPairs.toSeq == sortedPairs.sorted.toSeq, s"fused order broken for $q")
    }
    // determinism: a second run is row-identical
    val again = Hybrid.rrfTopK(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q166: the from-artifact fusion is row-identical to the live pools") {
    val live = Hybrid.rrfTopK(spark, sf).collect().map(_.toString).toSeq
    val fromIdx = Hybrid.rrfTopKFromIndexes(spark, sf).collect().map(_.toString).toSeq
    assert(fromIdx == live,
      "hybrid served from the persisted BM25 + LSH artifacts diverged from the live pools")
  }

  test("q167: the ANN-pooled fusion clears the recall bound with an exact verdict") {
    val r = Hybrid.rrfAnnPoolRecall(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "hybrid_lsh_pool")
    val (nExact, nHit) = (row.getLong(1), row.getLong(2))
    assert(nExact == 80L, s"8 queries x topK 10 fused reference rows, got $nExact")
    assert(nHit <= nExact)
    // the verdict column IS the gate: recall must be the exact ratio and
    // the flag must reflect the bound (and hold at gate scale)
    assert(math.abs(row.getDouble(3) - math.round(nHit * 10000.0 / nExact) / 10000.0) < 1e-12)
    assert(row.getBoolean(4), s"fused recall ${row.getDouble(3)} fell under the 0.7 bound")
    // a lexical-pool hit can survive a dense-pool miss: fused recall must
    // not be BELOW the raw dense recall gate's floor by construction --
    // sanity: with the exact lexical pool shared, at least half survive
    assert(nHit * 2 >= nExact)
  }

  test("q169: the fully deployed (both-pools-from-artifacts) fusion equals q167's relation") {
    val live = Hybrid.rrfAnnPoolRecall(spark, sf).collect().map(_.toString).toSeq
    val deployed = Hybrid.rrfDeployedRecall(spark, sf).collect().map(_.toString).toSeq
    assert(deployed == live,
      "the artifact-served lexical pool changed the fused-recall verdict")
    assert(deployed.nonEmpty && deployed.head.contains("true"),
      s"the deployed hybrid fell under the recall bound: $deployed")
  }

  test("q169's deployed half is structurally corpus-free: no embeddings scan, documents only as the pushed query batch") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // cold plan on purpose: a resident lexical-pool stage from an earlier
    // gate run would substitute an InMemoryRelation for the query-batch
    // scan (CacheManager matches by plan), hiding the very scans this
    // test pins
    Hybrid.releaseStages(spark)
    val (lex, ann) = Hybrid.deployedPools(spark, sf,
      nQueries = 8L, prefixTokens = 8, poolK = 20, salts = 32)
    val fused = Hybrid.fuse(lex, ann, topK = 10, rrfK = 60)
    fused.collect()
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case s: FileSourceScanExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(scansOf)
    }
    val scans = scansOf(fused.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    // the heavy corpus vector table is UNREACHABLE: the dense pool comes
    // from the LSH artifact alone (and the lexical corpus relation is a
    // thrown thunk inside rankedFromIndex — it could not even analyze)
    assert(!scans.exists(_.relation.location.rootPaths
        .exists(_.toString.contains("embeddings.parquet"))),
      "the deployed fusion scanned the corpus embeddings table")
    // the ONLY documents touch is the 8-row query-batch derivation, and
    // its doc_id bound reaches the parquet scan as a pushed filter
    val docScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains("documents.parquet")))
    assert(docScans.nonEmpty, "the stand-in query batch vanished")
    assert(docScans.forall(_.metadata.get("PushedFilters")
        .exists(_.contains("doc_id"))),
      "the query-batch doc_id bound was not pushed to the documents scan")
    // and both artifacts actually serve the pools
    for (store <- Seq("/postings", "/buckets"))
      assert(scans.exists(_.relation.location.rootPaths
          .exists(_.toString.contains(store))),
        s"no $store artifact scan in the deployed plan")
  }

  test("q170: the IVFADC dense pool clears the same gate — pool-agnosticism on a second family") {
    val r = Hybrid.rrfPqPoolRecall(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "hybrid_pq_pool")
    val (nExact, nHit) = (row.getLong(1), row.getLong(2))
    // the exact-pool reference is SHARED with q167 by construction:
    // same 8 queries x topK 10
    assert(nExact == 80L, s"8 queries x topK 10 fused reference rows, got $nExact")
    assert(nHit <= nExact)
    assert(math.abs(row.getDouble(3) - math.round(nHit * 10000.0 / nExact) / 10000.0) < 1e-12)
    assert(row.getBoolean(4), s"fused recall ${row.getDouble(3)} fell under the 0.7 bound")
  }
}
