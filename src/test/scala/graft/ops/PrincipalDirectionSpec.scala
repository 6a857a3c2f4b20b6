package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q111 falsifiability: on a cloud whose variance is planted along one
  * known axis, the recovered principal direction must put its peak
  * loading on that axis — a wrong mat-vec (or a sign/centering bug)
  * cannot pass. Plus the output contract (normalized loadings) and the
  * plan shape (hash aggregates + broadcasts, no window over the corpus).
  */
class PrincipalDirectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 200 vectors in 16 dims: dim 5 (1-based pos 6) carries spread
    * ±(i mod 20), everything else small deterministic jitter. */
  private def plantedCloud() = {
    import spark.implicits._
    (0 until 200).map { i =>
      val main = (i % 20 - 10).toFloat // dominant variance on one axis
      val v = Array.tabulate(16) { j =>
        if (j == 5) main
        else ((i * 31 + j * 7) % 11 - 5).toFloat * 0.05f
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("peak loading lands on the planted axis with |loading| = 1") {
    import spark.implicits._
    val out = Similarity.principalDirectionOf(plantedCloud(), dim = 16)
      .as[(Long, Double)].collect().toMap
    assert(out.size == 16)
    val peak = out.maxBy { case (_, l) => math.abs(l) }
    assert(peak._1 == 6L, s"peak loading at pos ${peak._1}, expected 6: $out")
    assert(math.abs(peak._2) == 1.0, s"peak loading not normalized: ${peak._2}")
    // off-axis loadings are small relative to the planted axis
    out.filter(_._1 != 6L).foreach { case (p, l) =>
      assert(math.abs(l) < 0.3, s"off-axis pos $p loading $l too large")
    }
  }

  test("corpus-scale aggregations are hash aggregates; 64-row relations broadcast") {
    val p = Similarity.principalDirection(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p.take(1000))
    assert(!p.contains("CartesianProduct"), s"cartesian in q111 plan:\n${p.take(1500)}")
    assert(!p.contains("Window "), s"window over the corpus in q111 plan:\n${p.take(1500)}")
  }
}
