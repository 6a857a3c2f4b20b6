package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The PQ kernels' cross-engine contracts: (1) [[PqEncode]]'s
  * argmin-L2 must reproduce the relational min_by(struct(round(d2, 6),
  * code)) ordering exactly, ties and all — the ordering the DuckDB
  * oracle ranks with; (2) [[PqAdcMicros]] quantizes per-subspace
  * partials with HALF_UP (away from zero), NOT math.round's
  * floor(x+0.5) — the −0.5-micro partial must land on −1. */
class PqExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PqEncode matches the join+min_by relational reference, ties included") {
    import spark.implicits._
    val m = 4; val k = 5; val dsub = 4
    val rng = new Random(17)
    def vec(n: Int): Array[Double] = Array.fill(n)(rng.nextDouble() * 2 - 1)
    val cb = Array.tabulate(m, k)((_, _) => vec(dsub))
    // plant an exact tie: codes 1 and 3 of subspace 2 are identical, so
    // every vector's d2 ties there and the LOWER code must win
    cb(2)(3) = cb(2)(1).clone()
    val book = new PqBook(m, k, dsub, cb.flatten.flatMap(identity))

    val vecs = (0 until 300).map(i => (i.toLong, vec(m * dsub)))
    val df = vecs.toDF("vec_id", "u").cache()
    val got = df.select(col("vec_id"),
      posexplode(CodebookFunctions.pqEncode(col("u"), book)).as(Seq("j", "code")))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap

    val cbRows = (for (j <- 0 until m; c <- 0 until k)
      yield (j, c.toLong, cb(j)(c).toSeq)).toDF("j", "code", "cv")
    val ref = df.crossJoin(cbRows)
      .select(col("vec_id"), col("j"), col("code"),
        round(aggregate(zip_with(slice(col("u"), col("j") * dsub + 1, lit(dsub)), col("cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x), 6).as("d2"))
      .groupBy("vec_id", "j")
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap

    assert(got.size == 300 * m && got == ref)
    // the planted tie resolved to the lower code everywhere
    assert(vecs.forall { case (id, _) => got((id, 2)) != 3L })
  }

  test("PqAdcMicros rounds half-micros away from zero (HALF_UP, not floor(x+0.5))") {
    import spark.implicits._
    // m=1, k=1, dsub=1: partial = qu[0] * cb, chosen so partial * 1e6
    // lands EXACTLY on ±0.5 (0.5 * round(1e-6) * 1e6 == 0.5 in doubles)
    val neg = new PqBook(1, 1, 1, Array(-1e-6))
    val pos = new PqBook(1, 1, 1, Array(1e-6))
    val df = Seq((0.5, Seq(0L))).toDF("x", "codes")
      .select(array(col("x")).as("qu"), col("codes"))
    val n = df.select(CodebookFunctions.pqAdcMicros(col("qu"), col("codes"), neg))
      .collect()(0).getLong(0)
    val p = df.select(CodebookFunctions.pqAdcMicros(col("qu"), col("codes"), pos))
      .collect()(0).getLong(0)
    assert(n == -1L, s"-0.5 micros must round to -1 (got $n) — math.round would give 0")
    assert(p == 1L)
  }
}
