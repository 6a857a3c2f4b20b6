package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** An all-null value group produces an EMPTY KLL sketch; the quantile
  * estimator must yield null for it (the exact verdict side emits
  * n_values = 0 and a 0 flag), not the SketchesArgumentException the
  * raw datasketches call throws — one fully-null (range, event_type)
  * group must not crash a whole rollup serve. */
class KllEmptySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kllQuantile of an empty sketch is null, not an exception") {
    import spark.implicits._
    val df = Seq(("a", Option.empty[Double]), ("a", None), ("b", Some(2.0)))
      .toDF("g", "value")
      .groupBy("g")
      .agg(KllFunctions.kllSketchAgg(col("value")).as("sk"))
      .select(col("g"), KllFunctions.kllQuantile(col("sk"), 0.5).as("p50"))
    val byG = df.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(byG("a").isEmpty, "empty-sketch quantile should be null")
    assert(byG("b").contains(2.0))
  }
}
