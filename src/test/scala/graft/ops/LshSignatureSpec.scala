package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The fused [[graft.functions.LshSignature]] expression must produce
  * bit-identical bucket keys to the per-bit `when(dot >= 0)` column
  * form ([[Similarity.signBucketInt]]) it replaced for build speed —
  * same plane lattice, same index-order summation, same NaN rank. */
class LshSignatureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def keysOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("vec_id").collect()
      .map(r => s"${r.getLong(0)}:${r.getSeq[Int](1).mkString(",")}").toSeq

  test("fused signature equals the column form across geometries") {
    val unit = Similarity.unitEmbeddings(spark, dir)
    for ((bits, nTables) <- Seq((8, 8), (12, 5), (14, 8), (20, 8))) {
      val fused = Similarity.lshSignaturesOf(unit, bits, nTables)
        .select(col("vec_id"), col("buckets"))
      val refCols = (0 until nTables).map(t =>
        Similarity.signBucketInt(col("u"), t, bits))
      val ref = unit.select(col("vec_id"), array(refCols: _*).as("buckets"))
      assert(keysOf(fused) == keysOf(ref),
        s"fused keys diverged from the column form at ($bits, $nTables)")
    }
  }

  test("a NaN vector ranks like Spark's >= (bit set), not IEEE") {
    import spark.implicits._
    // a zero vector unit-normalizes to all-NaN: every dot is NaN, and
    // Spark's `>=` ranks NaN above any number, so EVERY bit must be set
    val z = Seq((0L, Array.fill(64)(Double.NaN))).toDF("vec_id", "u")
    val fused = Similarity.lshSignaturesOf(z, 8, 2)
      .select(col("vec_id"), col("buckets"))
    val refCols = (0 until 2).map(t => Similarity.signBucketInt(col("u"), t, 8))
    val ref = z.select(col("vec_id"), array(refCols: _*).as("buckets"))
    assert(keysOf(fused) == keysOf(ref), "NaN rank diverged from the column form")
    assert(keysOf(fused).head == "0:255,255", s"all bits must be set: ${keysOf(fused)}")
  }
}
