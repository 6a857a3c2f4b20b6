package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The IVF build-once/query-many lifecycle: a saved index (codebook +
  * centroid-partitioned inverted file) must answer queries IDENTICALLY
  * to the live session stage — doubles round-trip parquet bit-exactly,
  * and both paths share one probe pipeline, so any divergence means the
  * artifact lost information (schema, types, partition column) rather
  * than precision. Also pins the layout claim: the inverted file is
  * partitioned by cent_id, so probing prunes to nProbe directories.
  */
class IvfIndexPersistenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("a saved IVF index answers identically to the live session stage") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
    try {
      Similarity.saveIvfIndex(spark, dir, tmp)
      val live = rows(Similarity.ivfTopK(spark, dir, nQueries = 50))
      val loaded = rows(Similarity.ivfTopKFromIndex(spark, tmp, nQueries = 50))
      assert(live.nonEmpty)
      assert(live == loaded, "persisted-index answers diverged from the live stage")
      // layout: one directory per centroid id — the storage-level analog
      // of "probe cost ∝ nProbe lists, not the corpus"
      val parts = new java.io.File(s"$tmp/assignments").listFiles()
        .filter(_.getName.startsWith("cent_id=")).map(_.getName).toSet
      assert(parts.size == 16, s"expected 16 centroid partitions, got ${parts.size}")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(tmp))
    }
  }
}
