package graft.core

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Distributed batch inference: one Spark job for N files (never a
  * driver loop of N sequential reads), with per-file results identical
  * to the sequential [[Inference.detectFile]] path. */
class InferenceBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("detectFiles infers 50 files in a single-digit job count with per-file parity") {
    val dir = Files.createTempDirectory("graft-infer-batch")
    val paths = (0 until 50).map { i =>
      val p = dir.resolve(f"f$i%02d.csv")
      // vary the schema so per-file inference actually differs
      val body =
        if (i % 3 == 0) s"id,v\n$i,1.5\n2,2.5\n"
        else if (i % 3 == 1) s"id,v\n$i,x\n2,y\n"
        else s"id,v\n$i,7\n2,8\n"
      Files.write(p, body.getBytes)
      p.toString
    }
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val batch =
      try Inference.detectFiles(spark, paths, ',', sampleRows = 100)
      finally {
        // the listener bus is async — give it a moment to drain before reading
        val deadline = System.nanoTime() + 3e9.toLong
        while (jobs.get() == 0 && System.nanoTime() < deadline) Thread.sleep(50)
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(batch.size === 50)
    assert(jobs.get() >= 1 && jobs.get() <= 9,
      s"50-file inference must be one distributed job, saw ${jobs.get()}")
    // bit-identical to the sequential per-file path
    for (p <- paths.take(6))
      assert(batch(p) === Inference.detectFile(spark, p, ',', sampleRows = 100), p)
    // the schema variety actually materialized
    assert(batch.values.map(_.types).toSet.size === 3)
  }
}
