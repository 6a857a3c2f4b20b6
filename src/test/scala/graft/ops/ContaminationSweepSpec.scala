package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The q123 sweep contract ([[Retrieval.contaminationRetrievalSweep]]):
  * paging the eval set through id-range batches must emit EXACTLY the
  * uncapped single-batch relation — the batch-independence argument
  * (df/n_docs/avgdl are corpus statistics, ranking is within-query) made
  * falsifiable. The sweep is the API form of the q119 scale fix: one
  * giant batch at the 100× corpus measured 56–85 s of postings fan-out,
  * while each bounded batch stays ~constant as the eval suite grows.
  */
class ContaminationSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01" // 500 docs -> eval ids 0,97,...,485

  test("the paged sweep equals the uncapped single run, row for row") {
    val single = Retrieval.contaminationRetrieval(spark, dir)
      .collect().map(_.toSeq).toSeq
    // batchWidth 100 over ids 0..499: five real batches, eval ids split
    // across them (0|97|194|291|388|485 -> batches 0,0,1,2,3,4)
    val swept = Retrieval.contaminationRetrievalSweep(spark, dir, batchWidth = 100L)
      .collect().map(_.toSeq).toSeq
    assert(Retrieval.lastSweepBatches.get() == 5,
      s"expected 5 pages, got ${Retrieval.lastSweepBatches.get()}")
    assert(swept == single)
  }

  test("a batch width wider than the id space degenerates to one page") {
    val swept = Retrieval.contaminationRetrievalSweep(spark, dir, batchWidth = 1000000L)
      .collect().map(_.toSeq).toSeq
    assert(Retrieval.lastSweepBatches.get() == 1)
    val single = Retrieval.contaminationRetrieval(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(swept == single)
  }
}
