package graft.ops

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Cross-implementation fuzz for BM25: the distributed pipeline must
  * reproduce a naive in-memory implementation of the same formula —
  * per-term weights rounded to 1e6-scaled longs exactly as the plan
  * does — on seeded random corpora. Catches join/aggregation mistakes
  * (df over the wrong relation, dl mixups, tf duplication) that the
  * single-oracle gate could only catch on its one corpus. */
class RetrievalFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def naiveBm25(docs: Seq[(Long, String)], queries: Seq[(Int, String)],
      topK: Int): Seq[(Long, Long, Double, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val nDocs = docs.size.toLong
    val sumDl = toks.values.map(_.size.toLong).sum
    val avgdl = sumDl * 1.0 / nDocs
    queries.flatMap { case (qid, qtext) =>
      val terms = qtext.split("\\s+").filter(_.nonEmpty).distinct
      // df per term over docs containing it
      val dfm = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
      val scored = toks.toSeq.flatMap { case (docId, ts) =>
        val dl = ts.size.toLong
        val sm = terms.map { term =>
          val tf = ts.count(_ == term).toLong
          if (tf == 0) 0L
          else {
            val df = dfm(term)
            val idf = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
            val w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            math.round(w * 1e6)
          }
        }.sum
        if (sm == 0) None else Some((docId, sm))
      }
      scored.sortBy { case (id, sm) => (-sm, id) }.take(topK).zipWithIndex.map {
        case ((docId, sm), i) =>
          // HALF_UP to the 4th decimal — Spark's round(), not rint's half-even
          val score = BigDecimal(sm / 1000000.0)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          (qid.toLong, docId, score, (i + 1).toLong)
      }
    }
  }

  test("distributed BM25 equals the naive implementation on seeded random corpora") {
    import spark.implicits._
    val rnd = new Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (trial <- 1 to 3) {
      val docs = (0L until 30L).map { id =>
        val len = 3 + rnd.nextInt(12)
        id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val queries = Seq(1 -> s"${vocab(rnd.nextInt(4))} ${vocab(4 + rnd.nextInt(4))}",
        2 -> vocab(rnd.nextInt(vocab.size)))
      val expected = naiveBm25(docs, queries, topK = 5)

      val dir = java.nio.file.Files.createTempDirectory(s"graft-bm25-fuzz$trial")
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = Retrieval.bm25TopK(spark, dir.toString, queries = queries, topK = 5)
        .as[(Long, Long, Double, Long)].collect().toSeq
      assert(got == expected,
        s"trial $trial diverged:\n got      $got\n expected $expected")
    }
  }
}
