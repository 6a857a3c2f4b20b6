package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q116 falsifiability: payloads sharing planted aligned frames are
  * paired with the exact shared count; the hot-frame cap drops
  * boilerplate frames whole without killing pairs that share enough
  * distinctive frames. */
class FrameDupsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(c: Char) = c.toString * 10 // frameChars = 10 below

  test("pairs share exactly the planted aligned frames") {
    import spark.implicits._
    val shared = frame('a') + frame('b') + frame('c')
    val docs = Seq(
      (1L, shared + frame('x')),
      (2L, shared + frame('y')),
      (3L, frame('z') * 4)).toDF("doc_id", "text")
    val out = Multimodal.frameDupsOf(docs, frameChars = 10, minShared = 3,
        maxFramePopulation = 1000)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 3L)), s"expected exactly (1,2,3): ${out.toSeq}")
  }

  test("hot frames are dropped whole; distinctive frames still pair") {
    import spark.implicits._
    // frame('h') appears in every payload (cap 3 -> dropped); docs 1/2
    // still share three distinctive frames
    val hot = frame('h')
    val docs = (1L to 5L).map { i =>
      val body = if (i <= 2) frame('p') + frame('q') + frame('r') else frame(('s' + i).toChar) * 3
      (i, hot + body)
    }.toDF("doc_id", "text")
    val out = Multimodal.frameDupsOf(docs, frameChars = 10, minShared = 3,
        maxFramePopulation = 3)
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L, 3L)),
      s"hot frame must not count toward any pair: ${out.toSeq}")
  }
}
