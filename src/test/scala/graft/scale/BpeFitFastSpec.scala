package graft.scale

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the word-histogram fast fit ([[TextAnalysis.bpeFitFast]]) to
  * the distributed per-round fit ([[TextAnalysis.bpeFit]]) — the
  * merge-for-merge equality the gate's oracle (which unrolls the
  * distributed rounds in SQL) depends on.
  */
class BpeFitFastSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def assertSameFit(docs: Seq[(Long, String)], merges: Int): Unit = {
    val df = docs.toDF("doc_id", "text")
    val slow = TextAnalysis.bpeFit(df, "text", merges)
    val fast = TextAnalysis.bpeFitFast(df, "text", merges)
    assert(fast == slow)
  }

  test("fast == distributed on a hand-sized corpus with ties and early stop") {
    assertSameFit(Seq(
      (1L, "the cat sat on the mat the hat"),
      (2L, "aaa aaaa aa"),
      (3L, "a\tb"),
      (4L, ""),
      (5L, null)), merges = 10)
  }

  test("fast == distributed on randomized corpora (pipes, tabs, unicode)") {
    val rnd = new scala.util.Random(1337)
    // includes a supplementary-plane char (as a whole code point, not
    // a raw char pick — a lone surrogate would round-trip lossily):
    // binary-UTF-8 vs UTF-16 ordering diverges there, which the fast
    // fit's argmax must follow
    val alphabet = Seq("a", "b", "c", "d", " ", "|", "\t", "𐀀", "é")
    for (trial <- 0 until 3) {
      val docs = (0 until 30).map { i =>
        val len = rnd.nextInt(25)
        (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      assertSameFit(docs, merges = 4 + trial)
    }
  }

  test("histogram overflow falls back to the distributed fit (still equal)") {
    val docs = (0 until 50).map(i => (i.toLong, s"w$i w$i common common"))
    val df = docs.toDF("doc_id", "text")
    val slow = TextAnalysis.bpeFit(df, "text", 3)
    // > 50 distinct word reps vs maxWords=8: must route to bpeFit
    val fast = TextAnalysis.bpeFitFast(df, "text", 3, maxWords = 8)
    assert(fast == slow)
  }
}
