package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, zero-norm=0") {
    val df = Seq((
      Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(0.0f, 0.0f)
    )).toDF("a", "b", "c", "z")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c")),
      Similarity.cosine(col("a"), col("z"))).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("brute-force top-k returns k best by cosine, excluding the query id") {
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.3 + j).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs.head._2.map(_.toDouble).toSeq
    val got = Similarity.topKBruteForce(df, "vec_id", "embedding", q, 5, excludeId = Some(0L))
      .as[(Long, Double)].collect()
    assert(got.length == 5)
    assert(!got.exists(_._1 == 0L))
    assert(got.map(_._2).toSeq == got.map(_._2).sorted(Ordering[Double].reverse).toSeq)
  }

  test("IVF top-k: full probe (nprobe = nlist) reproduces brute force exactly") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j * 1.3).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val ivf = Similarity.ivfTopK(df, queries, "vec_id", "embedding", "query_id",
      k = 5, nlist = 4, nprobe = 4)
      .as[(Long, Long, Double, Int)].collect().groupBy(_._1)
    val q0 = vecs.head._2.map(_.toDouble).toSeq
    val brute = Similarity.topKBruteForce(df, "vec_id", "embedding", q0, 5, excludeId = Some(0L))
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(ivf(0L).map(_._2).toSet == brute) // same top-5 membership
    assert(ivf.forall(_._2.length == 5))
  }

  test("ANN LSH top-k finds the exact nearest neighbor for a self-similar corpus") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 0.21 + j) + 2.0).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val ann = Similarity.annTopK(df, queries, "vec_id", "embedding", "query_id",
      k = 3, bits = 4, tables = 8, dim = 8)
      .as[(Long, Long, Double, Int)].collect()
    assert(ann.nonEmpty)
    val perQuery = ann.groupBy(_._1)
    assert(perQuery.forall(_._2.length <= 3))
    assert(ann.forall(r => r._1 != r._2)) // self excluded
  }

  test("ANN exact-collapse: dup-heavy corpus output equals the uncollapsed path") {
    // 3 copies of each of 12 distinct vectors, plus a null-vector row;
    // queries drawn FROM the corpus so self-exclusion and the k+1 group
    // slack are both exercised
    val vecs = (for {
      i <- 0L until 12L
      c <- 0 until 3
    } yield (i * 100L + c, Array.tabulate(8)(j => (math.sin(i * 0.21 + j) + 2.0).toFloat))) ++
      Seq((990L, null.asInstanceOf[Array[Float]]))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") === 0L || col("vec_id") === 301L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def canon(f: org.apache.spark.sql.DataFrame) =
      f.as[(Long, Long, Double, Int)].collect().toSet
    val old = canon(Similarity.annTopK(df, queries, "vec_id", "embedding", "query_id",
      k = 5, bits = 1, tables = 16, dim = 8, collapseIdentical = false))
    val neu = canon(Similarity.annTopK(df, queries, "vec_id", "embedding", "query_id",
      k = 5, bits = 1, tables = 16, dim = 8))
    assert(neu == old)
    // the query's own duplicates rank first (cosine of the identical
    // vector — float-rounded, so compare loosely), self excluded
    assert(neu.exists { case (q, c, s, r) => q == 0L && c == 1L && s > 0.9999 && r == 1 })
    assert(!neu.exists { case (q, c, _, _) => q == c })
  }

  test("knnExact is the recall baseline: ANN top-1 hits the exact top-1 for most queries") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => (math.sin(i * 0.21 + j) + 2.0).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.knnExact(df, queries, "vec_id", "embedding", "query_id", k = 1)
      .as[(Long, Long, Double, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(exact.size == 10)
    val ann = Similarity.annTopK(df, queries, "vec_id", "embedding", "query_id",
      k = 1, bits = 4, tables = 8, dim = 8)
      .as[(Long, Long, Double, Int)].collect().map(r => r._1 -> r._2).toMap
    val hits = exact.count { case (q, id) => ann.get(q).contains(id) }
    assert(hits >= 7, s"ANN top-1 recall too low: $hits/10") // recall@1 with 8 tables
  }

  test("hardNegatives: only other-label candidates, ranked like knnExact on that slice") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.29 + j * 0.7).toFloat), (i % 3).toInt)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val anchors = df.filter(col("vec_id") < 4)
      .select(col("vec_id").as("anchor_id"), col("embedding"), col("label"))
    val got = Similarity.hardNegatives(df, anchors, "vec_id", "embedding", "label",
        "anchor_id", k = 5)
      .as[(Long, Long, Double, Int)].collect()
    val labelOf = vecs.map(v => v._1 -> v._3).toMap
    assert(got.groupBy(_._1).forall(_._2.length == 5))
    assert(got.forall { case (a, c, _, _) => a != c && labelOf(a) != labelOf(c) })
    // equivalent to exact kNN over the pre-filtered other-label corpus
    for (a <- 0L until 4L) {
      val other = df.filter(col("label") =!= labelOf(a).toInt)
      val anchor = anchors.filter(col("anchor_id") === a)
      val exact = Similarity.knnExact(other, anchor, "vec_id", "embedding", "anchor_id",
          k = 5, excludeSelf = false)
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got.filter(_._1 == a).toSet == exact)
    }
    // null-label corpus rows are never negatives
    val withNull = df.withColumn("label",
      when(col("vec_id") === 29L, lit(null)).otherwise(col("label")))
    val gotNull = Similarity.hardNegatives(withNull, anchors, "vec_id", "embedding",
        "label", "anchor_id", k = 30)
      .as[(Long, Long, Double, Int)].collect()
    assert(!gotNull.exists(_._2 == 29L))
  }

  test("rrfFuse: exact 2-list fusion, single-list candidates keep null ranks") {
    val la = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val lb = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Similarity.rrfFuse(la, lb, "query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Int]),
          Option(r.get(3)).map(_.asInstanceOf[Int]), r.getDouble(4)))).toMap
    assert(got == Map(
      (1L, 10L) -> ((Some(1), None, 1.0 / 61.0)),
      (1L, 11L) -> ((Some(2), Some(1), 1.0 / 62.0 + 1.0 / 61.0)),
      (1L, 12L) -> ((None, Some(2), 1.0 / 62.0)),
      (2L, 20L) -> ((Some(1), None, 1.0 / 61.0))))
    // both-list consensus outranks either single-list head
    assert(got((1L, 11L))._3 > got((1L, 10L))._3 && got((1L, 10L))._3 > got((1L, 12L))._3)
    // a smaller kRrf weights top ranks harder
    val tight = Similarity.rrfFuse(la, lb, "query_id", "doc_id", kRrf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(tight((1L, 10L)) == 1.0 / 2.0 && tight((1L, 11L)) == 1.0 / 3.0 + 1.0 / 2.0)
  }

  test("fitted IVF and LSH recall gates on the clustered fixture") {
    // RecallProbe's clustered fixture at spec size (128 clusters of 8):
    // the fitted coarse quantizer and hyperplane LSH must retrieve the
    // semantic neighborhood nearly perfectly when the data HAS cluster
    // structure (RECALL.jsonl r12: both 1.0000 at 4096x512). The same
    // configs probe near-chance on the structureless testdata
    // embeddings — the documented data-property contrast
    // (clusteredFixture scaladoc), which is exactly why the floors are
    // pinned HERE and not there.
    val fx = Similarity.clusteredFixture(spark, 1024, 64, 128).localCheckpoint()
    val fq = fx.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.knnExact(fx, fq, "vec_id", "embedding", "query_id", k = 7)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val rIvf = recallOf(Similarity.ivfTopK(
      fx, fq, "vec_id", "embedding", "query_id", k = 7, nlist = 16, nprobe = 4))
    assert(rIvf >= 0.85, s"fitted IVF recall collapsed on clustered data: $rIvf")
    val rLsh = recallOf(Similarity.annTopK(
      fx, fq, "vec_id", "embedding", "query_id", k = 7, bits = 12, tables = 4))
    assert(rLsh >= 0.85, s"LSH recall collapsed on clustered data: $rLsh")
  }

  test("semanticContamination: max cosine, min-eval-id ties, flag, null drop") {
    val corpus = Seq(
      (1L, Some(Seq(2.0, 0.0))),  // cos 1.0 vs eval 5, 0 vs eval 7
      (2L, Some(Seq(1.0, 1.0))),  // cos ~0.7071 vs BOTH -> tie -> eval 5
      (3L, Some(Seq(0.0, -3.0))), // cos 0 vs 5, -1 vs 7 -> max 0 at eval 5
      (4L, None)                  // null vector: dropped
    ).toDF("vec_id", "embedding")
    val evals = Seq((5L, Seq(1.0, 0.0)), (7L, Seq(0.0, 1.0)))
      .toDF("eval_id", "evec")
    val got = Similarity.semanticContamination(
      corpus, "vec_id", "embedding", evals, "eval_id", "evec",
      thresholdMicro = 900000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) === ((1000000L, 5L, true)))
    assert(got(2L) === ((707107L, 5L, false)), "tie must take the SMALLEST eval id")
    assert(got(3L) === ((0L, 5L, false)))
  }

  test("semanticContamination: empty eval set and out-of-range eval ids fail fast") {
    val corpus = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.semanticContamination(corpus, "vec_id", "embedding",
        Seq.empty[(Long, Seq[Double])].toDF("eval_id", "evec"),
        "eval_id", "evec", 500000L)
    }
    assert(e1.getMessage.contains("empty eval set"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.semanticContamination(corpus, "vec_id", "embedding",
        Seq((-1L, Seq(1.0, 0.0))).toDF("eval_id", "evec"),
        "eval_id", "evec", 500000L)
    }
    assert(e2.getMessage.contains("[0, 2^31)"))
  }
}
