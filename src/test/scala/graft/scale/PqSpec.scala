package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8

  private def vecs(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 4f).toArray)
    }.toDF("vec_id", "embedding")

  test("syntheticModel: exact-decimal grid, deterministic, correct shape") {
    val m1 = Pq.syntheticModel(dim, m = 4, k = 4, seed = 7L)
    val m2 = Pq.syntheticModel(dim, m = 4, k = 4, seed = 7L)
    assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(m1.dsub == 2)
    // every component is a multiple of 1/64 in [-2, 2)
    for (j <- m1.codebooks; c <- j; v <- c) {
      assert(v >= -2.0 && v < 2.0 && (v * 64.0) == math.rint(v * 64.0))
    }
  }

  test("encode: codes are 1-based argmin of subspace distances") {
    val model = Pq.syntheticModel(dim, m = 2, k = 4, seed = 42L)
    val df = vecs(6)
    val got = Pq.encode(df, "vec_id", "embedding", model).collect()
    val rows = got.map(r => r.getLong(0) -> r).toMap
    for ((id, arr) <- (0 until 6).map(i => (i.toLong, (0 until dim).map(j => ((i * 31 + j * 7) % 13 - 6).toDouble / 4.0).toArray))) {
      val r = rows(id)
      var expectedErr = 0.0
      for (j <- 0 until model.m) {
        val sub = arr.slice(j * model.dsub, (j + 1) * model.dsub)
        val dists = model.codebooks(j).map(c =>
          c.zip(sub).map { case (cv, xv) => (xv - cv) * (xv - cv) }.sum)
        val minD = dists.min
        val code = dists.indexWhere(_ == minD) + 1
        assert(r.getLong(1 + j) == code.toLong, s"vec $id subspace $j")
        expectedErr += minD
      }
      assert(math.abs(r.getDouble(1 + model.m) - expectedErr) < 1e-6)
    }
  }

  test("ivfAdcTopK full probe (nprobe = nlist) reproduces flat ADC exactly") {
    val model = Pq.syntheticModel(dim, m = 4, k = 8, seed = 1L)
    val corpus = vecs(60)
    val queries = vecs(4).select(col("vec_id").as("query_id"), col("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "adc_dist", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val flat = rows(Pq.adcTopK(corpus, queries, "vec_id", "embedding",
      "query_id", k = 6, model, excludeSelf = true))
    val full = rows(Pq.ivfAdcTopK(corpus, queries, "vec_id", "embedding",
      "query_id", k = 6, model, nlist = 5, nprobe = 5, excludeSelf = true))
    assert(full == flat,
      "full-probe IVFADC must equal the flat ADC scan (raw-vector codes)")
  }

  test("ivfAdcTopK production probe: recall vs flat ADC is high, never a false hit") {
    val model = Pq.syntheticModel(dim, m = 4, k = 8, seed = 1L)
    val corpus = vecs(120)
    val queries = vecs(6).select(col("vec_id").as("query_id"), col("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val flat = pairs(Pq.adcTopK(corpus, queries, "vec_id", "embedding",
      "query_id", k = 5, model, excludeSelf = true))
    val probed = Pq.ivfAdcTopK(corpus, queries, "vec_id", "embedding",
      "query_id", k = 5, model, nlist = 6, nprobe = 3, excludeSelf = true)
    val got = pairs(probed)
    // pruning can only LOSE candidates relative to per-query flat rank
    // order, never invent distances: every probed hit at rank r has the
    // flat ADC distance, so recall is the one quality axis
    val recall = (got intersect flat).size.toDouble / flat.size
    assert(recall >= 0.5, s"recall vs flat ADC collapsed: $recall")
    // and the distances it does report are the true ADC distances
    val flatDists = Pq.adcTopK(corpus, queries, "vec_id", "embedding",
      "query_id", k = 120, model, excludeSelf = true)
      .select("query_id", "vec_id", "adc_dist")
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, d) => (q, c) -> d }.toMap
    probed.select("query_id", "vec_id", "adc_dist")
      .as[(Long, Long, Double)].collect()
      .foreach { case (q, c, d) =>
        assert(flatDists((q, c)) == d, s"probed dist for ($q,$c) diverged") }
  }

  test("ivfAdcTopK residual: full probe == brute force over centroid+decoded-residual") {
    val model = Pq.syntheticModel(dim, m = 4, k = 8, seed = 1L)
    val n = 40
    val corpus = vecs(n)
    val queries = vecs(3).select(col("vec_id").as("query_id"), col("embedding"))
    val seed = 42L
    val got = Pq.ivfAdcTopK(corpus, queries, "vec_id", "embedding", "query_id",
      k = 5, model, nlist = 4, nprobe = 4, seed = seed,
      excludeSelf = true, residual = true)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    // driver reference: re-derive the deterministic coarse fit (same
    // seeded-hash sample draw + Lloyd — private[scale], same package),
    // then recon(x) = centroid[cell(x)] + decode(residual codes) and
    // exact squared L2 per (query, candidate), ascending, id tiebreak
    val sample = corpus
      .select(col("embedding").cast("array<double>").as("v"),
        xxhash64(col("vec_id"), lit(seed)).as("h"), col("vec_id").as("id"))
      .filter(col("v").isNotNull && size(col("v")) === dim)
      .orderBy(col("h"), col("id")).limit(4 * 1000)
      .collect().map(_.getSeq[Double](0).toArray)
    val cents = Similarity.fitCentroidsLloyd(sample, 4, iters = 5, seed)
    def raw(i: Int) = (0 until dim).map(j => ((i * 31 + j * 7) % 13 - 6).toDouble / 4.0).toArray
    def cellOf(v: Array[Double]): Int =
      cents.indices.minBy(c => (v.zip(cents(c)).map { case (x, y) => (x - y) * (x - y) }.sum, c))
    val cb = model.codebooks
    for (q <- 0 until 3) {
      val qv = raw(q)
      val expected = (0 until n).filter(_ != q).map { c =>
        val x = raw(c)
        val cell = cellOf(x)
        // mirror the ENGINE's float association exactly: both residuals
        // are materialized first, then per-subspace left-assoc sums —
        // NOT q − (c + decode), which differs by ulps
        val cq = cents(cell)
        val qres = qv.zip(cq).map { case (a, b) => a - b }
        val xres = x.zip(cq).map { case (a, b) => a - b }
        val d = (0 until model.m).map { j =>
          val lo = j * model.dsub; val hi = (j + 1) * model.dsub
          val xsub = xres.slice(lo, hi)
          val dists = cb(j).map(cv => cv.zip(xsub).map { case (a, b) => (b - a) * (b - a) }.sum)
          val code = dists.indexWhere(_ == dists.min)
          cb(j)(code).zip(qres.slice(lo, hi)).map { case (a, b) => (b - a) * (b - a) }.sum
        }.sum
        (math.floor(d * 1e6 + 0.5) / 1e6, c.toLong)
      }.sorted.take(5).map(_._2)
      assert(got(q.toLong) == expected, s"query $q")
    }
  }

  test("adcTopK == brute force over the decoded (reconstructed) corpus") {
    val model = Pq.syntheticModel(dim, m = 4, k = 8, seed = 1L)
    val corpus = vecs(40)
    val queries = vecs(3).select(col("vec_id").as("query_id"), col("embedding"))
    val got = Pq.adcTopK(corpus, queries, "vec_id", "embedding", "query_id",
      k = 5, model, excludeSelf = true)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    // reference: decode every corpus vector on the driver, exact
    // squared L2 per (query, candidate), ascending with id tiebreak
    val cb = model.codebooks
    def raw(i: Int) = (0 until dim).map(j => ((i * 31 + j * 7) % 13 - 6).toDouble / 4.0).toArray
    def reconOf(v: Array[Double]): Array[Double] =
      (0 until model.m).flatMap { j =>
        val sub = v.slice(j * model.dsub, (j + 1) * model.dsub)
        val dists = cb(j).map(c => c.zip(sub).map { case (cv, xv) => (xv - cv) * (xv - cv) }.sum)
        cb(j)(dists.indexWhere(_ == dists.min))
      }.toArray
    for (q <- 0 until 3) {
      val qv = raw(q)
      val expected = (0 until 40).filter(_ != q).map { c =>
        val r = reconOf(raw(c))
        val d = qv.zip(r).map { case (a, b) => (a - b) * (a - b) }.sum
        (math.floor(d * 1e6 + 0.5) / 1e6, c.toLong)
      }.sorted.take(5).map(_._2)
      assert(got(q.toLong) == expected, s"query $q")
    }
  }

  test("fit: deterministic across runs, codebook shape, encode round-trip sanity") {
    val df = vecs(60)
    val m1 = Pq.fit(df, "vec_id", "embedding", dim, m = 2, k = 4, iters = 3, seed = 9L)
    val m2 = Pq.fit(df.repartition(7), "vec_id", "embedding", dim, m = 2, k = 4, iters = 3, seed = 9L)
    assert(m1.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      m2.codebooks.map(_.map(_.toSeq).toSeq).toSeq) // partition-layout independent
    // a fitted codebook reconstructs its own training data better than
    // the data-blind synthetic grid
    val fitErr = Pq.encode(df, "vec_id", "embedding", m1)
      .agg(sum("recon_err")).head.getDouble(0)
    val synthErr = Pq.encode(df, "vec_id", "embedding", Pq.syntheticModel(dim, 2, 4))
      .agg(sum("recon_err")).head.getDouble(0)
    assert(fitErr < synthErr)
  }
}
