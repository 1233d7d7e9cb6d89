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

  test("fitted IVFADC recall gate on the clustered fixture; residual-fitted reconstructs residuals better") {
    // the RecallProbe fixture at spec size: 128 tight clusters of 8 —
    // the semantic-neighborhood shape where exact top-6 = the cluster
    // siblings and fitted codebooks carry signal. RECALL.jsonl r12
    // measured 0.8542 (raw) / 0.8819 (residual, matched fitResidual)
    // at 4096x512; the floor leaves drift headroom. On STRUCTURELESS
    // data the same configs probe near-chance by design (clusteredFixture
    // scaladoc) — that contrast is the documented expectation, not a bug.
    val fx = Similarity.clusteredFixture(spark, 1024, 64, 128).localCheckpoint()
    val fq = fx.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding"))
    import org.apache.spark.sql.expressions.Window
    val c = fx.select(col("vec_id"), col("embedding").as("cv"))
    val qq = fq.select(col("query_id"), col("embedding").as("qv"))
    val d2 = Similarity.dot(col("cv"), col("cv")) +
      Similarity.dot(col("qv"), col("qv")) -
      lit(2.0) * Similarity.dot(col("cv"), col("qv"))
    val w = Window.partitionBy("query_id").orderBy(asc("d2"), asc("vec_id"))
    val exact = c.crossJoin(broadcast(qq))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val cents = Similarity.fitIvfCentroids(
      fx, "vec_id", "embedding", nlist = 8, normalize = false, dim = 64)
    def recallOf(model: Pq.Model, residual: Boolean): Double = {
      val got = Pq.ivfAdcTopK(fx, fq, "vec_id", "embedding", "query_id",
        k = 6, model, nlist = 8, nprobe = 4, excludeSelf = true,
        residual = residual, centroids0 = Some(cents))
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val fitted = Pq.fit(fx, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val fittedRes = Pq.fitResidual(fx, "vec_id", "embedding", dim = 64,
      centroids = cents, m = 8, k = 16)
    val rRaw = recallOf(fitted, residual = false)
    val rRes = recallOf(fittedRes, residual = true)
    assert(rRaw >= 0.7, s"fitted raw-code recall collapsed on clustered data: $rRaw")
    assert(rRes >= 0.7, s"residual-fitted recall collapsed on clustered data: $rRes")
    // the property fitResidual exists for, asserted where it is
    // deterministic: codebooks fitted ON residuals reconstruct the
    // residuals strictly better than the raw-fitted model does
    // (recall orderings at any one fixture size are data-dependent;
    // the reconstruction gap is not)
    val resDf = fx.select(col("vec_id"),
      org.apache.spark.sql.functions.zip_with(
        col("embedding").cast("array<double>"),
        element_at(typedLit(cents.map(_.toSeq).toSeq),
          graft.functions.Native.nearestCells(
            col("embedding"), cents, 1)(0) + 1),
        (x, c) => x - c).as("res"))
    def reconErr(m: Pq.Model): Double =
      Pq.encode(resDf, "vec_id", "res", m).agg(sum("recon_err")).head.getDouble(0)
    assert(reconErr(fittedRes) < reconErr(fitted),
      "residual-fitted codebooks must reconstruct residuals better than the raw-fitted model")
  }
}
