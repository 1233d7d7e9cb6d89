package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matryoshka truncation: unit-norm prefix, correct norm fraction, zero-prefix is null") {
    val df = Seq(
      (1L, Array(3f, 4f, 0f, 0f, 12f, 0f, 0f, 0f)), // prefix(4) norm 5, full norm 13
      (2L, Array(0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f))   // zero prefix
    ).toDF("vec_id", "embedding")
    val got = Embeddings.truncateMatryoshka(df, "vec_id", "embedding", dim = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val v1 = got(1L).getSeq[Double](1)
    assert(v1 == Seq(0.6, 0.8, 0.0, 0.0))
    assert(got(1L).getDouble(2) == 5.0 / 13.0)
    assert(got(2L).isNullAt(1)) // no direction survives the cut
    assert(got(2L).getDouble(2) == 0.0)
  }

  test("matryoshka truncation: rows shorter than dim are flagged null, not silently kept whole") {
    val df = Seq(
      (1L, Array(3f, 4f, 0f, 0f, 12f, 0f, 0f, 0f)), // long enough
      (2L, Array(1f, 2f))                           // shorter than dim=4
    ).toDF("vec_id", "embedding")
    val got = Embeddings.truncateMatryoshka(df, "vec_id", "embedding", dim = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got(1L).isNullAt(1))
    assert(got(2L).isNullAt(1) && got(2L).isNullAt(2)) // masked, not norm_kept=1.0
  }

  test("binary quantization: expected bit pattern, hamming matches manual count") {
    // dim 70 forces two packed words; component j positive iff j in S
    val s1 = Set(0, 1, 63, 64, 69)
    val s2 = Set(0, 2, 63, 69)
    def vec(s: Set[Int]) = Array.tabulate(70)(j => if (s(j)) 1f else -1f)
    val df = Seq((1L, vec(s1)), (2L, vec(s2))).toDF("vec_id", "embedding")
    val packed = df.select(col("vec_id"),
        Embeddings.binaryQuantize(col("embedding"), 70).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def expectWords(s: Set[Int]): Seq[Long] = Seq(
      s.filter(_ < 64).map(j => 1L << j).foldLeft(0L)(_ + _),
      s.filter(_ >= 64).map(j => 1L << (j - 64)).foldLeft(0L)(_ + _))
    assert(packed(1L) == expectWords(s1))
    assert(packed(2L) == expectWords(s2))
    val ham = df.select(Embeddings.hammingPacked(
        lit(packed(1L).toArray), lit(packed(2L).toArray))).head.getLong(0)
    assert(ham == (s1 diff s2).size + (s2 diff s1).size)
  }

  test("hammingTopK: ranks by sign disagreement with id tiebreak, no window in plan") {
    val base = Array.tabulate(8)(j => if (j % 2 == 0) 1f else -1f)
    def flip(n: Int) = base.zipWithIndex.map { case (x, j) => if (j < n) -x else x }
    val corpus = Seq(
      (0L, base), (1L, flip(1)), (2L, flip(2)), (3L, flip(8)), (4L, flip(1))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = Embeddings.hammingTopK(corpus, q, "vec_id", "embedding", "query_id",
      k = 3, dim = 8, excludeSelf = true)
      .select("vec_id", "hamming", "rank").as[(Long, Long, Int)].collect()
      .sortBy(_._3)
    // dist: 1->1, 4->1 (tie broken by id), 2->2
    assert(got.toSeq == Seq((1L, 1L, 1), (4L, 1L, 2), (2L, 2L, 3)))
    // structural plan check (cf. ScalePlanSpec): no WindowExec anywhere
    val plan = Embeddings.hammingTopK(corpus, q, "vec_id", "embedding", "query_id",
      k = 3, dim = 8, excludeSelf = true)
    def collectPlans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val deeper = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          collectPlans(a.inputPlan)
        case _ => p.children.flatMap(collectPlans)
      }
      p +: deeper
    }
    assert(collectPlans(plan.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "hammingTopK must use the bounded aggregate epilogue")
  }

  test("groupCentroids: hand means in long format, null vectors skipped") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), 0),
      (2L, Some(Array(3.0f, 4.0f)), 0),
      (3L, Some(Array(10.0f, 20.0f)), 1),
      (4L, None, 1) // null vector: contributes nothing, n stays 1
    ).toDF("vec_id", "embedding", "label")
    val got = Embeddings.groupCentroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got((0, 0L)) == ((2.0, 2L))) // (1+3)/2
    assert(got((0, 1L)) == ((3.0, 2L))) // (2+4)/2
    assert(got((1, 0L)) == ((10.0, 1L)))
    assert(got((1, 1L)) == ((20.0, 1L)))
    assert(got.size == 4)
    // partition-invariant: exact long sums, no double accumulation order
    val again = Embeddings.groupCentroids(df.repartition(5), "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got == again)
  }

  test("assignToCentroids: nearest centroid wins, null vectors assign null") {
    val df = Seq(
      (1L, Some(Array(0.0f, 0.0f)), 0),
      (2L, Some(Array(0.2f, 0.0f)), 0),
      (3L, Some(Array(10.0f, 0.0f)), 1),
      (4L, Some(Array(9.8f, 0.0f)), 1),
      (5L, None, 1) // null vector
    ).toDF("vec_id", "embedding", "label")
    val cents = Embeddings.groupCentroids(df, "label", "embedding")
    val out = Embeddings.assignToCentroids(df, "embedding", cents, "label")
    val got = out.collect().map { r =>
      r.getLong(r.fieldIndex("vec_id")) ->
        (if (r.isNullAt(r.fieldIndex("assigned"))) -1 else r.getInt(r.fieldIndex("assigned")))
    }.toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> -1))
    // a vector nearer the OTHER class's centroid crosses over
    val probe = Seq((9L, Array(7.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val cross = Embeddings.assignToCentroids(probe, "embedding", cents, "label")
      .collect().head
    assert(cross.getInt(cross.fieldIndex("assigned")) == 1)
    // non-orderable group type must error, not silently mis-order ties
    val dblGroups = Seq((1L, Array(1.0f), 0.5)).toDF("vec_id", "embedding", "label")
    assertThrows[IllegalArgumentException] {
      Embeddings.assignToCentroids(df, "embedding",
        Embeddings.groupCentroids(dblGroups, "label", "embedding"), "label")
    }
    // a partial model (missing component row) must error, not zero-fill
    assertThrows[IllegalArgumentException] {
      Embeddings.assignToCentroids(df, "embedding",
        cents.filter(!(col("label") === 0 && col("pos") === 0)), "label")
    }
    // a vector whose dim differs from the model must error, not be
    // prefix-scored (collect forces the assert_true filter to run)
    val wrongDim = Seq((7L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val dimErr = intercept[Exception] {
      Embeddings.assignToCentroids(wrongDim, "embedding", cents, "label").collect()
    }
    assert(dimErr.getMessage.contains("vector dim != model dim"))
    // null-group rows in the model frame are ignored, not cap-eaten
    val withNullGroup = Seq((100L, Array(5.0f, 5.0f), null.asInstanceOf[Integer]))
      .toDF("vec_id", "embedding", "label")
    val centsPlus = Embeddings.groupCentroids(df.unionByName(
      withNullGroup.withColumn("label", col("label").cast("int"))), "label", "embedding")
    val viaPlus = Embeddings.assignToCentroids(df, "embedding", centsPlus, "label")
      .select("vec_id", "assigned").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(viaPlus == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> -1))
  }

  test("normAudit: zero vectors counted, ragged dims flagged, exact micro norms") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Array(3.0f, 4.0f), 0),        // norm 5
      (2L, Array(0.0f, 0.0f), 0),        // zero vector
      (3L, Array(6.0f, 8.0f), 1),        // norm 10
      (4L, Array(1.0f, 0.0f, 0.0f), 1)   // ragged: dim 3 in label 1
    ).toDF("vec_id", "embedding", "label")
    val got = Embeddings.normAudit(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("0") == ((2L, 1L, 1L, 0.0, 2.5, 5.0)))
    assert(got("1") == ((2L, 0L, 2L, 1.0, 5.5, 10.0))) // ragged -> 2 distinct dims
  }

  test("projectionSigns: seed-deterministic, ±1 only, seeds diverge") {
    val a = Embeddings.projectionSigns(64, 8, seed = 7L)
    val b = Embeddings.projectionSigns(64, 8, seed = 7L)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(s => s == 1 || s == -1))
    // both signs occur, and a different seed gives a different matrix
    assert(a.flatten.toSet == Set(1, -1))
    val c = Embeddings.projectionSigns(64, 8, seed = 8L)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }

  test("randomProject: exact hand chain, malformed vectors dropped") {
    val signs = Array(Array(1, -1), Array(-1, 1))
    val df = Seq(
      (1L, Array(3.0f, 1.0f)),
      (2L, Array(0.5f, -0.5f)),
      (3L, Array(1.0f)),             // wrong width: dropped
      (4L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
    val got = Embeddings.randomProject(df, "vec_id", "embedding", signs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inv = 1.0 / math.sqrt(2.0)
    assert(got == Map(
      (1L, 0L) -> (3.0 - 1.0) * inv, (1L, 1L) -> (-3.0 + 1.0) * inv,
      (2L, 0L) -> (0.5 - -0.5) * inv, (2L, 1L) -> (-0.5 + -0.5) * inv))
  }

  test("centerAudit: centering removes exactly the common component's energy") {
    val df = Seq(
      // group a: common component (1, 1) plus symmetric noise (±0.5, 0)
      (1L, Array(1.5f, 1.0f), "a"),
      (2L, Array(0.5f, 1.0f), "a"),
      // group b: already centered
      (3L, Array(0.5f, -0.5f), "b"),
      (4L, Array(-0.5f, 0.5f), "b")
    ).toDF("vec_id", "embedding", "grp_in")
    val got = Embeddings.centerAudit(df, "vec_id", "embedding", "grp_in")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: ss_before = (1.5²+1²) + (0.5²+1²) = 4.5e12 over 2 vecs; mean (1,1);
    //    ss_after = 0.25e12+0.25e12 = 0.5e12; shift = n·‖mean‖² = 4e12
    assert(got("a") === ((2L, 2250000000000L, 250000000000L, 4000000000000L)))
    // b: mean 0 -> centering is a no-op
    assert(got("b") === ((2L, 500000000000L, 500000000000L, 0L)))
  }

  test("centroidDrift: identical snapshots are zero-drift; orthogonal shift measured; one-sided NULL") {
    val a = Seq(("g", Seq(1.0, 0.0)), ("h", Seq(3.0, 4.0)), ("only_a", Seq(1.0, 1.0)))
      .toDF("label", "vec")
    val same = Embeddings.centroidDrift(a, a, "label", "vec")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    assert(same("g") === ((Some(0L), Some(1000000L))))
    assert(same("h") === ((Some(0L), Some(1000000L))))
    val b = Seq(("g", Seq(0.0, 1.0)), ("h", Seq(3.0, 4.0)), ("only_b", Seq(2.0, 2.0)))
      .toDF("label", "vec")
    val got = Embeddings.centroidDrift(a, b, "label", "vec")
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    // g: (1,0) vs (0,1): L2 = sqrt(2) micro -> 1414214; cos 0
    assert(got("g") === ((Some(1L), Some(1L), Some(1414214L), Some(0L))))
    assert(got("h") === ((Some(1L), Some(1L), Some(0L), Some(1000000L))))
    // one-sided groups surface with NULL drift — the vanished/new signal
    assert(got("only_a") === ((Some(1L), None, None, None)))
    assert(got("only_b") === ((None, Some(1L), None, None)))
  }

  test("centroidDrift: dim mismatch — missing components count as 0 in BOTH metrics, dims surfaced") {
    // snapshot a is 3-dim, snapshot b is 2-dim (encoder version bump):
    // a = (1, 0, 2), b = (1, 0) — the extra component must contribute
    // its full magnitude to L2 (2.0 -> sqrt(4) = 2) and zero to dot
    val a = Seq(("g", Seq(1.0, 0.0, 2.0))).toDF("label", "vec")
    val b = Seq(("g", Seq(1.0, 0.0))).toDF("label", "vec")
    val r = Embeddings.centroidDrift(a, b, "label", "vec").collect().head
    assert(r.getAs[Long]("dim_a") === 3L)
    assert(r.getAs[Long]("dim_b") === 2L)
    // L2 = sqrt((1-1)^2 + 0 + (2-0)^2) = 2.0 -> 2000000 micro
    assert(r.getAs[Long]("drift_micro") === 2000000L)
    // cos = dot / (|a||b|) = 1 / (sqrt(5) * 1) -> 447214 micro — the
    // same zeros the L2 saw (dot partial, norms full)
    assert(r.getAs[Long]("cos_micro") === 447214L)
  }

  test("simplifiedSilhouette: hand-checked separation over groupCentroids") {
    val pts = Seq(
      (1L, 0L, Seq(0.0, 0.0)), (2L, 0L, Seq(2.0, 0.0)),   // centroid (1, 0)
      (3L, 1L, Seq(10.0, 0.0)), (4L, 1L, Seq(12.0, 0.0))  // centroid (11, 0)
    ).toDF("id", "cl", "vec")
    val cents = Embeddings.groupCentroids(pts, "cl", "vec")
    val got = Embeddings.simplifiedSilhouette(pts, "id", "vec", "cl", cents, "cl")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // each cluster: a = 1 for both points; b = 11 and 9;
    // s = 10/11 -> 909090 (trunc) and 8/9 -> 888888
    assert(got(0L) === ((2L, 2L, 2000000L, 20000000L, 1797978L, 898989.0)))
    assert(got(1L) === ((2L, 2L, 2000000L, 20000000L, 1797978L, 898989.0)))
  }

  test("simplifiedSilhouette: negative score for mis-assigned points, sign-factored div") {
    val cents = Seq((0L, 0L, 0.0), (0L, 1L, 0.0), (1L, 0L, 10.0), (1L, 1L, 0.0))
      .toDF("g", "pos", "centroid")
    val pts = Seq((1L, 0L, Seq(9.0, 0.0))).toDF("id", "cl", "vec") // closer to g=1
    val r = Embeddings.simplifiedSilhouette(pts, "id", "vec", "cl", cents, "g")
      .collect().head
    // a = 9e6, b = 1e6: s = -((8e6 * 1e6) div 9e6) = -888888 (truncated, not floored)
    assert(r.getAs[Long]("sum_sil_micro") == -888888L)
    assert(r.getAs[Double]("mean_sil_micro") == -888888.0)
  }

  test("simplifiedSilhouette: single-centroid model scores NULL in-band; coincident point 0") {
    val one = Seq((0L, 0L, 0.0)).toDF("g", "pos", "centroid")
    val pts = Seq((1L, 0L, Seq(3.0))).toDF("id", "cl", "vec")
    val r = Embeddings.simplifiedSilhouette(pts, "id", "vec", "cl", one, "g")
      .collect().head
    assert(r.getAs[Long]("n") == 1L && r.getAs[Long]("n_scored") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_sil_micro")))
    // two centroids at the same spot: a = b = 0 -> s = 0, not NULL/NaN
    val same = Seq((0L, 0L, 0.0), (1L, 0L, 0.0)).toDF("g", "pos", "centroid")
    val p0 = Seq((1L, 0L, Seq(0.0))).toDF("id", "cl", "vec")
    val r0 = Embeddings.simplifiedSilhouette(p0, "id", "vec", "cl", same, "g")
      .collect().head
    assert(r0.getAs[Long]("n_scored") == 1L && r0.getAs[Long]("sum_sil_micro") == 0L)
  }
}
