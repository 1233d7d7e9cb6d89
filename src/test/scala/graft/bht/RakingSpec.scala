package graft.bht

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class RakingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed sample: 60/40 gender split, targets want 50/50; age 70/30 → 40/60
  private def sample = {
    val rows =
      Seq.fill(30)(("m", "young")) ++ Seq.fill(30)(("m", "old")) ++
        Seq.fill(25)(("f", "young")) ++ Seq.fill(15)(("f", "old"))
    rows.toDF("gender", "age")
  }

  test("raked marginals converge to the targets") {
    val cw = Raking.ipfCellWeights(sample, "gender", "age",
      rowTargets = Map("m" -> 50.0, "f" -> 50.0),
      colTargets = Map("young" -> 40.0, "old" -> 60.0), iters = 20)
    val cells = cw.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val mSum = cells(("m", "young")) + cells(("m", "old"))
    val fSum = cells(("f", "young")) + cells(("f", "old"))
    val ySum = cells(("m", "young")) + cells(("f", "young"))
    val oSum = cells(("m", "old")) + cells(("f", "old"))
    assert(math.abs(mSum - 50.0) < 1e-6 && math.abs(fSum - 50.0) < 1e-6)
    assert(math.abs(ySum - 40.0) < 1e-6 && math.abs(oSum - 60.0) < 1e-6)
  }

  test("applyRake: per-case weights reproduce the cell mass") {
    val cw = Raking.ipfCellWeights(sample, "gender", "age",
      rowTargets = Map("m" -> 50.0, "f" -> 50.0),
      colTargets = Map("young" -> 40.0, "old" -> 60.0), iters = 20)
    val raked = Raking.applyRake(sample, "gender", "age", cw)
    val total = raked.agg(sum(col("rake_weight"))).head().getDouble(0)
    assert(math.abs(total - 100.0) < 1e-6)
    val my = raked.filter(col("gender") === "m" && col("age") === "young")
      .agg(sum(col("rake_weight"))).head().getDouble(0)
    val cwMy = cw.collect().find(r => r.getString(0) == "m" && r.getString(1) == "young").get.getDouble(2)
    assert(math.abs(my - cwMy) < 1e-9)
  }

  test("effective sample size: equal weights => neff == n, deff == 1") {
    val df = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0)).toDF("g", "w")
    val out = Raking.effectiveSampleSize(df, "w")
      .collect()(0)
    assert(out.getLong(0) == 3L)
    assert(out.getDouble(1) == 3.0) // (6)^2 / 12
    assert(out.getDouble(2) == 1.0)
  }

  test("effective sample size: skewed weights shrink neff") {
    val df = Seq(("a", 1.0), ("a", 9.0)).toDF("g", "w")
    val out = Raking.effectiveSampleSize(df, "w", Seq("g")).collect()(0)
    // (10)^2 / 82 ≈ 1.2195... < n=2
    assert(out.getLong(1) == 2L)
    assert(math.abs(out.getDouble(2) - 100.0 / 82.0) < 1e-12)
    assert(out.getDouble(3) > 1.0)
  }

  test("applyRake with design weights preserves within-cell weight structure") {
    val df = Seq(("m", "y", 1.0), ("m", "y", 3.0), ("f", "o", 2.0)).toDF("g", "a", "dw")
    // cell (m,y) original mass 4; give it raked mass 8 → factor 2
    val cw = Seq(("m", "y", 8.0), ("f", "o", 2.0)).toDF("g", "a", "weight")
    val out = Raking.applyRake(df, "g", "a", cw, weightCol = Some("dw"))
      .select("dw", "rake_weight").as[(Double, Double)].collect().toMap
    assert(out(1.0) == 2.0 && out(3.0) == 6.0) // {1,3} × 2 — NOT {4,4}
    assert(out(2.0) == 2.0)                     // factor 1 cell
  }

  test("empty cells stay zero and don't poison the fit") {
    val rows = Seq.fill(10)(("m", "young")) ++ Seq.fill(10)(("f", "old"))
    val cw = Raking.ipfCellWeights(rows.toDF("gender", "age"), "gender", "age",
      rowTargets = Map("m" -> 30.0, "f" -> 70.0),
      colTargets = Map("young" -> 30.0, "old" -> 70.0), iters = 20)
    val cells = cw.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(cells(("m", "old")) == 0.0 && cells(("f", "young")) == 0.0)
    assert(math.abs(cells(("m", "young")) - 30.0) < 1e-6)
    assert(math.abs(cells(("f", "old")) - 70.0) < 1e-6)
  }
}
