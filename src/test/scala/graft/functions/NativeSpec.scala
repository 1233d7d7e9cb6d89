package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class NativeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jaccardSorted: exact merge-walk on known sets") {
    val df = Seq((Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L, 6L))).toDF("a", "b")
    val j = df.select(Native.jaccardSorted(col("a"), col("b"))).head.getDouble(0)
    assert(j == 2.0 / 6.0)
  }

  test("hashedShingleSet: sorted, distinct, short-doc rule") {
    val df = Seq(Seq("a", "b", "a", "b")).toDF("toks")
    val arr = df.select(Native.hashedShingleSet(col("toks"), 2)).head.getSeq[Long](0)
    // shingles: "a b","b a","a b" → 2 distinct
    assert(arr.length == 2 && arr == arr.sorted)
    val short = Seq(Seq("a")).toDF("toks")
      .select(Native.hashedShingleSet(col("toks"), 3)).head.getSeq[Long](0)
    assert(short.length == 1)
  }

  test("cosineSim matches the HOF aggregate-fold bit-for-bit") {
    val df = Seq((Array(0.3f, -1.2f, 2.7f), Array(1.1f, 0.4f, -0.2f))).toDF("a", "b")
    val native = df.select(Native.cosineSim(col("a"), col("b"))).head.getDouble(0)
    val hof = df.select({
      val d = aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      val na = sqrt(aggregate(col("a"), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
      val nb = sqrt(aggregate(col("b"), lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
      d / (na * nb)
    }).head.getDouble(0)
    assert(native == hof)
  }

  test("cosineSim is whole-stage-codegen'd: compiled path runs and agrees with interpreted eval") {
    // with codegen fallback DISABLED a janino compile error would throw
    // instead of silently interpreting — this proves the generated loop
    // compiles and produces the same bits as nullSafeEval
    val key = "spark.sql.codegen.fallback"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val df = Seq(
        (Array(0.3f, -1.2f, 2.7f), Array(1.1f, 0.4f, -0.2f)),
        (Array(0f, 0f), Array(1f, 2f)), // zero norm → 0.0
        (Array(3f, 4f), Array(3f, 4f))  // parallel → 1.0
      ).toDF("a", "b")
      val got = df.select(Native.cosineSim(col("a"), col("b"))).collect().map(_.getDouble(0))
      val interp = df.collect().map { r =>
        val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices.take(b.length)) {
          dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        }
        val norm = math.sqrt(na) * math.sqrt(nb)
        if (norm > 0) dot / norm else 0.0
      }
      assert(got.toSeq == interp.toSeq)
      assert(got(1) == 0.0 && got(2) == 1.0)
      // and the expression really is codegen-capable (not a fallback)
      import org.apache.spark.sql.GraftBridge
      assert(!GraftBridge.expr(Native.cosineSim(col("a"), col("b")))
        .isInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    } finally spark.conf.set(key, old)
  }

  test("shingleMinhash deterministic and sensitive to content") {
    val fam = graft.scale.Shingling.HashFamily(16)
    val df = Seq(Seq("x", "y", "z", "w"), Seq("x", "y", "z", "w"), Seq("p", "q", "r", "s"))
      .toDF("toks")
    val sigs = df.select(Native.shingleMinhash(col("toks"), 2,
      fam.coeffs.map(_._1), fam.coeffs.map(_._2))).collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 16)
  }

  test("simhash64: equal tokens equal hash; near sets have small hamming") {
    val df = Seq(
      Seq("a", "b", "c", "d", "e", "f", "g", "h"),
      Seq("a", "b", "c", "d", "e", "f", "g", "x"),
      Seq("z1", "z2", "z3", "z4", "z5", "z6", "z7", "z8")).toDF("toks")
    val fps = df.select(Native.simhash64(col("toks"))).collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0), fps(1)) < ham(fps(0), fps(2)))
  }
}
