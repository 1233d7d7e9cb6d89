package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("native functions callable from plain SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |  simhash64(array('a','b','c')) AS sh,
        |  jaccard_sorted(array(1L,2L,3L), array(2L,3L,4L)) AS js,
        |  size(hashed_shingle_set(array('a','b','c'), 2)) AS hs,
        |  size(shingle_minhash(array('a','b','c','d'), 2, 16)) AS mh,
        |  simhash_portable(array('a','b','c')) AS shp
        |""".stripMargin).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 0.5)
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) == 16)
    // 60-bit portable fingerprint: nonzero, top 4 bits clear
    assert(r.getLong(5) != 0L && (r.getLong(5) >>> 60) == 0L)
  }

  test("SQL function matches the Column API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(0.5f, 1.5f), Array(1.0f, -0.5f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val api = df.select(Native.cosineSim(col("a"), col("b"))).head.getDouble(0)
    val sql = spark.sql("SELECT cosine_sim(a, b) FROM vecs").head.getDouble(0)
    assert(api == sql)
  }
}
