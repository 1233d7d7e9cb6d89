package graft.io

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AvroSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_avro").toString

  test("roundtrip: flat primitives with nulls, value- and schema-exact") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("small", IntegerType, nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, 7, Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null),
      Row(3L, "gamma", -0.25, false, -1, Array.emptyByteArray))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp()
    Avro.writeAvro(df, dir)
    // one container file per partition, task-side
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) === 2)
    val back = Avro.readAvro(spark, dir)
    assert(back.schema === schema.copy(fields = schema.fields.map(_.copy(nullable = true)))
      || back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
         schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) === "alpha" && got(1L).getDouble(2) === 1.5 &&
      got(1L).getBoolean(3) && got(1L).getInt(4) === 7 &&
      (got(1L).getAs[Array[Byte]](5) sameElements Array[Byte](1, 2, 3)))
    assert((1 to 5).forall(got(2L).isNullAt))
    assert(got(3L).getAs[Array[Byte]](5).isEmpty)
  }

  test("roundtrip: array columns (the embeddings shape)") {
    val df = Seq(
      (1L, Seq(0.5f, -1.25f, 3.0f)),
      (2L, Seq.empty[Float])).toDF("vec_id", "embedding")
    val dir = tmp()
    Avro.writeAvro(df, dir)
    val back = Avro.readAvro(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(back(1L) === Seq(0.5f, -1.25f, 3.0f))
    assert(back(2L).isEmpty)
  }

  test("unsupported types fail loudly at schema translation, before any task") {
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    val e = intercept[IllegalArgumentException](Avro.writeAvro(df, tmp()))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("reader: empty path fails loudly; multi-file directories union completely") {
    intercept[Exception](Avro.readAvro(spark, tmp()))
    val dir = tmp()
    Avro.writeAvro(spark.range(100).toDF("id").repartition(5), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) === 5)
    val back = Avro.readAvro(spark, dir)
    assert(back.count() === 100L)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) === 4950L)
  }
}
