package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Self-contained Avro object-container source/sink on the avro core
  * library (`org.apache.avro` ships in /opt/spark/jars even without
  * the spark-avro DATASOURCE module) — the one mainstream row format
  * the io/ package was missing beside CSV/Parquet/ORC/JSONL/Excel/XLS/
  * WARC. Hand-rolled like [[Xls]] (no external datasource, zero new
  * dependencies): the writer emits one standard container file per
  * partition via DataFileWriter, the reader parses whole files via
  * DataFileReader.
  *
  * Type surface: the flat-table primitives the engine's tables use —
  * boolean/int/long/float/double/string/binary, nullable via the
  * standard [null, T] union, plus arrays of those primitives (the
  * embeddings column). Nested records/maps/logical types are out of
  * scope and fail loudly at schema translation, never silently.
  *
  * Scale shape: writer = one container file per partition written
  * task-side (no driver collect); reader = `binaryFile` source → one
  * task per file → sequential block parse (Avro blocks ARE splittable
  * at sync markers, but file-level parallelism is the axis that
  * matters at the many-files layouts real pipelines ship — the
  * [[Warc.readWetStrict]] argument).
  */
object Avro {

  private def toAvroSchema(f: StructField): org.apache.avro.Schema = {
    import org.apache.avro.Schema
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"Avro sink: unsupported type $other for field '${f.name}' " +
          "(flat primitives and arrays of them only)")
    }
    val base = f.dataType match {
      case ArrayType(et, containsNull) =>
        val el = prim(et)
        Schema.createArray(
          if (containsNull) Schema.createUnion(
            Schema.create(Schema.Type.NULL), el)
          else el)
      case dt => prim(dt)
    }
    if (f.nullable)
      Schema.createUnion(Schema.create(Schema.Type.NULL), base)
    else base
  }

  private[io] def schemaFor(schema: StructType): org.apache.avro.Schema = {
    import org.apache.avro.Schema
    val rec = Schema.createRecord("graft_row", null, "graft", false)
    rec.setFields(schema.fields.map { f =>
      val sch = toAvroSchema(f)
      // a null default is only legal when the union starts with null
      if (f.nullable)
        new Schema.Field(f.name, sch, null,
          org.apache.avro.Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, sch, null.asInstanceOf[String])
    }.toList.asJava)
    rec
  }

  private def toAvroValue(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    // Row.get returns mutable.ArraySeq for array columns, which is NOT
    // an immutable.Seq (the unqualified 2.13 Seq) — match the root trait
    case s: scala.collection.Seq[_] => s.map(toAvroValue).asJava
    case x => x
  }

  /** Write `df` as standard Avro container files, one
    * `part-NNNNN.avro` per partition, written task-side. Null-record
    * default schema (`graft_row`), deflate-free (null codec) for
    * engine-portable bytes.
    */
  def writeAvro(df: DataFrame, outDir: String): Unit = {
    val sparkSchema = df.schema
    // fail on unsupported types BEFORE launching tasks
    val avroSchemaJson = schemaFor(sparkSchema).toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val avroSchema = new org.apache.avro.Schema.Parser().parse(avroSchemaJson)
      val w = new org.apache.avro.file.DataFileWriter(
        new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](avroSchema))
      val path = java.nio.file.Paths.get(outDir, f"part-$pid%05d.avro")
      w.create(avroSchema, path.toFile)
      it.foreach { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(avroSchema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, toAvroValue(row.get(i)))
          i += 1
        }
        w.append(rec)
      }
      w.close()
      Iterator.empty[Int]
    }.count(): Unit
  }

  private def toSparkType(s: org.apache.avro.Schema, where: String): (DataType, Boolean) = {
    import org.apache.avro.Schema.Type._
    s.getType match {
      case UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != NULL)
        require(nonNull.size == 1,
          s"Avro source: only [null, T] unions supported at $where")
        val (dt, _) = toSparkType(nonNull.head, where)
        (dt, true)
      case BOOLEAN => (BooleanType, false)
      case INT => (IntegerType, false)
      case LONG => (LongType, false)
      case FLOAT => (FloatType, false)
      case DOUBLE => (DoubleType, false)
      case STRING => (StringType, false)
      case BYTES => (BinaryType, false)
      case ARRAY =>
        val (et, en) = toSparkType(s.getElementType, where)
        (ArrayType(et, en), false)
      case other => throw new IllegalArgumentException(
        s"Avro source: unsupported Avro type $other at $where")
    }
  }

  private[io] def sparkSchemaFor(rec: org.apache.avro.Schema): StructType =
    StructType(rec.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema(), f.name())
      StructField(f.name(), dt, nullable)
    }.toSeq)

  private def fromAvroValue(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case l: java.util.Collection[_] =>
      l.asScala.map(fromAvroValue).toSeq
    case x => x
  }

  /** Read Avro container files (file, directory, or glob) into a
    * DataFrame. The schema comes from the first file (driver-side
    * header read); every file must carry a record schema whose fields
    * translate to the supported flat surface.
    */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val files = spark.read.format("binaryFile").load(path)
    val first = files.select(col("content")).orderBy(col("path")).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException(s"Avro source: no files at $path"))
      .getAs[Array[Byte]](0)
    val headerReader = new DataFileReader(
      new SeekableByteArrayInput(first),
      new GenericDatumReader[GenericRecord]())
    val avroSchemaJson = try headerReader.getSchema.toString
      finally headerReader.close()
    val sparkSchema = sparkSchemaFor(
      new org.apache.avro.Schema.Parser().parse(avroSchemaJson))
    val nFields = sparkSchema.length
    val rows = files.select(col("content")).rdd.flatMap { r =>
      val reader = new DataFileReader(
        new SeekableByteArrayInput(r.getAs[Array[Byte]](0)),
        new GenericDatumReader[GenericRecord]())
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (reader.hasNext) {
          val rec = reader.next()
          buf += Row.fromSeq((0 until nFields).map(i => fromAvroValue(rec.get(i))))
        }
        buf
      } finally reader.close()
    }
    spark.createDataFrame(rows, sparkSchema)
  }
}
