package graft.convert

import graft.schema.SchemaInference
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Format detection & conversion (SURVEY §2.11 `FormatConverter` SPI;
  * behavior of `agent/common/CDCDataConverter.java:54-72` and the
  * per-format converters under `agent/common/converter/`): CSV / JSON /
  * Parquet / ORC / Avro, with magic-byte sniffing
  * (`ParquetConverter.java:102-113` "PAR1", `AvroConverter.java:66-73`
  * Avro container magic) and the `supportsPartial` flag that decides
  * append-delta vs full-rewrite conversion
  * (`CDCDataConverter.java:131-146`).
  *
  * CSV/JSON/Parquet/ORC are Spark built-ins (one-line read/write). The
  * environment bundles only avro-core (no spark-avro datasource), so the
  * Avro strategy does container encode/decode in `mapPartitions` over the
  * bundled org.apache.avro — flat schemas of primitives, which is exactly
  * the shape the reference's loader emits (all-nullable columns,
  * `autil/ParquetDataWriter.java:50-57`).
  */
object Formats {

  sealed trait Strategy {
    def name: String
    /** Append-friendly formats convert deltas incrementally; others need
      * a full rewrite (ref `AvroConverter.java:55-58`,
      * `ParquetConverter.java:91-94`). */
    def supportsPartial: Boolean
    def read(spark: SparkSession, path: String): DataFrame
    def write(df: DataFrame, path: String): Unit
  }

  object Csv extends Strategy {
    val name = "csv"; val supportsPartial = true
    def read(spark: SparkSession, path: String): DataFrame =
      spark.read.option("header", true).option("inferSchema", true).csv(path)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite").option("header", true).csv(path)
  }

  object Json extends Strategy {
    val name = "json"; val supportsPartial = true
    def read(spark: SparkSession, path: String): DataFrame =
      spark.read.json(path)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite").json(path)
  }

  object Parquet extends Strategy {
    val name = "parquet"; val supportsPartial = false
    def read(spark: SparkSession, path: String): DataFrame =
      spark.read.parquet(path)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite").parquet(path)
  }

  object Orc extends Strategy {
    val name = "orc"; val supportsPartial = false
    def read(spark: SparkSession, path: String): DataFrame =
      spark.read.orc(path)
    def write(df: DataFrame, path: String): Unit =
      df.write.mode("overwrite").orc(path)
  }

  /** Avro container files via the bundled avro-core in mapPartitions —
    * one container per partition on write; binaryFile + decode on read.
    * Supports flat schemas of string/long/int/double/float/boolean. */
  object Avro extends Strategy {
    val name = "avro"; val supportsPartial = true

    def read(spark: SparkSession, path: String): DataFrame = {
      val bin = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro").load(path)
        .select(col("content"))
      // decode one file to discover the schema (bounded collect: 1 row)
      val first = bin.limit(1).collect()
      require(first.nonEmpty, s"no avro files under $path")
      val schemaJson = {
        val r = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(first(0).getAs[Array[Byte]](0)),
          new GenericDatumReader[GenericRecord]())
        try r.getSchema.toString finally r.close()
      }
      val structType = avroToStruct(new Schema.Parser().parse(schemaJson))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(structType)
      bin.mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.flatMap { row =>
          val rd = new DataFileReader[GenericRecord](
            new SeekableByteArrayInput(row.getAs[Array[Byte]](0)),
            new GenericDatumReader[GenericRecord](schema))
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (rd.hasNext) out += recordToRow(rd.next(), schema)
          rd.close()
          out
        }
      }(enc)
    }

    def write(df: DataFrame, path: String): Unit = {
      val schemaJson = SchemaInference.toAvroSchema(df.schema, "row")
      val conf = new org.apache.hadoop.conf.Configuration()
      val fields = df.schema.fields
      // True overwrite WITHOUT destroy-before-write: the distributed
      // write lands in a staging dir; only after it completes is the
      // old directory swapped out — a mid-write failure leaves the
      // previous complete dataset untouched (per-partition
      // create(overwrite=true) alone also left stale part files behind
      // when a later write had fewer partitions).
      // (Contract note: TimestampType is written as epoch-millis long —
      // read() returns LongType for such columns.)
      val fs0 = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create(path), conf)
      val target = new org.apache.hadoop.fs.Path(path)
      val staging = new org.apache.hadoop.fs.Path(
        path + ".staging-" + java.util.UUID.randomUUID().toString.take(8))
      fs0.mkdirs(staging)
      val stagingStr = staging.toString
      try df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val schema = new Schema.Parser().parse(schemaJson)
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val fs = org.apache.hadoop.fs.FileSystem.get(
            java.net.URI.create(stagingStr),
            new org.apache.hadoop.conf.Configuration())
          val out = fs.create(new org.apache.hadoop.fs.Path(
            stagingStr, f"part-$pid%05d.avro"), true)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.create(schema, out)
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            fields.indices.foreach { i =>
              val v = if (row.isNullAt(i)) null else fields(i).dataType match {
                case StringType => new org.apache.avro.util.Utf8(row.getString(i))
                case LongType => java.lang.Long.valueOf(row.getLong(i))
                case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
                case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
                case FloatType => java.lang.Float.valueOf(row.getFloat(i))
                case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
                case TimestampType => java.lang.Long.valueOf(
                  row.getTimestamp(i).getTime)
                case _ => new org.apache.avro.util.Utf8(String.valueOf(row.get(i)))
              }
              rec.put(fields(i).name, v)
            }
            w.append(rec)
          }
          w.close()
        }
      } catch { case e: Throwable => // don't leak a partial staging dir
        fs0.delete(staging, true)
        throw e
      }
      // distributed write finished → swap the complete staging dir in
      if (fs0.exists(target)) fs0.delete(target, true)
      if (!fs0.rename(staging, target))
        throw new java.io.IOException(
          s"failed to commit avro staging dir $staging -> $target")
    }

    private def avroToStruct(s: Schema): StructType = {
      import scala.jdk.CollectionConverters._
      def dt(t: Schema): DataType = t.getType match {
        case Schema.Type.UNION =>
          dt(t.getTypes.asScala.find(_.getType != Schema.Type.NULL).get)
        case Schema.Type.STRING => StringType
        case Schema.Type.LONG => LongType
        case Schema.Type.INT => IntegerType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.BYTES => BinaryType
        case _ => StringType
      }
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name(), dt(f.schema()), nullable = true)))
    }

    private def recordToRow(r: GenericRecord, schema: Schema): Row = {
      import scala.jdk.CollectionConverters._
      val vals = schema.getFields.asScala.toSeq.map { f =>
        r.get(f.name()) match {
          case u: org.apache.avro.util.Utf8 => u.toString
          case b: java.nio.ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case other => other
        }
      }
      Row.fromSeq(vals)
    }
  }

  val all: Seq[Strategy] = Seq(Csv, Json, Parquet, Orc, Avro)
  def byName(n: String): Strategy =
    all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown format $n"))

  /** Magic-byte / extension sniffing (C3/C4). `head` = first bytes of the
    * file (parquet "PAR1"; avro "Obj"; ORC "ORC"). */
  def detect(path: String, head: Array[Byte]): Option[String] = {
    def startsWith(m: Array[Byte]) =
      head.length >= m.length && m.indices.forall(i => head(i) == m(i))
    if (startsWith("PAR1".getBytes)) Some("parquet")
    else if (startsWith(Array[Byte]('O', 'b', 'j', 1))) Some("avro")
    else if (startsWith("ORC".getBytes)) Some("orc")
    else {
      val ext = path.replaceAll("^.*\\.", "").toLowerCase
      Seq("csv", "json", "parquet", "orc", "avro").find(_ == ext)
    }
  }

  /** CDCDataConverter.convert equivalent: read in srcFmt, write dstFmt. */
  def convert(spark: SparkSession, srcPath: String, srcFmt: String,
      dstPath: String, dstFmt: String): DataFrame = {
    val df = byName(srcFmt).read(spark, srcPath)
    byName(dstFmt).write(df, dstPath)
    df
  }
}
