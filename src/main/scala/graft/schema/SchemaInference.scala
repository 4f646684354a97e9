package graft.schema

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** Schema inference & extraction (SURVEY §1.2, §2.5 A5) — the Spark-native
  * form of the reference's JSON→Avro inference with its type-widening
  * lattice (`common/schema/SchemaHelper.java:80-161`: null < boolean <
  * int < long < float < double, string fallback; arrays vote on element
  * type `:591-606`; nested objects recurse `:515-524`; Avro emission
  * `:479-502,678-708`). Spark's own JSON inference already implements the
  * same lattice, so [[infer]] delegates to it; [[widen]]/[[merge]] expose
  * the lattice for incremental multi-batch schema evolution, and
  * [[toAvroSchema]] emits the Avro-style JSON the reference's `.avsc`
  * consumers expect.
  *
  * The reference's literal-detection regexes are buggy (malformed number
  * regex `SchemaHelper.java:267`); [[inferLiteral]] implements the
  * intended semantics instead of replicating the bug.
  */
object SchemaInference {

  /** Infer a schema across a dataset of JSON lines (distributed — the
    * inference itself is a Spark aggregation over all records). */
  def infer(spark: SparkSession, jsonLines: Dataset[String]): StructType =
    spark.read.json(jsonLines).schema

  /** The widening lattice for primitive types. */
  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, x) => x
    case (x, NullType) => x
    case (ShortType | IntegerType, LongType) => LongType
    case (LongType, ShortType | IntegerType) => LongType
    case (ShortType, IntegerType) => IntegerType
    case (IntegerType, ShortType) => IntegerType
    case (FloatType, DoubleType) => DoubleType
    case (DoubleType, FloatType) => DoubleType
    case (ShortType | IntegerType | LongType, FloatType | DoubleType) => DoubleType
    case (FloatType | DoubleType, ShortType | IntegerType | LongType) => DoubleType
    // boolean sits below the numerics in the reference lattice
    // (null < boolean < int < long < float < double): widen numerically
    case (BooleanType, t @ (ShortType | IntegerType | LongType |
                            FloatType | DoubleType)) => t
    case (t @ (ShortType | IntegerType | LongType |
               FloatType | DoubleType), BooleanType) => t
    case (s: StructType, t: StructType) => merge(s, t)
    case (ArrayType(x, n1), ArrayType(y, n2)) =>
      ArrayType(widen(x, y), n1 || n2)
    case (MapType(StringType, x, n1), MapType(StringType, y, n2)) =>
      MapType(StringType, widen(x, y), n1 || n2)
    case _ => StringType // incompatible → string fallback
  }

  /** Merge two record schemas field-by-field; fields present on one side
    * only become nullable. */
  def merge(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) =>
          StructField(fa.name, widen(fa.dataType, fb.dataType),
            fa.nullable || fb.nullable)
        case None => fa.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    val extra = b.fields.filterNot(f => aNames(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ extra)
  }

  /** Type of a string literal under the reference's intended rules:
    * null/empty → null, yes/no/true/false → boolean, integral → long,
    * decimal → double, else string. */
  def inferLiteral(s: String): DataType = {
    if (s == null) return NullType
    val t = s.trim
    if (t.isEmpty || t.equalsIgnoreCase("null")) NullType
    else if (t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false") ||
      t.equalsIgnoreCase("yes") || t.equalsIgnoreCase("no")) BooleanType
    else if (t.matches("[+-]?\\d+")) LongType
    else if (t.matches("[+-]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][+-]?\\d+)?"))
      DoubleType
    else StringType
  }

  /** Emit an Avro-style schema JSON for a StructType (nullable fields as
    * `["null", T]` unions, records named by path). */
  def toAvroSchema(schema: StructType, name: String = "record0",
      namespace: String = "graft"): String = {
    def quote(s: String) = "\"" + s + "\""
    def prim(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case ShortType | IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case BinaryType => "\"bytes\""
      case NullType => "\"null\""
      case TimestampType | DateType => "\"long\"" // epoch millis convention
      case _ => "\"string\""
    }
    def typeOf(dt: DataType, path: String): String = dt match {
      case s: StructType => record(s, path)
      case ArrayType(e, _) =>
        s"""{"type":"array","items":${typeOf(e, path + "_item")}}"""
      case MapType(_, v, _) =>
        s"""{"type":"map","values":${typeOf(v, path + "_value")}}"""
      case other => prim(other)
    }
    def field(f: StructField, path: String): String = {
      val t = typeOf(f.dataType, path + "_" + f.name)
      val tt = if (f.nullable) s"""["null",$t]""" else t
      s"""{"name":${quote(f.name)},"type":$tt}"""
    }
    def record(s: StructType, recName: String): String =
      s"""{"type":"record","name":${quote(recName)},"namespace":${quote(namespace)},"fields":[${s.fields.map(f => field(f, recName)).mkString(",")}]}"""
    record(schema, name)
  }
}
