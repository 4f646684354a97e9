package graft

import graft.schema.SchemaInference
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaInferenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nested JSON doc inference (donut fixture shape)") {
    import spark.implicits._
    val doc =
      """{"id":"0001","type":"donut","name":"Cake","ppu":0.55,
        |"batters":{"batter":[{"id":"1001","type":"Regular"}]},
        |"topping":[{"id":"5001","type":"None"}]}""".stripMargin.replace("\n", "")
    val schema = SchemaInference.infer(spark, Seq(doc).toDS())
    assert(schema("ppu").dataType == DoubleType)
    assert(schema("batters").dataType.isInstanceOf[StructType])
    val batter = schema("batters").dataType.asInstanceOf[StructType]("batter")
    assert(batter.dataType.isInstanceOf[ArrayType])
    assert(schema("topping").dataType.asInstanceOf[ArrayType]
      .elementType.isInstanceOf[StructType])
  }

  test("type widening lattice") {
    import SchemaInference.widen
    assert(widen(IntegerType, LongType) == LongType)
    assert(widen(LongType, DoubleType) == DoubleType)
    assert(widen(FloatType, DoubleType) == DoubleType)
    assert(widen(NullType, BooleanType) == BooleanType)
    assert(widen(BooleanType, LongType) == LongType) // bool < numerics in lattice
    assert(widen(DoubleType, BooleanType) == DoubleType)
    assert(widen(BooleanType, StringType) == StringType)
    assert(widen(ArrayType(IntegerType), ArrayType(DoubleType)) ==
      ArrayType(DoubleType))
  }

  test("merge: one-sided fields become nullable; shared fields widen") {
    val a = StructType(Seq(StructField("x", IntegerType, nullable = false),
      StructField("only_a", StringType, nullable = false)))
    val b = StructType(Seq(StructField("x", DoubleType, nullable = false),
      StructField("only_b", LongType, nullable = false)))
    val m = SchemaInference.merge(a, b)
    assert(m("x").dataType == DoubleType && !m("x").nullable)
    assert(m("only_a").nullable && m("only_b").nullable)
  }

  test("multi-batch inference: infer each batch then merge == infer all") {
    import spark.implicits._
    val b1 = Seq("""{"a":1,"b":"x"}""", """{"a":2}""")
    val b2 = Seq("""{"a":1.5,"c":true}""")
    val merged = SchemaInference.merge(
      SchemaInference.infer(spark, b1.toDS()),
      SchemaInference.infer(spark, b2.toDS()))
    val whole = SchemaInference.infer(spark, (b1 ++ b2).toDS())
    assert(merged.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq ==
      whole.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq)
  }

  test("literal type detection (intended reference semantics incl yes/no bool)") {
    import SchemaInference.inferLiteral
    assert(inferLiteral(null) == NullType)
    assert(inferLiteral("") == NullType)
    assert(inferLiteral("yes") == BooleanType)
    assert(inferLiteral("FALSE") == BooleanType)
    assert(inferLiteral("42") == LongType)
    assert(inferLiteral("-7") == LongType)
    assert(inferLiteral("3.14") == DoubleType)
    assert(inferLiteral("1e10") == DoubleType)
    assert(inferLiteral("abc") == StringType)
  }

  test("avro schema emission: nullable unions, nested records, arrays") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("tags", ArrayType(StringType), nullable = true),
      StructField("contact", StructType(Seq(
        StructField("email", StringType, nullable = true))), nullable = true)))
    val json = SchemaInference.toAvroSchema(st, "profile")
    // must be valid per the bundled Avro parser
    val parsed = new org.apache.avro.Schema.Parser().parse(json)
    assert(parsed.getName == "profile")
    assert(parsed.getField("id").schema().getType ==
      org.apache.avro.Schema.Type.LONG)
    assert(parsed.getField("name").schema().getType ==
      org.apache.avro.Schema.Type.UNION)
  }
}
