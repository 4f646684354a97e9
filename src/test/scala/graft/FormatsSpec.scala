package graft

import graft.convert.Formats
import org.scalatest.funsuite.AnyFunSuite

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir = java.nio.file.Files
    .createTempDirectory("graft_fmt_").toString

  test("csv/json/parquet/orc/avro round-trips preserve data") {
    import spark.implicits._
    val df = Seq((1L, "alpha", 1.5, true), (2L, "beta", -0.25, false))
      .toDF("id", "name", "score", "flag")
    for (fmt <- Seq("csv", "json", "parquet", "orc", "avro")) {
      val dir = tmpDir + "/" + fmt
      Formats.byName(fmt).write(df, dir)
      val back = Formats.byName(fmt).read(spark, dir)
        .selectExpr("CAST(id AS BIGINT) AS id", "name",
          "CAST(score AS DOUBLE) AS score", "CAST(flag AS BOOLEAN) AS flag")
        .orderBy("id")
        .collect().map(_.toSeq).toSeq
      assert(back == df.orderBy("id").collect().map(_.toSeq).toSeq,
        s"round-trip mismatch for $fmt")
    }
  }

  test("avro overwrite clears stale part files from a wider previous write") {
    import spark.implicits._
    val dir = tmpDir + "/avro_overwrite"
    val wide = (1L to 8L).map(i => (i, s"row$i")).toDF("id", "name")
      .repartition(4)
    Formats.byName("avro").write(wide, dir)
    val narrow = Seq((100L, "only")).toDF("id", "name").repartition(1)
    Formats.byName("avro").write(narrow, dir)
    val back = Formats.byName("avro").read(spark, dir).collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(100L),
      "second write must not read back stale part files from the first")
  }

  test("convert: parquet table → avro → read back (CDC delta conversion path)") {
    val dir = tmpDir
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag").limit(100)
    li.write.parquet(s"$dir/src")
    val out = Formats.convert(spark, s"$dir/src", "parquet", s"$dir/dst", "avro")
    val back = Formats.Avro.read(spark, s"$dir/dst")
    assert(back.count() == 100)
    assert(back.schema.fieldNames.sorted.toSeq ==
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
  }

  test("magic-byte and extension detection") {
    assert(Formats.detect("x.bin", "PAR1zzzz".getBytes).contains("parquet"))
    assert(Formats.detect("x.bin", Array[Byte]('O', 'b', 'j', 1, 9))
      .contains("avro"))
    assert(Formats.detect("x.bin", "ORCxxx".getBytes).contains("orc"))
    assert(Formats.detect("data.csv", "a,b,c".getBytes).contains("csv"))
    assert(Formats.detect("data.weird", "zzzz".getBytes).isEmpty)
  }

  test("supportsPartial flags match reference semantics") {
    assert(Formats.Avro.supportsPartial && Formats.Json.supportsPartial)
    assert(!Formats.Parquet.supportsPartial && !Formats.Orc.supportsPartial)
  }
}
