package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force twins for wave 35: the one-pass profiler (including
  * the null path the TPC-H-shaped data never exercises) and the audio
  * decimation round-trip. */
class Wave35Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q263 profile equals hand stats, including nulls and the sketch path") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w35a_").toString
    // 600 rows: partkey cycles 0..299 (> k=256 so the estimator arm
    // with theta actually runs), suppkey has nulls every 5th row
    val rows = (0 until 600).map { i =>
      (i % 300L,
        if (i % 5 == 0) None else Some(i % 7L),
        (i % 50 + 1).toDouble,
        if (i % 2 == 0) "R" else "N",
        java.sql.Date.valueOf("1995-01-01"))
    }
    rows.toDF("l_partkey", "l_suppkey", "l_quantity", "l_returnflag",
        "l_shipdate")
      .coalesce(2).write.mode("overwrite")
      .parquet(s"$tmp/lineitem.parquet")
    val got = Registry.queries("q263_table_profile")(spark, tmp)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("l_partkey", "l_suppkey", "l_quantity",
      "l_returnflag", "l_shipdate"))
    for ((name, r) <- got) assert(r.getAs[Long]("n_rows") == 600L, name)
    assert(got("l_suppkey").getAs[Long]("n_null") == 120L)
    assert(got("l_partkey").getAs[Long]("n_null") == 0L)
    assert(got("l_partkey").getAs[Long]("ndv_exact") == 300L)
    assert(got("l_suppkey").getAs[Long]("ndv_exact") == 7L)
    assert(got("l_quantity").getAs[Long]("ndv_exact") == 50L)
    assert(got("l_returnflag").getAs[Long]("ndv_exact") == 2L)
    assert(got("l_shipdate").getAs[Long]("ndv_exact") == 1L)
    // below k: estimate == exact; above k (partkey, 300 > 256): the
    // estimator must be within 25% of truth for this hash family
    assert(got("l_suppkey").getAs[Long]("ndv_est") == 7L)
    val est = got("l_partkey").getAs[Long]("ndv_est")
    assert(est > 225 && est < 375, s"kmv estimate off: $est vs 300")
    assert(got("l_returnflag").getAs[String]("min_s") == "N")
    assert(got("l_returnflag").getAs[String]("max_s") == "R")
    assert(got("l_shipdate").getAs[String]("min_s") == "1995-01-01")
  }

  test("q263 plans the sketch as partial+final ObjectHashAggregate") {
    val plan = Registry.queries("q263_table_profile")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"mergeable-sketch shuffle contract broken:\n$plan")
  }

  test("resampleAudio decimates bit-exactly and passes through non-audio") {
    import spark.implicits._
    def samp(i: Int): Int = (((5L * 13 + i.toLong * 37) % 65536) - 32768).toInt
    val wav = Multimodal.encodeWav(12000, 100, samp)
    val garbage = Array[Byte](1, 2, 3, 4, 5)
    val out = Multimodal.resampleAudio(
      Seq((1L, wav), (2L, garbage)).toDF("id", "content"), 3)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("resampled"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(2L).toSeq == garbage.toSeq, "non-audio must pass through")
    val (rate, n, ps) = Multimodal.audioProbe(out(1L),
      (_, n) => 0 until n).get
    assert(rate == 4000 && n == 34) // ceil(100/3)
    for (j <- 0 until n)
      assert(ps(j) == samp(3 * j), s"kept sample $j != original ${3 * j}")
  }
}
