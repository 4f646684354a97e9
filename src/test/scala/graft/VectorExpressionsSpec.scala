package graft

import graft.functions.vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("codegen dot product matches interpreted fold exactly") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val got = df.select(
      vec.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("slow"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(got(0).getDouble(0) == 32.0)
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(vec.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("graft_dot callable from SQL after registration") {
    graft.functions.vec.register(spark)
    val v = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }

  test("type mismatch is rejected at analysis") {
    import spark.implicits._
    val df = Seq((Seq(1), Seq(2.0))).toDF("a", "b")
    val e = intercept[Exception](df.select(vec.dot(col("a"), col("b"))).collect())
    assert(e.getMessage.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
