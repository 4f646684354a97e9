package graft

import graft.util.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingAndSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted aggregation is result-invariant across salt counts") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def run(n: Int) = Salting.saltedSum(li, Seq(col("l_returnflag")),
        col("l_orderkey"), col("l_quantity").cast("decimal(18,2)"),
        "s", nSalts = n)
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(run(1) == run(16) && run(16) == run(64))
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(run(16) == plain)
  }

  test("salt column spreads a skewed key across reducers") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val spread = li.withColumn("_salt", Salting.saltCol(col("l_orderkey"), 16))
      .groupBy("_salt").count().collect()
    assert(spread.length == 16) // all salt buckets populated
    val counts = spread.map(_.getLong(1))
    assert(counts.max < counts.sum / 4) // no bucket dominates
  }

  test("approx_count_distinct within 5% of exact on this data") {
    // tighter than the gate query's 10% verdict column: recompute the
    // raw HLL estimate here and hold it to the default-rsd 5% bound
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"flag=${r.getString(0)} exact=$exact approx=$approx")
    }
    // and the gate query's verdict column must be uniformly true
    val gate = Registry.queries("q16_approx_distinct")(spark, dir).collect()
    assert(gate.nonEmpty && gate.forall(_.getBoolean(2)))
  }
}
