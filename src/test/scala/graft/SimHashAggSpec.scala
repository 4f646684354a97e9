package graft

import graft.functions.SimHashVotes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native SimHashVotes aggregate: equivalence with the nBits-SUM
  * formulation it replaced, partial/final planning (merge path), and
  * buffer round-trip. */
class SimHashAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def masks(n: Int, seed: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i % 7).toLong -> (scala.util.hashing.MurmurHash3
        .productHash((seed, i)).toLong & 0xffffffffL)
    }.toDF("g", "mask")
  }

  private def sumFormulation(df: org.apache.spark.sql.DataFrame, nBits: Int) = {
    val bitAggs = (0 until nBits).map(j =>
      sum(when(shiftright(col("mask"), j).bitwiseAND(lit(1L)) === 1L,
        1).otherwise(-1)).as(s"b$j"))
    val fp = (0 until nBits)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    df.groupBy(col("g")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("g"), fp.as("simhash"))
  }

  test("matches the per-bit SUM formulation (16 and 32 bits)") {
    for ((nBits, seed) <- Seq((16, 1), (32, 2), (7, 3))) {
      val df = masks(5000, seed)
      val got = df.groupBy(col("g"))
        .agg(SimHashVotes.simhash(col("mask"), nBits).as("simhash"))
        .orderBy(col("g")).collect().toSeq
      val want = sumFormulation(df, nBits)
        .orderBy(col("g")).collect().toSeq
      assert(got == want, s"nBits=$nBits")
    }
  }

  test("partial aggregation is planned (merge path is exercised)") {
    // repartition forces multiple partitions per group, so the final
    // agg must merge serialized partial buffers
    val df = masks(5000, 4).repartition(8)
    val q = df.groupBy(col("g"))
      .agg(SimHashVotes.simhash(col("mask"), 32).as("simhash"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_simhashvotes") ||
      plan.toLowerCase.contains("partial"), plan)
    assert(q.orderBy(col("g")).collect().toSeq ==
      sumFormulation(df, 32).orderBy(col("g")).collect().toSeq)
  }

  test("null masks are ignored, all-null group votes all-negative") {
    import spark.implicits._
    val df = Seq[(Long, Option[Long])](
      (0L, Some(5L)), (0L, None), (1L, None))
      .toDF("g", "mask")
    val got = df.groupBy(col("g"))
      .agg(SimHashVotes.simhash(col("mask"), 4).as("simhash"))
      .orderBy(col("g")).collect().map(r => (r.getLong(0), r.getLong(1)))
    // group 0: single vote 0b0101 wins each set bit; group 1: no votes
    assert(got.toSeq == Seq((0L, 5L), (1L, 0L)))
  }
}
