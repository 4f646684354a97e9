package graft

import graft.functions.bloom
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[graft.functions.BloomMightContain]] expression: probe
  * hashing matches build hashing (zero false negatives by contract),
  * false-positive rate honors the configured fpp, codegen and
  * interpreted eval agree, and the distributed treeAggregate build
  * equals a driver-side sequential build (commutative OR). */
class BloomExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("no false negatives; fpp bound holds; null propagates") {
    import spark.implicits._
    val members = (0 until 2000).map(i => s"member_$i")
    val filter = bloom.buildString(members.toDS(), members.size.toLong, 0.01)
    // every member answers true (hard guarantee)
    val memberHits = members.toDF("s")
      .filter(bloom.mightContain(col("s"), filter)).count()
    assert(memberHits == members.size.toLong)
    // non-members answer true at ~fpp — allow 3x slack on 10k probes
    val probes = (0 until 10000).map(i => s"stranger_$i")
    val fp = probes.toDF("s")
      .filter(bloom.mightContain(col("s"), filter)).count()
    assert(fp <= 300L, s"false-positive rate ${fp / 10000.0} way over fpp=0.01")
    // null in → null out (nullIntolerant)
    val nulls = Seq[String](null).toDF("s")
      .select(bloom.mightContain(col("s"), filter).as("m")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("codegen and interpreted eval agree on the same rows") {
    import spark.implicits._
    val filter = bloom.buildString(Seq("alpha", "beta").toDS(), 2L, 0.03)
    val df = Seq("alpha", "beta", "gamma", "delta").toDF("s")
      .select(col("s"), bloom.mightContain(col("s"), filter).as("m"))
    val viaCodegen = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // force the interpreted path through the expression's eval
    val expr = graft.functions.BloomMightContain(
      org.apache.spark.sql.GraftBridge.eagerExpression(col("s")), {
        val bos = new java.io.ByteArrayOutputStream()
        filter.writeTo(bos); bos.toByteArray
      })
    for (s <- Seq("alpha", "beta", "gamma", "delta")) {
      val interpreted = expr.nullSafeEval(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(interpreted == viaCodegen(s), s"eval/codegen disagree on $s")
    }
    assert(viaCodegen("alpha") && viaCodegen("beta"), "members must hit")
  }

  test("distributed treeAggregate build == sequential driver build") {
    import spark.implicits._
    val items = (0 until 5000).map(i => s"it_$i")
    val distributed = bloom.buildString(
      items.toDS().repartition(8), items.size.toLong, 0.02)
    val sequential = BloomFilter.create(items.size.toLong, 0.02)
    items.foreach(sequential.putString)
    // same bit array → identical serialized form (commutative OR)
    def bytes(f: BloomFilter) = {
      val b = new java.io.ByteArrayOutputStream(); f.writeTo(b); b.toByteArray
    }
    assert(java.util.Arrays.equals(bytes(distributed), bytes(sequential)))
  }
}
