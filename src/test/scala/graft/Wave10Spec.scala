package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for q200 entity resolution: a full driver-side
  * brute force over the tiny customer table (canonicalization and
  * blocking algebra included) plus the analytic properties the
  * construction guarantees. */
class Wave10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q200: matches a brute-force linkage; misses are exactly the %7 injections") {
    val out = Registry.queries("q200_entity_resolution")(spark, dir).collect()
      .map(r => r.getAs[Long]("nation") ->
        (r.getAs[Long]("n_dirty"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("n_links"), r.getAs[Long]("precision_ppm"),
          r.getAs[Long]("recall_ppm"))).toMap
    case class Rec(key: Long, nm: String, nat: Long, seg: String, cents: Long)
    val cs = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")).collect()
      .map(r => Rec(r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val canon = cs.groupBy(r => (r.nm, r.nat, r.seg, r.cents))
      .map { case (t, g) => Rec(g.map(_.key).min, t._1, t._2, t._3, t._4) }
      .toSeq
    val expected = cs.map(c => c.key ->
      canon.find(k => (k.nm, k.nat, k.seg, k.cents) ==
        ((c.nm, c.nat, c.seg, c.cents))).get.key).toMap
    val dirty = cs.map(r => Rec(r.key, r.nm.toUpperCase,
      if (r.key % 7 == 0) (r.nat + 1) % 25 else r.nat, r.seg,
      r.cents + r.key % 5 - 2))
    def keys(r: Rec) = Seq(
      (r.nat, r.seg, 0L, r.cents / 1000),
      (r.nat, r.seg, 1L, (r.cents + 500) / 1000))
    val byBlock = dirty.toSeq.flatMap(d => keys(d).map(_ -> d)).groupBy(_._1)
    val cand = (for {
      a <- canon; k <- keys(a)
      b <- byBlock.getOrElse(k, Nil).map(_._2)
    } yield (a, b)).distinct
    for ((nat, truth) <- cs.groupBy(_.nat)) {
      val cNat = cand.filter(_._1.nat == nat)
      val links = cNat.filter { case (a, b) =>
        a.nm.toLowerCase == b.nm.toLowerCase && (a.cents - b.cents).abs <= 2 }
      val trueLinks = links.count { case (a, b) => a.key == expected(b.key) }
      assert(links.forall { case (a, b) => a.key == expected(b.key) },
        "a link can only land on the dirty record's own canonical rep")
      val o = out(nat)
      assert(o == ((truth.length.toLong, cNat.length.toLong,
        links.length.toLong,
        if (links.isEmpty) 0L else 1000000L,
        trueLinks * 1000000L / truth.length)), s"mismatch for nation $nat")
      // the only unreachable truth pairs are the wrong-nation injections
      assert(trueLinks == truth.count(_.key % 7 != 0),
        "recall shortfall must be exactly the %7 nation-shifted records")
    }
  }
}
