package graft

import org.scalatest.funsuite.AnyFunSuite

/** Referee for wave 49: equi-depth histogram + MCV against a
  * hand-computed replica, including a heavy value that spans several
  * buckets (the rank-interval slicing case). */
class Wave49Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q295 equals the hand histogram; heavy values slice across buckets") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_w49a_").toString
    val rng = new scala.util.Random(43)
    // l_suppkey: value 7 occurs 400x (spans many of the 16 cuts of
    // 1024 rows); the rest uniform in 100..199
    val sups = Seq.fill(400)(7L) ++
      (0 until 624).map(_ => rng.nextInt(100).toLong + 100L)
    val rows = sups.zipWithIndex.map { case (sk, i) =>
      (i.toLong, 1.0 + (i % 50), 100.0 + (i % 900), sk)
    }
    rows.toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_suppkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    def histogram(vs: Seq[Long]): Seq[(Long, Long, Long, Long)] = {
      val n = vs.size.toLong
      val byVal = vs.groupBy(identity).toSeq
        .map { case (v, xs) => (v, xs.size.toLong) }.sortBy(_._1)
      val cums = byVal.scanLeft(0L)(_ + _._2).tail
      (0 until 16).map { b =>
        val blo = b * n / 16; val bhi = (b + 1) * n / 16
        val in = byVal.zip(cums).filter { case ((_, cnt), cum) =>
          cum > blo && cum - cnt < bhi
        }
        val rowsIn = in.map { case ((_, cnt), cum) =>
          math.min(cum, bhi) - math.max(cum - cnt, blo)
        }.sum
        (b.toLong, in.head._1._1, in.last._1._1, rowsIn)
      }
    }
    def mcv(vs: Seq[Long]): Seq[(Long, Long, Long)] =
      vs.groupBy(identity).toSeq
        .map { case (v, xs) => (v, xs.size.toLong) }
        .sortBy { case (v, c) => (-c, v) }.take(4).zipWithIndex
        .map { case ((v, c), i) => (i.toLong, v, c) }

    val cols = Map(
      "l_quantity" -> rows.map(r => math.floor(r._2 * 100.0 + 0.5).toLong),
      "l_extendedprice" -> rows.map(r => math.floor(r._3 * 100.0 + 0.5).toLong),
      "l_suppkey" -> rows.map(_._4))
    val got = Registry.queries("q295_column_stats")(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("idx"), r.getAs[Long]("lo"), r.getAs[Long]("hi"),
        r.getAs[Long]("n_rows")))
    for ((c, vs) <- cols) {
      val h = got.filter(t => t._1 == c && t._2 == "hist")
        .sortBy(_._3).map(t => (t._3, t._4, t._5, t._6)).toSeq
      assert(h == histogram(vs), s"hist mismatch for $c")
      val m = got.filter(t => t._1 == c && t._2 == "mcv")
        .sortBy(_._3).map(t => (t._3, t._4, t._6)).toSeq
      assert(m == mcv(vs), s"mcv mismatch for $c")
    }
    // bucket counts partition the rows exactly
    for ((c, vs) <- cols)
      assert(got.filter(t => t._1 == c && t._2 == "hist").map(_._6).sum
        == vs.size.toLong)
  }
}
