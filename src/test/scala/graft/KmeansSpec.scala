package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third formulation of the q69 trainer: plain-Scala Lloyd on the same
  * 2^-20 grid must reproduce the Spark result exactly (the DuckDB
  * oracle is the second). Also sanity-checks that two iterations
  * actually improved on the init assignment. */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = 8
  private val Q = 1048576L

  private def quantized(): Map[Long, Array[Long]] =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map { r =>
        val xq = r.getSeq[Float](1)
          .map(f => math.floor(f.toDouble * Q + 0.5).toLong).toArray
        r.getLong(0) -> xq
      }.toMap

  private def dist(x: Array[Double], c: Array[Double]): Double = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    dot(x, x) - 2.0 * dot(x, c) + dot(c, c)
  }

  /** One Lloyd pass: assignment under the given centroids. */
  private def assign(xs: Map[Long, Array[Double]],
      cents: Map[Long, Array[Double]]): Map[Long, Long] =
    xs.map { case (id, x) =>
      id -> cents.toSeq
        .map { case (cell, c) => (dist(x, c), cell) }
        .minBy(identity) // (dist, cell) — ties break to the lower cell
        ._2
    }

  test("Spark Lloyd == plain-Scala Lloyd on the same grid") {
    val xq = quantized()
    val xs = xq.map { case (id, q) => id -> q.map(_.toDouble / Q) }
    var cents = xs.filter(_._1 < K).map { case (id, x) => id -> x }
    var members: Map[Long, Long] = null
    for (t <- 1 to 2) {
      members = assign(xs, cents)
      if (t < 2) {
        cents = members.groupBy(_._2).map { case (cell, m) =>
          val ids = m.keys.toSeq
          val dim = xq(ids.head).length
          val c = Array.tabulate(dim) { d =>
            val sq = ids.map(xq(_)(d)).sum
            math.floor(sq.toDouble / ids.size + 0.5) / Q
          }
          cell -> c
        }
      }
    }
    val want = members.groupBy(_._2).map { case (cell, m) =>
      cell -> (m.size.toLong, m.keys.sum)
    }
    val got = Registry.queries("q69_kmeans_lloyd")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("the refined centroids beat the init assignment (cost decreases)") {
    val xq = quantized()
    val xs = xq.map { case (id, q) => id -> q.map(_.toDouble / Q) }
    val init = xs.filter(_._1 < K)
    def cost(cents: Map[Long, Array[Double]]): Double =
      xs.values.map(x => cents.values.map(c => dist(x, c)).min).sum
    val m1 = assign(xs, init)
    val refined = m1.groupBy(_._2).map { case (cell, m) =>
      val ids = m.keys.toSeq
      cell -> Array.tabulate(xq(ids.head).length) { d =>
        math.floor(ids.map(xq(_)(d)).sum.toDouble / ids.size + 0.5) / Q
      }
    }
    assert(cost(refined) < cost(init))
  }
}
