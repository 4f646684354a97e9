package graft

import graft.functions.Morton
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The N-dim interleave authority behind `writeClusteredLayout` (N>2)
  * and the q316 oracle gate: the Column form and the dialect-neutral
  * SQL form must agree bit-for-bit, the key must be a bijection on its
  * grid, and high-bit truncation must confine each dim to its octree
  * box — the property zone-map pruning buys skipping from. */
class MortonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("3-D key: Column form == div/mod SQL form, bijective, box-confining") {
    import spark.implicits._
    val bits = 4 // full 16x16x16 grid = 4096 points
    val grid = for (x <- 0L until 16L; y <- 0L until 16L; z <- 0L until 16L)
      yield (x, y, z)
    val df = grid.toDF("x", "y", "z")
      .withColumn("k_col", Morton.key(Seq(col("x"), col("y"), col("z")), bits))
      .withColumn("k_sql", expr(
        // Spark's `div`/`%` match DuckDB `//`/`%` on non-negatives
        Morton.sql(Seq("x", "y", "z"), bits).replace("//", "div")))
    val rows = df.collect() // bounded collect: the 4096-point test grid
    assert(rows.forall(r => r.getLong(3) == r.getLong(4)),
      "shift form and div/mod form disagree")
    val keys = rows.map(_.getLong(3))
    assert(keys.distinct.length == grid.length, "key is not injective")
    assert(keys.min == 0L && keys.max == (1L << (3 * bits)) - 1,
      "key range is not exactly [0, 8^bits)")
    // octree-cell confinement: dropping the low 3 bits (1 bit/dim)
    // must confine every dim to a 2-wide box within each cell
    val byCell = rows.groupBy(_.getLong(3) >> 3)
    assert(byCell.values.forall { cell =>
      Seq(0, 1, 2).forall { i =>
        val vs = cell.map(_.getLong(i))
        vs.max - vs.min <= 1L
      }
    }, "a cell spans more than its box in some dim")
  }

  test("guard: dims x bits beyond 63 bits is rejected") {
    intercept[IllegalArgumentException] {
      Morton.key(Seq(lit(0L), lit(0L), lit(0L), lit(0L)), 16)
    }
  }
}
