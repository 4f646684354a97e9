package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe point-in-interval (range) join. Spark has no native range
  * join optimization: `points JOIN intervals ON p BETWEEN lo AND hi` is
  * a broadcast-nested-loop or cartesian — O(|points|·|intervals|)
  * comparisons, a scale-killer for two large sides.
  *
  * The bucketed form makes it an EQUI join: pick a bucket width `w`,
  * explode each interval to the buckets it spans (⌊lo/w⌋..⌊hi/w⌋), map
  * each point to its single bucket ⌊p/w⌋, hash-join on the bucket id,
  * then apply the exact BETWEEN as a residual filter. Cost:
  * one shuffle keyed on bucket, |intervals|·(span/w + 1) exploded rows
  * plus |points| — linear in both inputs when `w` is chosen near the
  * typical interval span. Result set is IDENTICAL to the theta join
  * (the residual filter removes same-bucket non-overlaps; an interval
  * meets every point it contains in exactly the point's bucket, so
  * there are no duplicates and no misses).
  */
object RangeJoin {

  /** Join `points` to `intervals` where `points(pointCol)` lies in
    * `[intervals(loCol), intervals(hiCol)]` (inclusive). All three
    * columns must be integral. Output: all point columns + all interval
    * columns. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val binned = intervals
      // an inverted interval matches nothing in the theta join; without
      // this guard Spark's sequence() would DESCEND from lo to hi —
      // junk rows at best, an array-size explosion for a large inversion
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bucket",
        explode(sequence(floor(col(loCol) / w).cast("long"),
          floor(col(hiCol) / w).cast("long"))))
    points
      .withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
      .join(binned, "__bucket")
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
