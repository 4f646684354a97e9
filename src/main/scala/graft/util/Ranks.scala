package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL RANK under a unique total order — the scale-safe
  * replacement for `row_number()/ntile(k)` over `Window.orderBy(...)`
  * with no partition clause, which Spark executes as a SINGLE-TASK sort
  * of the entire input (`WindowExec: No Partition Defined` — one task
  * sorts the whole table, the classic 100×-scale killer).
  *
  * Device: range-repartition on the sort key (a parallel distributed
  * sort), pin so partition identity is stable across the two reads
  * below, count rows per range partition (a table bounded by the
  * partition count), turn those counts into broadcast offsets, and add
  * each row's within-partition `row_number` to its partition's offset.
  *
  * Exactness: range partitioning guarantees every row of partition i
  * sorts before every row of partition i+1 under the given key, and the
  * within-partition window orders exactly — so the sum is the exact
  * global rank PROVIDED the sort key is unique per row (callers append
  * a tie-break column, e.g. the entity id). The pin matters for
  * correctness, not just speed: `repartitionByRange` samples its
  * boundaries, so two independent evaluations could land rows in
  * different partitions and mis-align the offsets.
  *
  * Cost: one range shuffle + one pin + one #partitions-row aggregate +
  * one broadcast join — versus the single-task global sort it replaces.
  * Parallelism equals `spark.sql.shuffle.partitions`.
  */
object Ranks {

  def globalRank(df: DataFrame, rankName: String,
      sortCols: Column*): DataFrame = {
    val parts = df.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
    val ranged = Pin(df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_gr_pid", spark_partition_id()))
    // Offsets table: one row per range partition — bounded by the
    // partition count, so both its cumulative window and the broadcast
    // are constant-size at any data scale.
    val offsets = ranged.groupBy(col("_gr_pid"))
      .agg(count(lit(1)).as("_gr_n"))
      .withColumn("_gr_off", coalesce(
        sum(col("_gr_n")).over(Window.orderBy(col("_gr_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_gr_pid"), col("_gr_off"))
    ranged
      .join(broadcast(offsets), Seq("_gr_pid"))
      .withColumn(rankName,
        row_number().over(
          Window.partitionBy(col("_gr_pid")).orderBy(sortCols: _*))
          .cast("long") + col("_gr_off"))
      .drop("_gr_pid", "_gr_off")
  }

  /** Distributed PREFIX SUM under a total order within each group —
    * the scale-safe replacement for `sum(v).over(Window.partitionBy(g)
    * .orderBy(t))` when a group's row count grows with the data (a
    * low-cardinality group column funnels the whole group through one
    * window task; with no group column at all the whole TABLE does).
    * Same device as [[globalRank]], generalized: range-repartition on
    * (group, sort) keys, pin, aggregate per-(partition, group) sums
    * (bounded by partitions + group-runs), turn them into broadcast
    * per-group offsets, add each row's within-partition running sum to
    * its offset. Exact when the sort key is unique per row within its
    * group (pre-aggregate ties first — that also shrinks the shuffle).
    * Empty `partCols` gives a global running sum. */
  def prefixSum(df: DataFrame, partCols: Seq[String],
      sortCols: Seq[Column], value: Column, outName: String): DataFrame = {
    val parts = df.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
    val rangeKeys = partCols.map(col) ++ sortCols
    val ranged = Pin(df.repartitionByRange(parts, rangeKeys: _*)
      .withColumn("_ps_pid", spark_partition_id())
      .withColumn("_ps_v", value))
    val offsets = ranged
      .groupBy((col("_ps_pid") +: partCols.map(col)): _*)
      .agg(sum(col("_ps_v")).as("_ps_sum"))
      .withColumn("_ps_off", coalesce(
        sum(col("_ps_sum")).over(Window.partitionBy(partCols.map(col): _*)
          .orderBy(col("_ps_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((col("_ps_pid") +: partCols.map(col) :+ col("_ps_off")): _*)
    ranged
      .join(broadcast(offsets), "_ps_pid" +: partCols)
      .withColumn(outName,
        sum(col("_ps_v")).over(
          Window.partitionBy((col("_ps_pid") +: partCols.map(col)): _*)
            .orderBy(sortCols: _*)
            .rowsBetween(Window.unboundedPreceding, 0)) + col("_ps_off"))
      .drop("_ps_pid", "_ps_v", "_ps_off")
  }

  /** Distributed RUNNING MAX — [[prefixSum]]'s device with max as the
    * combiner: per-(partition, group) maxima (bounded table) become
    * broadcast per-group "best of all earlier partitions" offsets, and
    * each row takes `greatest(local running max, offset)`. Value must
    * be LongType (the null-free identity is Long.MinValue). Exact
    * under the same unique-sort-key-within-group contract. */
  def prefixMax(df: DataFrame, partCols: Seq[String],
      sortCols: Seq[Column], value: Column, outName: String): DataFrame = {
    val parts = df.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
    val rangeKeys = partCols.map(col) ++ sortCols
    val ranged = Pin(df.repartitionByRange(parts, rangeKeys: _*)
      .withColumn("_pm_pid", spark_partition_id())
      .withColumn("_pm_v", value))
    val offsets = ranged
      .groupBy((col("_pm_pid") +: partCols.map(col)): _*)
      .agg(max(col("_pm_v")).as("_pm_max"))
      .withColumn("_pm_off", coalesce(
        max(col("_pm_max")).over(Window.partitionBy(partCols.map(col): _*)
          .orderBy(col("_pm_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(Long.MinValue)))
      .select((col("_pm_pid") +: partCols.map(col) :+ col("_pm_off")): _*)
    ranged
      .join(broadcast(offsets), "_pm_pid" +: partCols)
      .withColumn(outName, greatest(
        max(col("_pm_v")).over(
          Window.partitionBy((col("_pm_pid") +: partCols.map(col)): _*)
            .orderBy(sortCols: _*)
            .rowsBetween(Window.unboundedPreceding, 0)),
        col("_pm_off")))
      .drop("_pm_pid", "_pm_v", "_pm_off")
  }

  /** Exact `ntile(k)` bucket from a 1-based global rank column and a
    * total-count column (SQL ntile semantics: the first `n % k` buckets
    * hold `n div k + 1` rows, the rest `n div k`). Pair with
    * [[globalRank]] for a scale-safe global ntile. The `greatest(..,1)`
    * keeps the unreached else-branch safe under ANSI when n < k. */
  def ntileFromRank(rank: String, total: String, k: Int): Column = expr(
    s"""CASE WHEN $rank <= ($total % $k) * ($total div $k + 1)
       |  THEN ($rank - 1) div ($total div $k + 1) + 1
       |  ELSE ($total % $k)
       |    + ($rank - 1 - ($total % $k) * ($total div $k + 1))
       |      div greatest($total div $k, 1) + 1
       |END""".stripMargin)
}
