package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Narrow accessor for `private[sql]` session internals.
  *
  * Single use: [[graft.util.Pin]] rebuilds a just-checkpointed frame as
  * a FRESH `LogicalRDD` (default leaf statistics) when the inherited
  * size-in-bytes estimate has gone pathological. `localCheckpoint`
  * deliberately preserves the child plan's statistics; inside an
  * iterative self-join loop those estimates MULTIPLY each round
  * (Catalyst's `SizeInBytesOnlyStatsPlanVisitor.visitJoin` is a BigInt
  * product), so the estimate's digit count doubles per iteration and by
  * round ~20 the driver spends its time in BigInteger.multiply on
  * multi-million-digit numbers (measured: 40 s/round on an 11k-row
  * graph). Re-wrapping the SAME materialized `RDD[InternalRow]` — zero
  * copy, no re-serialization — drops the bogus estimate while keeping
  * the data and partitioning. */
object GraftSqlInternal {
  def dataFrameFromInternalRdd(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
