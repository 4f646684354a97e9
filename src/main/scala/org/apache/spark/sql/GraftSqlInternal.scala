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

  /** Release the block-store blocks behind a pinned (local-checkpointed)
    * frame DETERMINISTICALLY. `Dataset.unpersist` only talks to the
    * cache manager, and a local checkpoint's blocks are RDD-level
    * persistence the cache manager never sees — so an iterative loop
    * calling it actually relies on the GC-driven ContextCleaner to
    * reclaim dead generations, which is exactly the nondeterminism that
    * let q270's sf10 peel accumulate generations until the heap filled.
    * Walking the analyzed plan for its `LogicalRDD` leaves reaches the
    * materialized RDD itself. */
  def unpersistPinned(ds: Dataset[_], blocking: Boolean): Unit =
    ds.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking)
      case _ => ()
    }
}
