package graft.changeset

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Compressed-change-set range merge — the reference's signature
  * aggregation (SURVEY §2.5 A1; behavior of
  * `core/model/DFSBlockState.java:75-106` compress fold over the ordered
  * `BlockTransactionDelta` list, consumed by
  * `agent/namenode/SourceChangeDeltaProcessor.java:178-216`).
  *
  * Semantics, folding deltas in txId order:
  *  - '''append(s,e)''': start = min(start, s); end = max(end, e)
  *    (monotonic extension)
  *  - '''truncate(s,e)''': start = min(start, s); end = e — the only way
  *    end may shrink (ref: "allow shrink only after a truncate")
  *  - '''delete''': short-circuit — the block is gone; later deltas are
  *    ignored and the merged range reports `deleted = true`
  *
  * Scale design: implemented as a typed [[Aggregator]] so Catalyst plans
  * it as a standard two-phase (partial + final) objHashAggregate. The
  * buffer holds the per-block delta list because the fold is
  * order-sensitive while shuffle delivery is not; per-block delta counts
  * are bounded (a block has a bounded tx history between snapshots —
  * the same invariant the reference relies on to keep the ZK-stored list
  * small), so the buffer stays KB-sized at any data scale. For unbounded
  * histories the streaming FSM path folds incrementally instead.
  */
object RangeMerge {

  object DeltaOp {
    val Append = "append"
    val Truncate = "truncate"
    val Delete = "delete"
  }

  /** One block-level delta (ref `core/model/BlockTransactionDelta.java:8-15`). */
  final case class Delta(blockId: Long, txId: Long, startOffset: Long,
      endOffset: Long, op: String)

  /** Merged result per block. */
  final case class MergedRange(startOffset: Long, endOffset: Long,
      deleted: Boolean, lastTxId: Long)

  /** Pure ordered fold — also reused by the FSM and property tests. */
  def fold(deltasInTxOrder: Seq[Delta]): MergedRange = {
    var start = Long.MaxValue
    var end = Long.MinValue
    var deleted = false
    var lastTx = -1L
    val it = deltasInTxOrder.iterator
    while (it.hasNext && !deleted) {
      val d = it.next()
      lastTx = d.txId
      d.op match {
        case DeltaOp.Delete => deleted = true
        case DeltaOp.Truncate =>
          start = math.min(start, d.startOffset)
          end = d.endOffset
        case _ =>
          start = math.min(start, d.startOffset)
          end = math.max(end, d.endOffset)
      }
    }
    MergedRange(if (start == Long.MaxValue) -1 else start,
      if (end == Long.MinValue) -1 else end, deleted, lastTx)
  }

  /** Typed Aggregator: collect per-block deltas (partial phase merges
    * lists), finish = txId-ordered fold. */
  object agg extends Aggregator[Delta, List[Delta], MergedRange] {
    def zero: List[Delta] = Nil
    def reduce(b: List[Delta], a: Delta): List[Delta] = a :: b
    def merge(b1: List[Delta], b2: List[Delta]): List[Delta] = b1 ::: b2
    def finish(b: List[Delta]): MergedRange = fold(b.sortBy(_.txId))
    def bufferEncoder: Encoder[List[Delta]] = ExpressionEncoder[List[Delta]]()
    def outputEncoder: Encoder[MergedRange] = Encoders.product[MergedRange]
  }
}
