package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst AGGREGATE function for SimHash bit voting — the
  * extension tier between scalar expressions ([[DotProduct]]) and
  * whole-operator plans ([[graft.plans.TopKPerGroup]]).
  *
  * Semantics: the input column is a packed bit mask per row (bit j of
  * `mask` = this row votes +1 on fingerprint bit j, else −1; rows are
  * hashed words, see [[HexHighBits]]). The result is the fingerprint
  * long whose bit j is set iff the group's vote total for j is
  * positive — exactly `sum(when(bit_j, 1).otherwise(-1)) > 0` per bit,
  * which is the formulation the DuckDB oracles state and the one this
  * aggregate replaced in the q36/q43 hot path.
  *
  * Why an ImperativeAggregate and not nBits separate SUMs: the SUM
  * formulation carries nBits LONG columns of aggregation state per
  * group through partial agg, shuffle, and final agg (64 × 8 B = 512 B
  * of state + 64 codegen'd update branches per row). This buffer is ONE
  * int array updated in a tight loop, serialized once per shuffle as
  * 4·nBits bytes. Catalyst still plans partial + final (`update` runs
  * map-side, `merge` combines partials), so the shuffle carries one
  * small binary buffer per (partition, group) — the same
  * mergeable-sketch shape as HLL.
  */
case class SimHashVotes(child: Expression, nBits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  require(nBits >= 1 && nBits <= 64, s"nBits must be in [1,64], got $nBits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects a packed LONG mask, got ${dt.simpleString}")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](nBits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val mask = v.asInstanceOf[Long]
      var j = 0
      while (j < nBits) {
        buf(j) += (if (((mask >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < nBits) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var j = 0
    while (j < nBits) {
      if (buf(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * nBits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(nBits)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashVotes =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashVotes =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SimHashVotes =
    copy(child = newChild)
}

object SimHashVotes {
  /** Fingerprint of the group's packed-mask column over `nBits` bits. */
  def simhash(mask: Column, nBits: Int): Column =
    GraftBridge.column(
      SimHashVotes(GraftBridge.expression(mask), nBits)
        .toAggregateExpression())

  /** SQL builder: `graft_simhash(mask, nBits)` — nBits must be an
    * integer literal (it shapes the aggregation buffer). */
  private[functions] val sqlBuilder
      : Seq[Expression] => Expression = {
    case Seq(mask, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
      SimHashVotes(mask, n).toAggregateExpression()
    case other => throw new IllegalArgumentException(
      "graft_simhash expects (mask, <int literal> nBits), got " +
        other.mkString(", "))
  }
}
