package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst aggregate: ELEMENT-WISE SUM of fixed-length LONG
  * vectors — the mergeable-sketch shape (one array buffer per group,
  * partial map-side, one small binary blob through the shuffle) that a
  * `posexplode → groupBy(idx) → sum` formulation would otherwise pay a
  * row-per-element shuffle for. Powers q111's Gram-matrix pass, where
  * each input row contributes a 4096-element outer product: the
  * alternative explode plan shuffles n·4096 rows; this plans ONE
  * global agg whose state is a 32 KiB buffer.
  *
  * `n` (the vector length) is a literal parameter so the aggregation
  * buffer has a static size; a row of any other length is a hard error
  * (silent truncation would corrupt the sum).
  */
case class LongVectorSum(child: Expression, n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(n >= 1 && n <= (1 << 20), s"vector length must be in [1,2^20], got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_vecsum expects ARRAY<BIGINT>, got ${dt.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == n,
        s"graft_vecsum($n) got a row of length ${arr.numElements()}")
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): LongVectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LongVectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): LongVectorSum =
    copy(child = newChild)
}

object LongVectorSum {
  /** Element-wise sum of the group's length-`n` ARRAY<BIGINT> column. */
  def vecsum(v: Column, n: Int): Column =
    GraftBridge.column(
      LongVectorSum(GraftBridge.expression(v), n).toAggregateExpression())

  /** SQL builder: `graft_vecsum(vec, nElems)` — nElems must be an
    * integer literal (it sizes the aggregation buffer). */
  private[functions] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(v, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
      LongVectorSum(v, n).toAggregateExpression()
    case other => throw new IllegalArgumentException(
      "graft_vecsum expects (vec, <int literal> nElems), got " +
        other.mkString(", "))
  }
}
