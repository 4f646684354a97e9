package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst AGGREGATE for a KMV (k-minimum-values) distinct
  * sketch: the group's k smallest DISTINCT values of a pre-hashed LONG
  * column, returned as an ascending array.
  *
  * This is the one-pass mergeable form of q241's compositional device
  * (`distinct.orderBy(h).limit(k)` per set): `update` runs map-side,
  * `merge` unions two k-bounded sketches, and the shuffle carries at
  * most 8·k bytes per (partition, group) — the same partial-aggregate
  * shape as HLL, but with an exactly-specified, engine-independent
  * result the DuckDB oracle can emulate verbatim as
  * `(array_agg(DISTINCT h ORDER BY h))[1:k]`. Downstream arithmetic
  * (θ = last element, distinct estimate `(k−1)·M div θ`, sketch-∩
  * Jaccard) is plain SQL on the array, so the whole estimator stays
  * oracle-gated (q252).
  *
  * The caller hashes (any overflow-safe integer hash both engines can
  * state); keeping the hash OUT of the aggregate is what makes the
  * oracle emulation exact.
  *
  * Buffer: a sorted distinct set capped at k — O(log k) per update
  * once warm, and updates past a full buffer reject early on
  * `h ≥ last` without touching the tree.
  */
case class KmvSketch(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"k must be in [1,65536], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a pre-hashed LONG column, got ${dt.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    while (bb.remaining() >= 8) s.add(bb.getLong)
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** The group's k smallest distinct values of `hashed`, ascending. */
  def kmv(hashed: Column, k: Int): Column =
    GraftBridge.column(
      KmvSketch(GraftBridge.expression(hashed), k).toAggregateExpression())

  /** Make `graft_kmv` SQL-callable on an existing session (idempotent;
    * the per-session analog of the GraftExtensions injection). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerFunction(spark, "graft_kmv", sqlBuilder)

  /** SQL builder: `graft_kmv(hashed, <integer literal> k)` — accepts
    * INT or BIGINT literals for k (SQL integer literals parse as
    * either depending on context), range-checked to [1, 65536]. */
  private[functions] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(h, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _))
        if n >= 1 && n <= 65536 =>
      KmvSketch(h, n).toAggregateExpression()
    case Seq(h, org.apache.spark.sql.catalyst.expressions.Literal(n: Long, _))
        if n >= 1L && n <= 65536L =>
      KmvSketch(h, n.toInt).toAggregateExpression()
    case Seq(_, org.apache.spark.sql.catalyst.expressions.Literal(n, _))
        if n.isInstanceOf[Int] || n.isInstanceOf[Long] =>
      throw new IllegalArgumentException(
        s"graft_kmv k out of range: $n not in [1, 65536]")
    case other => throw new IllegalArgumentException(
      "graft_kmv expects (hashed LONG column, k integer literal in " +
        "[1, 65536]), got " + other.mkString(", "))
  }
}
