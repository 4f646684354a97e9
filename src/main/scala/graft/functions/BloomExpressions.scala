package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built [[BloomFilter]] as a NATIVE
  * codegen expression. Spark's own `bloom_filter_agg`/`might_contain`
  * pair exists only as internal runtime-filter machinery (not in the
  * SQL registry), and the UDF alternative would deserialize the filter
  * per call and box every row — this node carries the serialized
  * filter, deserializes it ONCE per task via `addReferenceObj`, and
  * probes the string's UTF-8 bytes inside whole-stage codegen.
  *
  * The probe hashes the same bytes `BloomFilter.putString` hashed at
  * build time, and the filter's bit array is a commutative OR of
  * deterministic hashes — so membership answers (including false
  * positives) are deterministic for a given item set, which is what
  * lets a gate query hash-compare verdicts built on top of them.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${other.simpleString}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ONE deserialized filter per codegen'd task, shared by every row
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // the byte array rides the expression through plan copies; equality by
  // reference is fine (the same build's filter), but make toString sane
  override def toString: String = s"$prettyName(${child.sql}, <${filterBytes.length}B>)"
}

object bloom {
  /** `true` iff `c` (string) may be in `filter` — no false negatives,
    * false positives at the filter's configured fpp. */
  def mightContain(c: Column, filter: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    filter.writeTo(bos)
    GraftBridge.column(BloomMightContain(GraftBridge.expression(c),
      bos.toByteArray))
  }

  /** Build a filter over a string dataset with a distributed
    * tree-aggregate (per-partition inserts, pairwise bit-OR merges —
    * the canonical mergeable-sketch shape, and the rare case where the
    * RDD API is the right tool: the accumulator is a mutable native
    * buffer, not a row). Built here rather than via
    * `DataFrameStatFunctions.bloomFilter` so the INSERT hashing
    * (`putString` = UTF-8 bytes) is pinned to the probe hashing
    * [[BloomMightContain]] uses, independent of which internal
    * aggregate Spark's stat API delegates to in a given release. */
  def buildString(ds: org.apache.spark.sql.Dataset[String],
      expectedItems: Long, fpp: Double): BloomFilter =
    ds.rdd.treeAggregate(BloomFilter.create(math.max(expectedItems, 1L), fpp))(
      (f, s) => { f.putString(s); f },
      (a, b) => { a.mergeInPlace(b); a })
}
