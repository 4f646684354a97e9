package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the EXACT integer square root —
  * isqrt(x) = ⌊√x⌋ computed without any float path the two engines
  * could round differently. The device: IEEE-754 `sqrt` is correctly
  * rounded, so `(long) Math.sqrt(x)` is within ±1 of the true floor
  * for every non-negative 63-bit input; one conditional decrement and
  * one conditional increment land it exactly. This is what makes
  * standard deviations / L2 norms / z-scores expressible in the
  * repo's integer-exact hash-gateable style (q162): variance
  * accumulates as integers, `graft_isqrt` emits an integer stddev,
  * and no DECIMAL↔DOUBLE cast ever enters the comparison.
  *
  * The same correction is spelled out in the DuckDB oracles as plain
  * SQL (`s - (s*s > x) + ((s+1)*(s+1) <= x)`), so both engines agree
  * bit-for-bit on every input.
  *
  * Negative input throws (matching the repo's fail-loudly convention —
  * a negative variance is always an upstream bug, never data). */
case class IntegerSqrt(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_isqrt expects BIGINT, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    IntegerSqrt.isqrt(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      s"""
         |if ($x < 0L) throw new IllegalArgumentException(
         |  "graft_isqrt: negative input " + $x);
         |long $s = (long) java.lang.Math.sqrt((double) $x);
         |if ($s > 0L && $s * $s > $x) $s -= 1L;
         |// 3037000499 = isqrt(2^63-1): above it (s+1)^2 would wrap
         |if ($s < 3037000499L && ($s + 1L) * ($s + 1L) <= $x) $s += 1L;
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IntegerSqrt =
    copy(child = newChild)

  override def prettyName: String = "graft_isqrt"
}

object IntegerSqrt {
  /** Interpreted path + ground truth for specs. */
  def isqrt(x: Long): Long = {
    require(x >= 0L, s"graft_isqrt: negative input $x")
    var s = math.sqrt(x.toDouble).toLong
    if (s > 0L && s * s > x) s -= 1L
    // 3037000499 = isqrt(2^63-1): above it (s+1)^2 would wrap
    if (s < 3037000499L && (s + 1L) * (s + 1L) <= x) s += 1L
    s
  }

  /** Column-API access (no session registration needed). */
  def apply(c: Column): Column =
    GraftBridge.column(IntegerSqrt(GraftBridge.expression(c)))

  private[functions] val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(x) => IntegerSqrt(x)
    case other => throw new IllegalArgumentException(
      s"graft_isqrt expects exactly 1 argument, got ${other.size}")
  }
}
