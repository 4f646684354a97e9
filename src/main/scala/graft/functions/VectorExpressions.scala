package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the dense-vector dot product — the hot
  * inner loop of the similarity battery. Spark's higher-order
  * `aggregate(zip_with(...))` evaluates a lambda per element through the
  * interpreter; this expression stays inside whole-stage codegen with a
  * tight primitive loop over `ArrayData`, which is the difference between
  * an O(n·d) interpreted walk and a JIT-compiled loop when scoring
  * billions of candidate pairs.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All SRP (sign-random-projection) band keys for one vector in a SINGLE
  * expression node. The naive formulation — `nBands × r` separate
  * `dot(v, array(lit…))` sub-trees, each carrying its hyperplane as a
  * `CreateArray` of 64 literals — puts thousands of literal nodes in the
  * plan: analysis/optimization walks them repeatedly, the generated code
  * balloons past Janino's method limits, and `explain` output gets
  * truncated. Here the plane matrix rides along as ONE flat `double[]`
  * reference object, and codegen emits a tight triple loop. Per-plane
  * accumulation is a left-to-right double fold, identical to [[DotProduct]]
  * and DuckDB's `list_dot_product`, so bucket assignments — and therefore
  * the driver's oracle hashes — are bit-identical to the unfused form.
  *
  * Output: `array<int>` of length `nBands`; element `b` is the r-bit key
  * whose bit `i` is set iff `v · planes[b*r + i] > 0`.
  */
case class SrpBandKeys(child: Expression, planes: IndexedSeq[Double],
    nBands: Int, r: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if planes.length == nBands * r * dim =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_bands: plane matrix has ${planes.length} values, " +
        s"expected nBands*r*dim = ${nBands * r * dim}")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_bands expects array<double>, got ${dt.simpleString}")
  }

  @transient private lazy val flat: Array[Double] = planes.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val keys = new Array[Int](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0
      var i = 0
      while (i < r) {
        val off = (b * r + i) * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += v.getDouble(d) * flat(off + d); d += 1 }
        if (s > 0) key |= (1 << i)
        i += 1
      }
      keys(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.addReferenceObj("srpPlanes", flat, "double[]")
      val keys = ctx.freshName("keys")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int[] $keys = new int[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  int $key = 0;
         |  for (int $i = 0; $i < $r; $i++) {
         |    int $off = ($b * $r + $i) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $v.getDouble($d) * $p[$off + $d];
         |    }
         |    if ($s > 0) $key |= (1 << $i);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The high bit of each of the first 32 hex digits of a hash string,
  * packed into a long (bit j = 1 iff digit j's 4-bit value ≥ 8). This is
  * the SimHash per-word vote mask: the 64-sum fingerprint aggregation was
  * spending a `substring` + set-membership per BIT per word-row (64
  * string ops per input row); with the mask precomputed once per row the
  * per-bit aggregate collapses to a shift-and. Digit semantics match
  * `substring(h, j+1, 1) IN ('8','9','a','b','c','d','e','f')` exactly
  * (md5 hex is lowercase ASCII), so oracle SQL is unchanged. */
case class HexHighBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_hex_high_bits expects string, got ${dt.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val n = math.min(32, s.numBytes())
    var mask = 0L
    var j = 0
    while (j < n) {
      val b = s.getByte(j)
      val v = if (b <= '9') b - '0' else b - 'a' + 10
      if (v >= 8) mask |= (1L << j)
      j += 1
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val m = ctx.freshName("mask")
      s"""
         |int $n = java.lang.Math.min(32, $s.numBytes());
         |long $m = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  byte $b = $s.getByte($j);
         |  int $v = ($b <= '9') ? ($b - '0') : ($b - 'a' + 10);
         |  if ($v >= 8) $m |= (1L << $j);
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object vec {
  /** Dot product of two array&lt;double&gt; columns (whole-stage codegen). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Packed high bits of the first 32 hex digits of a hash column (see
    * [[HexHighBits]]). */
  def hexHighBits(h: Column): Column =
    GraftBridge.column(HexHighBits(GraftBridge.expression(h)))

  /** All SRP band keys for a vector column as `array<int>` (one codegen
    * node; see [[SrpBandKeys]]). `planes(k)` is hyperplane k's dense row;
    * plane k serves band `k / r`, bit `k % r`. */
  def srpBands(v: Column, planes: Array[Array[Double]], nBands: Int,
      r: Int): Column = {
    require(planes.length == nBands * r, s"need ${nBands * r} planes")
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "ragged plane matrix")
    GraftBridge.column(SrpBandKeys(GraftBridge.expression(v),
      planes.flatten.toIndexedSeq, nBands, r, dim))
  }

  private[functions] val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_dot expects exactly 2 arguments, got ${other.size}")
  }

  /** Make `graft_dot` callable from SQL on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftBridge.registerFunction(spark, "graft_dot", dotBuilder)
}

/** Session-build-time registration (`--conf spark.sql.extensions=
  * graft.functions.GraftExtensions`): injects the engine's custom
  * expressions into every session created with the extension — the
  * standard deployment path on a shared cluster. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "graft_dot"),
      vec.dotBuilder))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHashVotes].getName, "graft_simhash"),
      SimHashVotes.sqlBuilder))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_vecsum"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LongVectorSum].getName, "graft_vecsum"),
      LongVectorSum.sqlBuilder))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_isqrt"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[IntegerSqrt].getName, "graft_isqrt"),
      IntegerSqrt.sqlBuilder))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_bands"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashBands].getName, "graft_minhash_bands"),
      MinHashBands.sqlBuilder))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kmv"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[KmvSketch].getName, "graft_kmv"),
      KmvSketch.sqlBuilder))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_within_edit1"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WithinEdit1].getName, "graft_within_edit1"),
      WithinEdit1.sqlBuilder))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hilbert2"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HilbertIndex2].getName, "graft_hilbert2"),
      HilbertIndex2.sqlBuilder))
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughTopK)
  }
}
