package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, LazilyGeneratedOrdering}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BlockingOperatorWithCodegen, CodegenSupport, SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows PER GROUP without a sort.
  *
  * Spark's built-in shape for "first k rows of each group" is
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` — a Window
  * operator, which shuffles EVERY row to its group's partition and then
  * fully SORTS each partition, only to discard all but k rows per group.
  * At 100 TB the sort dominates and nothing is dropped before the
  * shuffle.
  *
  * This operator plans the same semantics as two bounded-heap passes,
  * the agg-style partial/final split:
  *
  *   TopKPerGroupExec(partial)   per input partition, keep at most k
  *                               rows per group seen in that partition
  *           ↓ shuffle on group key (EnsureRequirements inserts it —
  *             at most k rows per (partition, group) cross the wire)
  *   TopKPerGroupExec(final)     merge, keep the true top k per group
  *
  * Each pass is a single O(n log k) scan with memory bounded by
  * (#groups resident in the partition) × k rows — rows beyond k never
  * buffer, never spill, never shuffle. The operator is exact for any k
  * and any deterministic ordering; ties are broken by whichever row is
  * retained first, so — like the window formulation — callers who need a
  * deterministic RESULT SET must make the ordering total (the gate query
  * tie-breaks on the primary key).
  *
  * Extension surface exercised (SURVEY §2.11 tier (c)): a custom
  * `LogicalPlan` node, a `Rule[LogicalPlan]` (group-predicate pushdown
  * through the node), a `SparkStrategy` planning it into a custom
  * `SparkPlan`, all injectable via `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]) or per-session
  * (`TopK.ensure`).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def output: Seq[Attribute] = child.output

  // QueryPlan.expressions auto-collects groupExprs ++ order from the
  // constructor, which is how the analyzer resolves and the optimizer
  // rewrites them without TopKPerGroup-specific rules

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Optimizer rule: a deterministic filter that references only the GROUP
  * columns commutes with per-group top-k (it keeps or drops whole
  * groups, never reorders within one), so push it below the operator —
  * from there Spark's own pushdown carries it into the scan
  * (`PushedFilters`). Without this rule a post-top-k group filter would
  * read and heap the full table first. */
object PushFilterThroughTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: TopKPerGroup)
        if cond.deterministic &&
          t.groupExprs.forall(_.isInstanceOf[Attribute]) &&
          f.references.subsetOf(AttributeSet(t.groupExprs)) =>
      t.withNewChildren(Seq(Filter(cond, t.child))).asInstanceOf[TopKPerGroup]
  }
}

/** Plans the logical node as partial → (shuffle) → final. The shuffle is
  * not built here: the final stage DECLARES `ClusteredDistribution` on
  * the group key and EnsureRequirements inserts the minimal exchange —
  * or none at all if the child is already co-partitioned (e.g. a
  * bucketed scan or a previous aggregation on the same key). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One bounded-heap pass: for each group key, retain the k rows that
  * sort FIRST under `order`. `partial = true` runs before the shuffle on
  * whatever grouping the input has; `partial = false` requires the group
  * key clustered and produces the exact answer.
  *
  * Memory bound: the PARTIAL pass flushes its heap table whenever more
  * than [[TopKPerGroupExec.FlushGroups]] groups are resident — emitting
  * a group's current heap early is always correct for a partial pass
  * (it is a filter that keeps a superset of the group's true top k;
  * the final pass re-merges), it just shuffles up to k extra rows per
  * flush epoch for re-seen groups. The FINAL pass holds (groups in its
  * hash partition) × k rows — the same residency shape as Spark's hash
  * aggregate on the same key. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode with BlockingOperatorWithCodegen {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val groups = groupExprs
    val ord = order
    val limit = k
    val isPartial = partial
    val childOutput = child.output
    val flushAt = TopKPerGroupExec.FlushGroups
    child.execute().mapPartitions({ iter =>
      import scala.jdk.CollectionConverters._
      val keyProj = UnsafeProjection.create(groups, childOutput)
      // in-tree children all emit UnsafeRow, but the contract is only
      // InternalRow — convert stragglers instead of class-casting
      val toUnsafe = UnsafeProjection.create(
        childOutput.map(_.dataType).toArray)
      // codegen'd comparator over the unbound sort order, bound lazily
      // on the executor (same mechanism TakeOrderedAndProject uses)
      val cmp = new LazilyGeneratedOrdering(ord, childOutput)
      // max-heap under cmp: the head is the WORST retained row, evicted
      // as soon as a better one arrives while the heap is full
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()

      // keep in sync with TopKRuntimeBuffer.insert — the codegen path's
      // copy of this heap logic. The two deliberately differ ONLY in
      // flush destination: this iterator STREAMS flushed rows straight
      // to its consumer (the shuffle writer), while the blocking codegen
      // operator cannot emit mid-consume and so SPILLS them instead.
      def consume(row: UnsafeRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, cmp.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }

      def drain(): Iterator[InternalRow] = {
        val out = heaps.values().asScala.toArray.iterator
          .flatMap(_.iterator().asScala)
        heaps.clear()
        out
      }

      new Iterator[InternalRow] {
        private var pending: Iterator[InternalRow] = Iterator.empty

        private def advance(): Unit = {
          while (!pending.hasNext && iter.hasNext) {
            consume(iter.next() match {
              case u: UnsafeRow => u
              case r => toUnsafe(r)
            })
            // partial pass under group-cardinality pressure: flush the
            // resident heaps into the output and start over — exact
            // (the final pass re-merges), bounded (≤ flushAt × k rows)
            if (isPartial && heaps.size() > flushAt) pending = drain()
          }
          if (!pending.hasNext && !iter.hasNext && !heaps.isEmpty)
            pending = drain()
        }

        override def hasNext: Boolean = { advance(); pending.hasNext }
        override def next(): InternalRow = { advance(); pending.next() }
      }
    }, preservesPartitioning = true)
  }

  // ---- whole-stage codegen (SortExec's blocking shape) -------------
  //
  // doConsume inserts each child row into the per-task TopKRuntimeBuffer;
  // doProduce first drives the child's produce loop to exhaustion, then
  // emits the retained rows to the parent — so the scan-side stage fuses
  // scan → filter/project → heap-insert into one compiled loop, and the
  // drain fuses into the downstream stage. The interpreted doExecute
  // remains the non-codegen fallback.

  // set in doProduce, read by doConsume (same device as SortExec's
  // sorterVariable — produce always runs before consume is generated)
  private var bufferVariable: String = _

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  // whole-row consume: no per-column usage to track
  override def usedInputs: AttributeSet = AttributeSet.empty

  override protected def doProduce(ctx: CodegenContext): String = {
    val needInit = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN,
      "topkNeedInit", v => s"$v = true;")
    val factory = ctx.addReferenceObj("topkFactory",
      TopKBufferFactory(groupExprs, order, child.output, k, partial,
        TopKPerGroupExec.FlushGroups),
      classOf[TopKBufferFactory].getName)
    bufferVariable = ctx.addMutableState(classOf[TopKRuntimeBuffer].getName,
      "topkBuffer", forceInline = true)
    val addToBuffer = ctx.freshName("addToTopK")
    val addFunc = ctx.addNewFunction(addToBuffer,
      s"""
         |private void $addToBuffer() throws java.io.IOException {
         |  ${child.asInstanceOf[CodegenSupport].produce(ctx, this)}
         |}
       """.stripMargin.trim)
    val outputRow = ctx.freshName("topkOutputRow")
    s"""
       |if ($needInit) {
       |  $bufferVariable = $factory.create();
       |  $addFunc();
       |  $bufferVariable.startDrain();
       |  $needInit = false;
       |}
       |while ($limitNotReachedCond $bufferVariable.hasNext()) {
       |  org.apache.spark.sql.catalyst.expressions.UnsafeRow $outputRow =
       |    $bufferVariable.next();
       |  ${consume(ctx, null, outputRow)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
  }

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
      row: ExprCode): String =
    s"""
       |${row.code}
       |$bufferVariable.insert((org.apache.spark.sql.catalyst.expressions.UnsafeRow) ${row.value});
     """.stripMargin

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Resident-group cap for the partial pass before it flushes
    * (overridable for tests via the system property). At k=10 and
    * 64-byte rows this bounds the heap table near 64 MB. */
  def FlushGroups: Int =
    Integer.getInteger("graft.topk.flushGroups", 100000)
}

/** User-facing API + per-session registration. */
object TopK {

  /** Idempotently add the strategy + optimizer rule to an existing
    * session (the `spark.sql.extensions=graft.functions.GraftExtensions`
    * path does the same at session build time). */
  def ensure(spark: SparkSession): Unit = {
    val exp = GraftBridge.experimental(spark)
    if (!exp.extraStrategies.contains(TopKPerGroupStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerGroupStrategy
    if (!exp.extraOptimizations.contains(PushFilterThroughTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughTopK
  }

  /** Top `k` rows of each `groupCols` group under `order` (e.g.
    * `col("n_chars").desc`). Exact; make the order total for a
    * deterministic result set. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    ensure(df.sparkSession)
    val sortOrder = order.map(c => GraftBridge.eagerExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(GraftBridge.eagerExpression), sortOrder, k,
        GraftBridge.logicalPlan(df)))
  }
}
