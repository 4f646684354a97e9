package graft.plans

import java.util.Comparator

import org.apache.spark.{SparkEnv, TaskContext}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.util.collection.unsafe.sort.{UnsafeExternalSorter, UnsafeSorterIterator}

/** Per-task runtime state behind [[TopKPerGroupExec]]'s whole-stage-codegen
  * path: the generated code calls [[insert]] once per input row and then
  * drains via [[startDrain]]/[[hasNext]]/[[next]] — the same shape as
  * `SortExec`'s generated produce/consume, with the bounded per-group
  * heaps in place of a sorter.
  *
  * Memory contract: resident heaps hold at most `flushAt × k` rows. When
  * a PARTIAL pass exceeds the resident-group cap, the heaps are flushed
  * into a SPILLABLE row backlog (`UnsafeExternalSorter` with no
  * comparator — insertion-order records, the same spill-only use as
  * Spark's `CartesianProductExec` buffer). A blocking codegen operator
  * cannot stream early rows out mid-consume the way the interpreted
  * iterator does, so the backlog is how the flush keeps its bound: heap
  * table stays capped, overflow rows go to memory-managed pages that
  * spill to disk under pressure instead of accumulating on the JVM heap.
  */
final class TopKRuntimeBuffer(
    keyProj: UnsafeProjection,
    cmp: Comparator[_ >: UnsafeRow],
    numFields: Int,
    limit: Int,
    partial: Boolean,
    flushAt: Int) {

  private val heaps =
    new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
  private var backlog: UnsafeExternalSorter = null

  def insert(row: UnsafeRow): Unit = {
    val key = keyProj(row)
    var heap = heaps.get(key)
    if (heap == null) {
      heap = new java.util.PriorityQueue[UnsafeRow](limit + 1,
        java.util.Collections.reverseOrder(cmp))
      heaps.put(key.copy(), heap)
    }
    if (heap.size < limit) heap.add(row.copy())
    else if (cmp.compare(row, heap.peek()) < 0) {
      heap.poll()
      heap.add(row.copy())
    }
    if (partial && heaps.size() > flushAt) flushToBacklog()
  }

  /** Move every resident heap row into the spillable backlog — correct
    * for a partial pass (superset of the true top k; the final pass
    * re-merges) and bounded (heap table empties, pages spill). */
  private def flushToBacklog(): Unit = {
    if (backlog == null) {
      val tc = TaskContext.get()
      val tmm = org.apache.spark.sql.GraftBridge.taskMemoryManager(tc)
      backlog = UnsafeExternalSorter.create(
        tmm, SparkEnv.get.blockManager,
        SparkEnv.get.serializerManager, tc,
        null, null, // no comparator: insertion-order spillable buffer
        4096, tmm.pageSizeBytes(),
        Integer.MAX_VALUE, Long.MaxValue, false)
      tc.addTaskCompletionListener[Unit] { _ =>
        if (backlog != null) { backlog.cleanupResources(); backlog = null }
      }
    }
    val it = heaps.values().iterator()
    while (it.hasNext) {
      val h = it.next().iterator()
      while (h.hasNext) {
        val r = h.next()
        backlog.insertRecord(r.getBaseObject, r.getBaseOffset,
          r.getSizeInBytes, 0L, false)
      }
    }
    heaps.clear()
  }

  // ---- drain side (generated produce loop) ----

  private var spillIter: UnsafeSorterIterator = null
  private val spillRow = new UnsafeRow(numFields)
  private var heapIter: java.util.Iterator[java.util.PriorityQueue[UnsafeRow]] = null
  private var curHeap: java.util.Iterator[UnsafeRow] = java.util.Collections.emptyIterator()

  def startDrain(): Unit = {
    spillIter = if (backlog == null) null else backlog.getIterator(0)
    heapIter = heaps.values().iterator()
  }

  def hasNext: Boolean =
    (spillIter != null && spillIter.hasNext) || curHeap.hasNext || {
      while (!curHeap.hasNext && heapIter.hasNext)
        curHeap = heapIter.next().iterator()
      curHeap.hasNext
    }

  def next(): UnsafeRow =
    if (spillIter != null && spillIter.hasNext) {
      spillIter.loadNext()
      spillRow.pointTo(spillIter.getBaseObject, spillIter.getBaseOffset,
        spillIter.getRecordLength)
      spillRow
    } else {
      if (!curHeap.hasNext) {
        while (!curHeap.hasNext && heapIter.hasNext)
          curHeap = heapIter.next().iterator()
      }
      curHeap.next()
    }
}

/** Serializable recipe for a [[TopKRuntimeBuffer]]; shipped to executors
  * as a codegen reference object and invoked once per task (the
  * projection and the generated ordering are task-local objects). */
final case class TopKBufferFactory(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    childOutput: Seq[Attribute],
    k: Int,
    partial: Boolean,
    // captured at PLAN time on the driver — resolving the system
    // property in create() would read the EXECUTOR's JVM flags, which
    // on a real cluster silently differ from the driver's
    flushAt: Int) {

  def create(): TopKRuntimeBuffer = new TopKRuntimeBuffer(
    UnsafeProjection.create(groupExprs, childOutput),
    new LazilyGeneratedOrdering(order, childOutput),
    childOutput.size, k, partial, flushAt)
}
