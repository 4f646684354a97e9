package graft

import graft.changeset.RangeMerge
import graft.changeset.RangeMerge.{Delta, DeltaOp, MergedRange}
import org.scalatest.funsuite.AnyFunSuite

class RangeMergeSpec extends AnyFunSuite {

  private def d(tx: Long, s: Long, e: Long, op: String) =
    Delta(1L, tx, s, e, op)

  test("appends extend monotonically, keep min start") {
    val r = RangeMerge.fold(Seq(
      d(1, 100, 200, DeltaOp.Append),
      d(2, 50, 180, DeltaOp.Append),
      d(3, 300, 400, DeltaOp.Append)))
    assert(r == MergedRange(50, 400, deleted = false, 3))
  }

  test("truncate is the only way end shrinks") {
    val r = RangeMerge.fold(Seq(
      d(1, 0, 500, DeltaOp.Append),
      d(2, 0, 100, DeltaOp.Append), // no shrink
      d(3, 0, 50, DeltaOp.Truncate), // shrink
      d(4, 10, 80, DeltaOp.Append))) // re-extend
    assert(r == MergedRange(0, 80, deleted = false, 4))
  }

  test("delete short-circuits: later deltas ignored") {
    val r = RangeMerge.fold(Seq(
      d(1, 0, 100, DeltaOp.Append),
      d(2, 0, 0, DeltaOp.Delete),
      d(3, 0, 9999, DeltaOp.Append)))
    assert(r == MergedRange(0, 100, deleted = true, 2))
  }

  test("empty and delete-first histories") {
    assert(RangeMerge.fold(Nil) == MergedRange(-1, -1, deleted = false, -1))
    assert(RangeMerge.fold(Seq(d(5, 0, 0, DeltaOp.Delete))) ==
      MergedRange(-1, -1, deleted = true, 5))
  }

  /** Declarative re-statement of the semantics (the shape the DuckDB
    * oracle of q24 uses): consider deltas before the first delete; start
    * = min start; end = max end at-or-after the last truncate. */
  private def declarative(deltas: Seq[Delta]): MergedRange = {
    val sorted = deltas.sortBy(_.txId)
    val delIdx = sorted.indexWhere(_.op == DeltaOp.Delete)
    val cons = if (delIdx >= 0) sorted.take(delIdx) else sorted
    val deleted = delIdx >= 0
    val lastTx =
      if (deleted) sorted(delIdx).txId
      else cons.lastOption.map(_.txId).getOrElse(-1L)
    if (cons.isEmpty) return MergedRange(-1, -1, deleted, lastTx)
    val trIdx = cons.lastIndexWhere(_.op == DeltaOp.Truncate)
    val tail = if (trIdx >= 0) cons.drop(trIdx) else cons
    MergedRange(cons.map(_.startOffset).min, tail.map(_.endOffset).max,
      deleted, lastTx)
  }

  test("property: ordered fold == declarative barrier semantics (1000 random histories)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 1000) {
      val n = rnd.nextInt(20)
      val deltas = (1 to n).map { i =>
        val s = rnd.nextInt(1000).toLong
        val op = rnd.nextInt(9) match {
          case 0 => DeltaOp.Delete
          case 1 | 2 => DeltaOp.Truncate
          case _ => DeltaOp.Append
        }
        Delta(1L, i.toLong, s, s + 1 + rnd.nextInt(500), op)
      }
      assert(RangeMerge.fold(deltas) == declarative(deltas),
        s"mismatch for $deltas")
    }
  }
}
