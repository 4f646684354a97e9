package graft

import graft.model.{BlockState, ChangeEvent, FileLifecycle => L, FileState, Mode, Op}
import graft.state.{FileStateFSM, ReplicaTracker}
import org.scalatest.funsuite.AnyFunSuite

class ReplicaTrackerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(tx: Long, op: String, path: String = "/f",
      blockId: Long = -1L, prev: Long = -1L, bytes: Long = 0L): ChangeEvent =
    ChangeEvent(tx, op, path, blockId = blockId, prevBlockId = prev,
      startOffset = 0L, endOffset = bytes)

  test("FSM maintains the block chain with prev-pointers") {
    val st = Seq(
      ev(1, Op.AddFile),
      ev(2, Op.AddBlock, blockId = 100L, bytes = 10L),
      ev(3, Op.AddBlock, blockId = 101L, prev = 100L, bytes = 0L),
      ev(4, Op.UpdateBlocks, blockId = 101L, bytes = 77L),
      ev(5, Op.CloseFile))
      .foldLeft(FileState("/f"))(FileStateFSM.transition)
    assert(st.state == L.Finalized)
    assert(st.blocks == Seq(
      BlockState(100L, -1L, 10L, 2L), BlockState(101L, 100L, 77L, 4L)))
    assert(st.numBlocks == 2L)
  }

  test("broken prev-chain drives the file to sticky Error (W2 integrity)") {
    val st = Seq(
      ev(1, Op.AddFile),
      ev(2, Op.AddBlock, blockId = 100L),
      ev(3, Op.AddBlock, blockId = 101L, prev = 999L), // wrong predecessor
      ev(4, Op.CloseFile))
      .foldLeft(FileState("/f"))(FileStateFSM.transition)
    assert(st.state == L.Error)
    assert(st.lastTxId == 3L) // error recorded at the violating tx
    assert(st.blocks.map(_.blockId) == Seq(100L)) // bad block not appended
  }

  test("truncate shrinks the boundary block and drops fully-truncated tails") {
    val st = Seq(
      ev(1, Op.AddFile),
      ev(2, Op.AddBlock, blockId = 100L, bytes = 100L),
      ev(3, Op.AddBlock, blockId = 101L, prev = 100L, bytes = 100L),
      ev(4, Op.AddBlock, blockId = 102L, prev = 101L, bytes = 100L),
      ev(5, Op.TruncateBlock, bytes = 150L)) // cut to 150 bytes total
      .foldLeft(FileState("/f"))(FileStateFSM.transition)
    assert(st.state == L.Updating)
    assert(st.blocks.map(b => (b.blockId, b.numBytes)) ==
      Seq((100L, 100L), (101L, 50L))) // 102 dropped, 101 shrunk
    assert(st.numBlocks == 2L)
    // truncate to zero drops every block
    val st2 = FileStateFSM.transition(st, ev(6, Op.TruncateBlock, bytes = 0L))
    assert(st2.blocks.isEmpty && st2.numBlocks == 0L)
  }

  test("bootstrap-loaded state (blocks unknown) accepts chained catch-up events") {
    // fsimage/snapshot bootstrap carries numBlocks but no per-block
    // detail — the chain is UNKNOWN, not empty: a chained AddBlock must
    // be accepted, recording the event's own prev pointer
    val boot = FileState("/f", L.Finalized, numBlocks = 1L,
      dataSizeCents = 100L, lastTxId = 10L, nOps = 1L, chainKnown = false)
    val st = Seq(
      ev(11, Op.AppendFile),
      ev(12, Op.AddBlock, blockId = 201L, prev = 200L), // 200 from before boot
      ev(13, Op.CloseFile))
      .foldLeft(boot)(FileStateFSM.transition)
    assert(st.state == L.Finalized, "bootstrapped file must not brick")
    assert(st.numBlocks == 2L)
    assert(st.blocks.map(b => (b.blockId, b.prevBlockId)) == Seq((201L, 200L)))
    // ...and a truncate on a detail-less state keeps the counter
    val t = FileStateFSM.transition(boot, ev(11, Op.TruncateBlock, bytes = 50L))
    assert(t.numBlocks == 1L)
  }

  test("chain info is optional: -1 prevBlockId always accepted") {
    val st = Seq(
      ev(1, Op.AddFile),
      ev(2, Op.AddBlock, blockId = 100L),
      ev(3, Op.AddBlock, blockId = 101L)) // no chain info
      .foldLeft(FileState("/f"))(FileStateFSM.transition)
    assert(st.state == L.Updating && st.blocks.size == 2)
  }

  test("real edit-log fixture carries a verifiable chain") {
    // the links_2.parquet lifecycle: single block, no predecessor
    val ops = graft.ingest.EditLogDecoder.decodeSegment(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "/root/reference/change-manager/namenode-agent/src/test/resources/edits/logs/delete/current",
        "edits_0000000000000028321-0000000000000028329")))
    val events = ops.map(graft.ingest.EditLogDecoder.toChangeEvent)
      .filter(e => e.path.endsWith("._COPYING_"))
    val st = events.sortBy(_.txId).foldLeft(
      FileState(events.head.path))(FileStateFSM.transition)
    assert(st.state == L.Finalized)
    assert(st.blocks.map(_.blockId) == Seq(1073742463L))
    assert(st.blocks.head.prevBlockId == -1L)
  }

  test("reconcile: lag and the snapshot-done -> Backlog decision") {
    implicit val s = spark
    import s.implicits._
    val events = Seq(
      ev(1, Op.AddFile, "/a"), ev(2, Op.AppendFile, "/a"),
      ev(3, Op.AddFile, "/b"), ev(4, Op.CloseFile, "/b"),
      // after the snapshot cut (t1 = 4): /a advances, /b does not
      ev(5, Op.AppendFile, "/a"), ev(6, Op.CloseFile, "/a")).toDS()
    val snap = FileStateFSM.replayAll(events.filter(_.txId <= 4L))
    val replicas = ReplicaTracker.fromSnapshot(snap,
      st => st.path.hashCode.toLong)
    val live = FileStateFSM.replayAll(events)
    val rec = ReplicaTracker.reconcile(replicas, live)
    val byPath = rec.collect().map(r =>
      r.getAs[String]("path") -> (r.getAs[Long]("lag"),
        r.getAs[Boolean]("backlog"))).toMap
    assert(byPath("/a") == (4L, true)) // head 6, replicated 2
    assert(byPath("/b") == (0L, false))

    // the handshake synthesizes exactly one Backlog CloseFile, at the
    // live head, and the FSM accepts it idempotently
    val backlog = ReplicaTracker.backlogEvents(rec).collect()
    assert(backlog.toSeq == Seq(
      ChangeEvent(6L, Op.CloseFile, "/a", Mode.Backlog)))
    val after = FileStateFSM.replayWithInit(live,
      backlog.toSeq.toDS()).collect().map(st => st.path -> st.state).toMap
    assert(after("/a") == L.Finalized)
  }

  test("single-pass reconcileFromEvents equals the two-table reconcile") {
    implicit val s = spark
    import s.implicits._
    val events = Seq(
      ev(1, Op.AddFile, "/a"), ev(2, Op.AppendFile, "/a"),
      ev(3, Op.AddFile, "/b"), ev(4, Op.CloseFile, "/b"),
      ev(5, Op.AppendFile, "/a"), ev(6, Op.CloseFile, "/a"),
      ev(7, Op.AddFile, "/c")).toDS() // /c is post-snapshot: no replica row
    val onePass = ReplicaTracker
      .reconcileFromEvents(events, 4L, _.path.hashCode.toLong)
    val snap = FileStateFSM.replayAll(events.filter(_.txId <= 4L))
    val twoTable = ReplicaTracker.reconcile(
      ReplicaTracker.fromSnapshot(snap, st => st.path.hashCode.toLong),
      FileStateFSM.replayAll(events))
    val cols = Seq("path", "inode", "snapshot_txid", "last_replicated_tx",
      "last_txid", "lag", "backlog")
    assert(onePass.select(cols.head, cols.tail: _*).orderBy("path")
      .collect().toSeq ==
      twoTable.select(cols.head, cols.tail: _*).orderBy("path")
        .collect().toSeq)
  }

  test("recordReplicated is monotonic; markReady flips the flag") {
    implicit val s = spark
    import s.implicits._
    val replicas = Seq(
      graft.model.ReplicaState(1L, "/a", 10L, 10L),
      graft.model.ReplicaState(2L, "/b", 10L, 12L)).toDS()
    val updated = ReplicaTracker.recordReplicated(replicas,
      Seq((1L, 15L), (2L, 11L)).toDS()).collect()
      .map(r => r.inode -> r.lastReplicatedTx).toMap
    assert(updated == Map(1L -> 15L, 2L -> 12L)) // 11 < 12: no regression
    val ready = ReplicaTracker.markReady(replicas, Seq(2L).toDS())
      .collect().map(r => r.inode -> r.snapshotReady).toMap
    assert(ready == Map(1L -> false, 2L -> true))
  }
}
