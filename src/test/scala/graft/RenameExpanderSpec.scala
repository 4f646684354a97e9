package graft

import graft.model.{ChangeEvent, FileLifecycle => L, FileState, Op}
import graft.state.{FileStateFSM, RenameExpander}
import org.scalatest.funsuite.AnyFunSuite

class RenameExpanderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file rename fans out to delete+add+append+close and moves state") {
    implicit val s = spark
    import s.implicits._
    val events = Seq(
      ChangeEvent(1, Op.AddFile, "/data/a.parquet"),
      ChangeEvent(2, Op.AppendFile, "/data/a.parquet", sizeCents = 500),
      ChangeEvent(3, Op.CloseFile, "/data/a.parquet"),
      // rename; caller-populated sizeCents carries the file's size
      ChangeEvent(4, Op.RenameFile, "/data/b.parquet",
        srcPath = "/data/a.parquet", sizeCents = 500)).toDS()
    val expanded = RenameExpander.expandFileRenames(events)
    val state = FileStateFSM.replayAll(expanded).collect()
      .map(st => st.path -> st).toMap
    assert(state("/data/a.parquet").state == L.Deleted)
    assert(state("/data/b.parquet").state == L.Finalized)
    assert(state("/data/b.parquet").dataSizeCents == 500)
    // sub-tx ordering: per-key txIds strictly increasing on the ×4 grid
    assert(state("/data/a.parquet").lastTxId == 4 * 4)
    assert(state("/data/b.parquet").lastTxId == 4 * 4 + 3)
  }

  test("directory rename fans out per live file with prefix rewrite") {
    implicit val s = spark
    import s.implicits._
    val state = Seq(
      FileState("/warehouse/t1/part-0", L.Finalized, 0, 100, 8, 3, 1),
      FileState("/warehouse/t1/part-1", L.Finalized, 0, 200, 8, 3, 1),
      FileState("/warehouse/t1/gone", L.Deleted, 0, 0, 9, 2, 0),
      FileState("/warehouse/t2/part-0", L.Finalized, 0, 300, 8, 3, 1)).toDS()
    val ev = RenameExpander.expandDirRename(state, "/warehouse/t1",
      "/archive/t1", txId = 10).collect().sortBy(e => (e.path, e.txId))
    // 2 live files under prefix → 2×4 events; deleted file + other dir skipped
    assert(ev.length == 8)
    val dests = ev.filter(_.op == Op.CloseFile).map(_.path).sorted
    assert(dests.toSeq == Seq("/archive/t1/part-0", "/archive/t1/part-1"))
    val replayed = FileStateFSM.replayWithInit(state, ev.toSeq.toDS())
      .collect().map(st => st.path -> st).toMap
    assert(replayed("/warehouse/t1/part-0").state == L.Deleted)
    assert(replayed("/archive/t1/part-1").dataSizeCents == 200)
    assert(replayed("/warehouse/t2/part-0").state == L.Finalized) // untouched
  }

  test("directory delete skips /tmp children (F6)") {
    implicit val s = spark
    import s.implicits._
    val state = Seq(
      FileState("/tmp/x/a", L.Finalized, 0, 0, 5, 2, 0),
      FileState("/data/x/a", L.Finalized, 0, 0, 5, 2, 0)).toDS()
    val evTmp = RenameExpander.expandDirDelete(state, "/tmp/x", 9).collect()
    assert(evTmp.isEmpty)
    val evData = RenameExpander.expandDirDelete(state, "/data/x", 9).collect()
    assert(evData.map(_.path).toSeq == Seq("/data/x/a"))
  }

  test("replayWithInit: init-only keys pass through; new keys start empty") {
    implicit val s = spark
    import s.implicits._
    val init = Seq(FileState("/old", L.Finalized, 0, 42, 7, 3, 1)).toDS()
    val ev = Seq(ChangeEvent(100, Op.AddFile, "/new")).toDS()
    val out = FileStateFSM.replayWithInit(init, ev).collect()
      .map(st => st.path -> st).toMap
    assert(out("/old").dataSizeCents == 42 && out("/old").lastTxId == 7)
    assert(out("/new").state == L.New)
  }
}
