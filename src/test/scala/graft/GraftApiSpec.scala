package graft

import graft.api.Graft
import graft.filters.DomainFilters.Filter
import graft.model.{ChangeEvent, FileLifecycle => L, Mode, Op}
import org.scalatest.funsuite.AnyFunSuite

class GraftApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("facade: replay -> state table -> snapshot -> incremental replay -> watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_api_").toString
    val g = new Graft(spark, dir)
    g.addFilter(Filter("d1", "MOVIES", "/data/movies", ".*\\.parquet$", 1))

    val events = Seq(
      ChangeEvent(1, Op.AddFile, "/data/movies/p1.parquet"),
      ChangeEvent(2, Op.AppendFile, "/data/movies/p1.parquet", sizeCents = 400),
      ChangeEvent(3, Op.CloseFile, "/data/movies/p1.parquet"),
      ChangeEvent(4, Op.AddFile, "/data/other/x.csv"),
      ChangeEvent(5, Op.RenameFile, "/data/movies/p2.parquet",
        srcPath = "/data/other/x.csv")).toDS()
    g.replay(events)

    val st = g.stateTable.collect().map(s0 => s0.path -> s0).toMap
    assert(st("/data/movies/p1.parquet").state == L.Finalized)
    assert(st("/data/other/x.csv").state == L.Deleted) // rename fan-out ran
    assert(st("/data/movies/p2.parquet").state == L.Finalized)
    assert(g.watermark() == 5 * 4 + 3) // ×4 sub-tx grid

    val snap = g.snapshot(asOfTxId = 100).collect()
    // only live files matching the filter; dest of the rename included
    assert(snap.map(_.path).sorted.toSeq ==
      Seq("/data/movies/p1.parquet", "/data/movies/p2.parquet"))
    assert(snap.forall(e => e.mode == Mode.Snapshot && e.op == Op.CloseFile))

    val status = g.snapshotStatus().collect()
    assert(status.length == 1 && status(0).getLong(2) == 2)

    // incremental: delete p1 on top of persisted state
    g.replayIncrement(Seq(
      ChangeEvent(50, Op.DeleteFile, "/data/movies/p1.parquet")).toDS())
    val st2 = g.stateTable.collect().map(s0 => s0.path -> s0).toMap
    assert(st2("/data/movies/p1.parquet").state == L.Deleted)
    assert(st2("/data/movies/p2.parquet").state == L.Finalized) // untouched
    assert(g.snapshot(200).collect().map(_.path).toSeq ==
      Seq("/data/movies/p2.parquet"))
  }
}
