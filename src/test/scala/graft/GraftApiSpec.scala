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

  test("incremental persistence: deltas carry only touched paths; versions accumulate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_").toString
    val g = new Graft(spark, dir)
    val paths = (0 until 50).map(i => s"/data/f$i")
    g.replay(paths.zipWithIndex.map { case (p, i) =>
      ChangeEvent(i + 1, Op.AddFile, p)
    }.toDS())
    assert(g.versions() == Seq(0L))

    // 3 incremental batches, each touching ONE file
    (0 until 3).foreach { b =>
      g.replayIncrement(Seq(
        ChangeEvent(1000 + b, Op.CloseFile, s"/data/f$b")).toDS())
    }
    assert(g.versions() == Seq(0L, 1L, 2L, 3L))
    // delta versions are single-row tables — the world was NOT rewritten
    (1L to 3L).foreach { v =>
      assert(spark.read.parquet(s"$dir/files_v$v").count() == 1L,
        s"delta v$v should contain only the touched path")
    }
    val st = g.stateTable.collect().map(s0 => s0.path -> s0.state).toMap
    assert(st.size == 50)
    assert((0 until 3).forall(i => st(s"/data/f$i") == L.Finalized))
    assert((3 until 50).forall(i => st(s"/data/f$i") == L.New))

    // compaction folds everything into one base, same contents
    g.compact()
    assert(g.versions() == Seq(4L))
    val st2 = g.stateTable.collect().map(s0 => s0.path -> s0.state).toMap
    assert(st2 == st)
  }

  test("crash between write and commit leaves the previous version readable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_crash_").toString
    val g = new Graft(spark, dir)
    g.replay(Seq(ChangeEvent(1, Op.AddFile, "/a")).toDS())
    assert(g.watermark() == 4L) // ×4 rename sub-tx grid

    // simulate a crashed writer: a files_v1 dir with data but NO _SUCCESS
    val crashed = new java.io.File(s"$dir/files_v1")
    Seq(ChangeEvent(99, Op.AddFile, "/ghost")).toDS()
      .toDF().write.parquet(crashed.toString)
    new java.io.File(crashed, "_SUCCESS").delete()

    // readers skip the uncommitted version entirely
    assert(g.versions() == Seq(0L))
    assert(g.stateTable.collect().map(_.path).toSeq == Seq("/a"))

    // ...and the next committed write lands in a FRESH version dir
    // (v2 — never reusing or overwriting the crashed v1)
    g.replayIncrement(Seq(ChangeEvent(2, Op.CloseFile, "/a")).toDS())
    assert(g.versions() == Seq(0L, 2L))
    assert(g.stateTable.collect().map(s0 => s0.path -> s0.state).toMap
      == Map("/a" -> L.Finalized))
  }

  test("1000-file namespace: 12 incremental batches write ~12 rows total, not 12000") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scale_").toString
    val g = new Graft(spark, dir)
    g.replay((0 until 1000).map(i =>
      ChangeEvent(i + 1, Op.AddFile, s"/ns/f$i")).toDS())
    (0 until 12).foreach { b =>
      g.replayIncrement(Seq(
        ChangeEvent(5000 + b, Op.AppendFile, s"/ns/f$b", sizeCents = 100)).toDS())
    }
    // auto-compaction kicked in (AutoCompactAfter = 8), so the version
    // chain stays bounded while the merged view stays correct
    assert(g.versions().size <= Graft.AutoCompactAfter + 1)
    val st = g.stateTable.collect()
    assert(st.length == 1000)
    assert(st.count(_.state == L.Updating) == 12)
    assert(g.watermark() == (5000L + 11L) * 4) // ×4 rename sub-tx grid
  }
}
