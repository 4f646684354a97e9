package graft

import graft.model.{ChangeEvent, FileLifecycle => L, Op}
import graft.state.FileStateFSM
import org.scalatest.funsuite.AnyFunSuite

class FileStateFSMSpec extends AnyFunSuite {

  private def ev(tx: Long, op: String, cents: Long = 0) =
    ChangeEvent(txId = tx, op = op, path = "/f", sizeCents = cents)

  test("add → append → addBlock → close lifecycle") {
    val st = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile),
      ev(2, Op.AppendFile, cents = 500),
      ev(3, Op.AddBlock),
      ev(4, Op.AppendFile, cents = 250),
      ev(5, Op.CloseFile)))
    assert(st.state == L.Finalized)
    assert(st.dataSizeCents == 750)
    assert(st.numBlocks == 1)
    assert(st.lastTxId == 5)
    assert(st.nOps == 5 && st.nAppends == 2)
  }

  test("duplicate txId dropped (idempotent replay, F3)") {
    val st = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile),
      ev(2, Op.AppendFile, cents = 100),
      ev(2, Op.AppendFile, cents = 100), // duplicate
      ev(3, Op.CloseFile)))
    assert(st.dataSizeCents == 100 && st.nOps == 3)
  }

  test("out-of-order input replays identically (sorted by txId)") {
    val seq = Seq(ev(3, Op.CloseFile), ev(1, Op.AddFile),
      ev(2, Op.AppendFile, cents = 42))
    val a = FileStateFSM.replay("/f", seq.iterator)
    val b = FileStateFSM.replay("/f", seq.reverse.iterator)
    assert(a == b && a.state == L.Finalized && a.dataSizeCents == 42)
  }

  test("error is sticky") {
    val st = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile),
      ev(2, Op.ErrorTx),
      ev(3, Op.AppendFile, cents = 999),
      ev(4, Op.CloseFile)))
    assert(st.state == L.Error && st.dataSizeCents == 0 && st.lastTxId == 2)
  }

  test("IgnoreTx advances nothing") {
    val st = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile), ev(2, Op.IgnoreTx)))
    assert(st.state == L.New && st.lastTxId == 1 && st.nOps == 1)
  }

  test("mode rules: snapshot bootstraps only Unknown state (F5)") {
    import graft.model.Mode
    val snap = ev(10, Op.CloseFile).copy(mode = Mode.Snapshot)
    // fresh path: snapshot accepted
    val st1 = FileStateFSM.replay("/f", Iterator(snap))
    assert(st1.state == L.Finalized && st1.lastTxId == 10)
    // live path: snapshot ignored once state exists (even with higher tx)
    val st2 = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile), snap.copy(txId = 5)))
    assert(st2.state == L.New && st2.lastTxId == 1)
  }

  test("mode rules: backlog at the watermark confirms state, never re-counts (F7)") {
    import graft.model.Mode
    val base = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile), ev(2, Op.AppendFile, cents = 100)))
    // backlog close at exactly lastTxId → Finalized, counters untouched
    val closed = FileStateFSM.transition(base,
      ev(2, Op.CloseFile).copy(mode = Mode.Backlog))
    assert(closed.state == L.Finalized)
    assert(closed.dataSizeCents == 100 && closed.nOps == base.nOps)
    // backlog append at the watermark is a no-op (no double count)
    val reappend = FileStateFSM.transition(base,
      ev(2, Op.AppendFile, cents = 100).copy(mode = Mode.Backlog))
    assert(reappend == base)
    // backlog strictly after the watermark applies normally
    val advance = FileStateFSM.transition(base,
      ev(3, Op.AppendFile, cents = 50).copy(mode = Mode.Backlog))
    assert(advance.dataSizeCents == 150)
  }

  test("mode rules: ReSend is an idempotent re-emit (F5)") {
    import graft.model.Mode
    // a fresh ReSend folds exactly like New; a ReSend of an
    // already-folded tx is a silent no-op, never an anomaly
    val base = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile), ev(2, Op.AppendFile, cents = 100)))
    val resendDup = FileStateFSM.transition(base,
      ev(2, Op.AppendFile, cents = 100).copy(mode = Mode.ReSend))
    assert(resendDup == base, "duplicate ReSend must change nothing")
    val resendNew = FileStateFSM.transition(base,
      ev(3, Op.CloseFile).copy(mode = Mode.ReSend))
    assert(resendNew.state == L.Finalized && resendNew.lastTxId == 3)
  }

  test("mode rules: only Retry un-sticks an Error state (F5)") {
    import graft.model.Mode
    val errored = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile), ev(2, Op.ErrorTx)))
    assert(errored.state == L.Error)
    // live, resend and backlog traffic stays blocked by the sticky error
    for (m <- Seq(Mode.New, Mode.ReSend, Mode.Backlog)) {
      val blocked = FileStateFSM.transition(errored,
        ev(3, Op.AppendFile, cents = 50).copy(mode = m))
      assert(blocked == errored, s"mode $m must not clear Error")
    }
    // the error-channel reprocess applies its op and resumes the flow
    val retried = FileStateFSM.transition(errored,
      ev(3, Op.AppendFile, cents = 50).copy(mode = Mode.Retry))
    assert(retried.state == L.Updating && retried.dataSizeCents == 50
      && retried.lastTxId == 3)
    // a Retry at-or-below the watermark is still a duplicate → no-op
    val staleRetry = FileStateFSM.transition(errored,
      ev(2, Op.AppendFile, cents = 50).copy(mode = Mode.Retry))
    assert(staleRetry == errored)
  }

  test("delete terminal-ish: further adds recreate") {
    val st = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile), ev(2, Op.DeleteFile)))
    assert(st.state == L.Deleted)
    val st2 = FileStateFSM.replay("/f", Iterator(
      ev(1, Op.AddFile), ev(2, Op.DeleteFile), ev(3, Op.AddFile)))
    assert(st2.state == L.New) // overwrite-add (ref SourceTransactionProcessor.java:54-73)
  }
}
