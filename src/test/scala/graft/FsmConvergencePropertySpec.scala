package graft

import graft.model.{ChangeEvent, FileState, Mode, Op}
import graft.state.FileStateFSM
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property form of the T4/T6 convergence invariants, driver-side (the
  * fold is pure, so no Spark session is needed to pin its algebra):
  *
  *  1. snapshot-then-replay == replay-from-scratch at EVERY split point
  *     (q28 checks two fixed splits at gate scale; this samples random
  *     histories × random splits);
  *  2. duplicate re-delivery is idempotent (at-least-once upstream);
  *  3. replaying an already-replayed suffix changes nothing
  *     (exactly-once-ish sink retries).
  */
class FsmConvergencePropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property (no scalatest bridge on the classpath). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val genOp: Gen[String] = Gen.frequency(
    3 -> Op.AddFile, 5 -> Op.AppendFile, 2 -> Op.AddBlock,
    2 -> Op.UpdateBlocks, 1 -> Op.TruncateBlock, 2 -> Op.CloseFile,
    1 -> Op.DeleteFile, 1 -> Op.IgnoreTx, 1 -> Op.ErrorTx)

  private val genHistory: Gen[List[ChangeEvent]] = for {
    n <- Gen.choose(1, 40)
    ops <- Gen.listOfN(n, genOp)
    blocks <- Gen.listOfN(n, Gen.choose(100L, 104L))
    sizes <- Gen.listOfN(n, Gen.choose(0L, 500L))
  } yield ops.zip(blocks).zip(sizes).zipWithIndex.map {
    case (((op, b), sz), i) =>
      ChangeEvent(i + 1L, op, "/f", Mode.New, sizeCents = sz,
        blockId = if (op == Op.AddBlock || op == Op.UpdateBlocks) b else -1L,
        startOffset = 0L, endOffset = sz)
  }

  private def fold(evs: Seq[ChangeEvent]): FileState =
    evs.foldLeft(FileState("/f"))(FileStateFSM.transition)

  test("bootstrap at any split point converges to full replay") {
    check(Prop.forAll(genHistory, Gen.choose(0, 40)) { (h, splitRaw) =>
      val split = math.min(splitRaw, h.size)
      val (pre, post) = h.splitAt(split)
      val viaBootstrap = post.foldLeft(fold(pre))(FileStateFSM.transition)
      viaBootstrap == fold(h)
    })
  }

  test("duplicate re-delivery of any prefix is a no-op") {
    check(Prop.forAll(genHistory, Gen.choose(1, 40)) { (h, kRaw) =>
      val k = math.min(kRaw, h.size)
      // deliver the first k events twice, interleaved at the end
      fold(h ++ h.take(k)) == fold(h)
    })
  }

  test("ReSend re-delivery of any prefix is a no-op (F5 ReSend mode)") {
    check(Prop.forAll(genHistory, Gen.choose(1, 40)) { (h, kRaw) =>
      val k = math.min(kRaw, h.size)
      // same re-delivery, explicitly flagged as the producer's re-emit
      fold(h ++ h.take(k).map(_.copy(mode = Mode.ReSend))) == fold(h)
    })
  }

  test("Retry reprocesses a suffix past a sticky error (F5 Retry mode)") {
    check(Prop.forAll(genHistory) { h0 =>
      // an error lands after a prefix; the suffix is then reprocessed on
      // the error channel (mode = Retry, fresh txIds). Every suffix op
      // must fold — the sticky error blocks only non-Retry traffic.
      val h = h0.filter(_.op != Op.ErrorTx)
      val (pre, post) = h.splitAt(h.size / 2)
      val errored = fold(pre :+ ChangeEvent(1000000L, Op.ErrorTx, "/f"))
      val retried = post.zipWithIndex.map { case (e, i) =>
        e.copy(mode = Mode.Retry, txId = 2000000L + i)
      }.foldLeft(errored)(FileStateFSM.transition)
      def nonIgnore(s: Seq[ChangeEvent]) = s.count(_.op != Op.IgnoreTx)
      retried.nOps == nonIgnore(pre) + 1 + nonIgnore(post) &&
        (post.forall(_.op == Op.IgnoreTx) ||
          retried.state != graft.model.FileLifecycle.Error)
    })
  }

  test("replaying the full history twice equals replaying it once") {
    check(Prop.forAll(genHistory) { h => fold(h ++ h) == fold(h) })
  }

  test("a backlog event at the watermark confirms but never double-counts") {
    check(Prop.forAll(genHistory) { h =>
      val st = fold(h)
      if (st.state == graft.model.FileLifecycle.Error || st.lastTxId < 0) true
      else {
        val backlog = ChangeEvent(st.lastTxId, Op.CloseFile, "/f",
          Mode.Backlog, sizeCents = 999L)
        val st2 = FileStateFSM.transition(st, backlog)
        st2.dataSizeCents == st.dataSizeCents && st2.nOps == st.nOps &&
          (st2.state == graft.model.FileLifecycle.Finalized ||
            st2.state == st.state)
      }
    })
  }
}
