package graft

import graft.ingest.EditsFileFinder
import org.scalatest.funsuite.AnyFunSuite

/** Range cases mirror the reference's DFSEditsFileFinderTest (7/17,
  * -1/17, 17/-1) over HDFS-style segment names. */
class EditsFileFinderSpec extends AnyFunSuite {
  private def seg(s: Long, e: Long) =
    f"edits_$s%019d-$e%019d"
  private val names = Seq(
    seg(1, 6), seg(7, 12), seg(13, 17), seg(18, 25),
    f"edits_inprogress_${26L}%019d", "fsimage_0000000000000000025",
    "seen_txid", "VERSION")

  test("range 7..17 selects middle segments") {
    val found = EditsFileFinder.findEditsFiles(names, 7, 17)
    assert(found.map(s => (s.startTx, s.endTx)) == Seq((7L, 12L), (13L, 17L)))
  }

  test("open start -1..17 selects from the beginning") {
    val found = EditsFileFinder.findEditsFiles(names, -1, 17)
    assert(found.head.startTx == 1L && found.size == 3)
  }

  test("open end 17..-1 selects through in-progress") {
    val found = EditsFileFinder.findEditsFiles(names, 17, -1)
    assert(found.map(_.startTx) == Seq(13L, 18L, 26L))
    assert(found.last.inProgress)
  }

  test("current segment + seen_txid parsing") {
    assert(EditsFileFinder.currentSegment(names).exists(_.startTx == 26L))
    assert(EditsFileFinder.parseSeenTxId(" 12345\n").contains(12345L))
    assert(EditsFileFinder.parseSeenTxId("garbage").isEmpty)
    assert(EditsFileFinder.parse("edits_bogus").isEmpty)
  }
}
