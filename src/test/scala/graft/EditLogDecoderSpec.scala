package graft

import graft.ingest.{EditLogDecoder, EditsFileFinder}
import graft.model.{FileLifecycle, Op}
import org.scalatest.funsuite.AnyFunSuite

/** Decodes the reference repo's REAL binary HDFS edit-log fixtures
  * (`namenode-agent/src/test/resources/edits/logs/` — finalized +
  * in-progress segments written by an actual NameNode, layout -63) and
  * replays them through the keyed FSM. */
class EditLogDecoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val fixtures =
    "/root/reference/change-manager/namenode-agent/src/test/resources/edits/logs"
  private val deleteDir = s"$fixtures/delete/current"
  private val currentDir = s"$fixtures/current"

  private def segBytes(dir: String, name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name))

  private def listNames(dir: String): Seq[String] =
    new java.io.File(dir).list().toSeq

  test("every fixture op decodes with a valid CRC32") {
    for {
      dir <- Seq(deleteDir, currentDir)
      name <- listNames(dir) if name.startsWith("edits_")
    } {
      val ops = EditLogDecoder.decodeSegment(segBytes(dir, name))
      assert(ops.nonEmpty, s"$name decoded no ops")
      assert(ops.forall(_.crcOk), s"$name has CRC failures")
      // txids consecutive within a segment
      assert(ops.map(_.txId) == (ops.head.txId to ops.last.txId))
    }
  }

  test("decodes the full create->write->close->rename lifecycle of a real file") {
    val ops = EditLogDecoder.decodeSegment(
      segBytes(deleteDir, "edits_0000000000000028321-0000000000000028329"))
    val byCode = ops.map(o => o.txId -> o.opName).toMap
    assert(byCode(28323L) == "OP_ADD")
    assert(byCode(28326L) == "OP_ADD_BLOCK")
    assert(byCode(28327L) == "OP_CLOSE")
    assert(byCode(28328L) == "OP_RENAME_OLD")

    val add = ops.find(_.txId == 28323L).get
    assert(add.path == "/test/hcdc/loader/parquet/links_2.parquet._COPYING_")
    assert(add.inodeId == 17111L)
    assert(add.blockSize == 8388608L)
    assert(add.overwrite)

    val addBlock = ops.find(_.txId == 28326L).get
    assert(addBlock.blocks.map(_.blockId) == Seq(1073742463L))

    val close = ops.find(_.txId == 28327L).get
    assert(close.blocks == Seq(
      EditLogDecoder.EditBlock(1073742463L, 1036349L, 1663L)))

    val ren = ops.find(_.txId == 28328L).get
    assert(ren.path.endsWith("._COPYING_") &&
      ren.dst == "/test/hcdc/loader/parquet/links_2.parquet")
  }

  test("delete segment decodes paths and timestamps") {
    val ops = EditLogDecoder.decodeSegment(
      segBytes(deleteDir, "edits_0000000000000028318-0000000000000028320"))
    val del = ops.find(_.opName == "OP_DELETE").get
    assert(del.path == "/test/hcdc/loader/parquet/links/2022/07/26/21/19")
    assert(del.mtime > 1600000000000L)
  }

  test("tx-range filter skips ops outside the range (S3)") {
    val ops = EditLogDecoder.decodeSegment(
      segBytes(deleteDir, "edits_0000000000000028321-0000000000000028329"),
      startTx = 28323L, endTx = 28327L)
    assert(ops.map(_.txId) == (28323L to 28327L))
  }

  test("in-progress segment (0xff preallocated tail) terminates cleanly") {
    val names = listNames(deleteDir)
    val cur = EditsFileFinder.currentSegment(names).get
    val ops = EditLogDecoder.decodeSegment(segBytes(deleteDir, cur.name))
    assert(ops.nonEmpty && ops.forall(_.crcOk))
  }

  test("distributed read composes finder pruning + decode + event mapping") {
    implicit val s = spark
    val events = EditLogDecoder.read(spark, deleteDir).collect()
    assert(events.nonEmpty)
    // untracked segment bookkeeping ops become IgnoreTx (watermark still
    // advances), tracked ops became typed events
    assert(events.count(_.op == Op.IgnoreTx) > 0)
    assert(events.exists(_.op == Op.AddFile))
    assert(events.exists(_.op == Op.DeleteFile))
    // range pruning: asking past the last txid reads nothing
    val none = EditLogDecoder.read(spark, deleteDir, startTx = 99999999L)
      .collect()
    assert(none.forall(_.txId >= 99999999L) && none.isEmpty)
  }

  test("corruption is detected, not silently accepted (CRC32 per op)") {
    val good = segBytes(deleteDir, "edits_0000000000000028318-0000000000000028320")
    // flip one byte inside the DELETE op's path
    val bad = good.clone()
    bad(0x30) = (bad(0x30) ^ 0x01).toByte
    val ops = EditLogDecoder.decodeSegment(bad)
    assert(ops.exists(!_.crcOk), "corrupted op must fail its checksum")
    assert(EditLogDecoder.decodeSegment(good).forall(_.crcOk))
  }

  test("corrupt FRAMING (length field / truncation) flags, never throws") {
    val good = segBytes(deleteDir, "edits_0000000000000028318-0000000000000028320")
    // blow up the second op's length field (offset 0x19 is its opcode)
    val badLen = good.clone()
    badLen(0x1b) = 0x7f.toByte // length now ~8M, far past the segment
    val ops = EditLogDecoder.decodeSegment(badLen)
    assert(ops.nonEmpty && !ops.last.crcOk,
      "oversized length must surface as a failed op, not an exception")
    // truncate the file mid-op (no 0xff padding)
    val truncated = good.take(good.length - 7)
    val ops2 = EditLogDecoder.decodeSegment(truncated)
    assert(!ops2.last.crcOk)
  }

  test("OP_RENAME (the options-carrying variant) decodes TO_TRASH/OVERWRITE") {
    // no fixture carries opcode 15 (they all use RENAME_OLD), so build a
    // frame-exact synthetic segment: same framing, real CRC32
    def op15(txId: Long, src: String, dst: String,
        opts: Seq[Int]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(bo)
      d.writeLong(txId)
      d.writeShort(src.length); d.write(src.getBytes("UTF-8"))
      d.writeShort(dst.length); d.write(dst.getBytes("UTF-8"))
      d.writeLong(1660000000000L)
      d.writeInt(opts.size); opts.foreach(d.writeByte)
      d.writeShort(0); d.writeInt(-2) // rpcIds: empty clientId, callId -2
      val body = bo.toByteArray
      val head = new java.io.ByteArrayOutputStream()
      val h = new java.io.DataOutputStream(head)
      h.writeByte(15); h.writeInt(body.length + 4)
      val framed = head.toByteArray ++ body
      val crc = new java.util.zip.CRC32(); crc.update(framed)
      val tail = new java.io.ByteArrayOutputStream()
      new java.io.DataOutputStream(tail).writeInt(crc.getValue.toInt)
      framed ++ tail.toByteArray
    }
    val seg = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xc1.toByte,
      0, 0, 0, 0) ++ op15(101L, "/a/x", "/b/x", Seq(2)) ++
      op15(102L, "/a/y", "/b/y", Seq(1))
    val ops = EditLogDecoder.decodeSegment(seg)
    assert(ops.forall(_.crcOk))
    assert(ops(0).opName == "OP_RENAME" &&
      ops(0).renameOptions == Seq("TO_TRASH") && !ops(0).overwrite)
    assert(ops(1).renameOptions == Seq("OVERWRITE") && ops(1).overwrite)
    val ev = EditLogDecoder.toChangeEvent(ops(0))
    assert(ev.op == Op.RenameFile && ev.path == "/b/x" && ev.srcPath == "/a/x")
  }

  test("real fixture events replay through the FSM to the expected lifecycle") {
    implicit val s = spark
    import s.implicits._
    val events = EditLogDecoder.read(spark, deleteDir)
      .filter(_.op != Op.IgnoreTx)
    val states = graft.state.FileStateFSM.replayAll(events)
      .collect().map(st => st.path -> st).toMap
    // the file that was created, written, closed under its ._COPYING_
    // name: the rename event is keyed on the DEST path, so the temp path
    // ends Finalized and the dest path carries the rename op
    val tmp = states("/test/hcdc/loader/parquet/links_2.parquet._COPYING_")
    assert(tmp.state == FileLifecycle.Finalized)
    assert(tmp.numBlocks == 1L)
    // deleted dirs end Deleted
    val del = states("/test/hcdc/loader/parquet/links/2022/07/26/21/19")
    assert(del.state == FileLifecycle.Deleted)
  }
}
