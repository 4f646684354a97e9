package graft

import graft.model.{ChangeEvent, Mode, Op}
import graft.streaming.ChangeDeltaCodec
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the protobuf wire codec to the reference's `DFSChangeDelta`
  * format (`common/src/main/proto/data_block.proto`):
  *
  *  1. BYTE-LEVEL fixture — encode() must produce exactly the canonical
  *     protobuf-java serialization of a known envelope (fields in
  *     field-number order, required fields always present), hand-built
  *     here from the .proto's field numbers, independent of the codec's
  *     own writer;
  *  2. decode tolerates arbitrary field order and unknown fields — the
  *     wire contract, since a real hcdc producer may carry fields the
  *     rebuild doesn't model (e.g. `fileType`, `schemaLocation`);
  *  3. round-trip property over all 11 payload types × modes;
  *  4. the reference's unknown-type MessagingError contract.
  */
class ChangeDeltaCodecSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // ── independent hand-rolled wire bytes (the fixture oracle) ─────────
  private def vint(v: Long): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = v
    var go = true
    while (go) {
      val b = (x & 0x7f).toInt; x = x >>> 7
      if (x != 0) out += (b | 0x80).toByte else { out += b.toByte; go = false }
    }
    out.toArray
  }
  private def fld(n: Int, wire: Int): Array[Byte] = vint((n.toLong << 3) | wire)
  private def i64(n: Int, v: Long): Array[Byte] = fld(n, 0) ++ vint(v)
  private def ld(n: Int, b: Array[Byte]): Array[Byte] =
    fld(n, 2) ++ vint(b.length.toLong) ++ b
  private def str(n: Int, s: String): Array[Byte] = ld(n, s.getBytes("UTF-8"))

  test("encode == canonical protobuf-java bytes for a DFSAddFile envelope") {
    val ev = ChangeEvent(txId = 42L, op = Op.AddFile, path = "/data/a.parquet",
      mode = Mode.New, sizeCents = 12345L, ts = 1700000000000L)
    // data_block.proto field numbers, assembled independently:
    val tx = i64(1, 42L) ++ i64(2, 0L) ++ i64(3, 1700000000000L) // DFSTransaction
    val file = str(2, "/data/a.parquet") ++ i64(3, 0L) // DFSFile
    val body = ld(1, tx) ++ ld(2, file) ++
      i64(3, 12345L) ++ i64(4, 0L) ++ // length, blockSize
      i64(5, 1700000000000L) ++ i64(6, 1700000000000L) // mtime, atime
    val envelope = str(1, "ns") ++ str(2, "42") ++ str(3, "/data/a.parquet") ++
      str(4, "ai.sapper.hcdc.common.model.DFSAddFile") ++
      i64(5, 1700000000000L) ++ ld(6, body)
    assert(java.util.Arrays.equals(ChangeDeltaCodec.encode(ev, "ns"), envelope),
      "wire bytes diverge from the canonical serialization")
    assert(ChangeDeltaCodec.decode(envelope, "ns:New:42:0") === ev)
  }

  test("encode matches Google's own CodedOutputStream serialization") {
    // ORC ships a relocated copy of protobuf-java — an INDEPENDENT
    // implementation of tag/varint/length-delim encoding to pin the
    // hand-rolled writer against (the fixture test above hand-builds
    // bytes with the same helper style as the codec; this one uses
    // Google's encoder, so a shared misconception would be caught)
    import org.apache.orc.protobuf.{ByteString, CodedOutputStream}
    def bytesOf(f: CodedOutputStream => Unit): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val c = CodedOutputStream.newInstance(bos)
      f(c); c.flush(); bos.toByteArray
    }
    val ts = 1700000000123L
    val ev = ChangeEvent(7L, Op.CloseFile, "/data/b.avro", Mode.New,
      sizeCents = 777L, ts = ts)
    val tx = bytesOf { c =>
      c.writeInt64(1, 7L); c.writeEnum(2, 2); c.writeUInt64(3, ts) }
    val file = bytesOf { c => c.writeString(2, "/data/b.avro"); c.writeInt64(3, 0L) }
    val body = bytesOf { c =>
      c.writeBytes(1, ByteString.copyFrom(tx))
      c.writeBytes(2, ByteString.copyFrom(file))
      c.writeUInt64(3, 777L); c.writeUInt64(4, 0L)
      c.writeUInt64(5, ts); c.writeUInt64(6, ts) }
    val envelope = bytesOf { c =>
      c.writeString(1, "ns"); c.writeString(2, "7")
      c.writeString(3, "/data/b.avro")
      c.writeString(4, "ai.sapper.hcdc.common.model.DFSCloseFile")
      c.writeUInt64(5, ts)
      c.writeBytes(6, ByteString.copyFrom(body)) }
    assert(java.util.Arrays.equals(ChangeDeltaCodec.encode(ev, "ns"), envelope),
      "codec bytes diverge from protobuf-java's canonical encoding")
  }

  test("decode tolerates reordered and unknown fields (forward compat)") {
    // same DFSAddFile, fields deliberately OUT of order plus an unknown
    // field 9 (string) in DFSFile and an unknown fixed64 in the envelope
    val tx = i64(3, 99L) ++ i64(1, 7L) ++ i64(2, 0L)
    val file = str(9, "application/parquet") ++ i64(3, 1234L) ++ str(2, "/x")
    val body = i64(3, 500L) ++ ld(2, file) ++ ld(1, tx) ++
      i64(4, 0L) ++ i64(5, 0L) ++ i64(6, 0L)
    val envelope = str(4, "ai.sapper.hcdc.common.model.DFSAddFile") ++
      ld(6, body) ++ str(1, "ns") ++
      (fld(15, 1) ++ Array.fill[Byte](8)(0x11)) // unknown fixed64 field
    val ev = ChangeDeltaCodec.decode(envelope)
    assert(ev.txId === 7L)
    assert(ev.ts === 99L)
    assert(ev.path === "/x")
    assert(ev.sizeCents === 500L)
    assert(ev.mode === Mode.New) // no message id → live
  }

  test("reference-producer shapes: multi-block UpdateBlocks sums deltas; truncate newLength wins") {
    // shapes a real hcdc producer emits but our encoder never writes —
    // hand-built from the .proto field numbers
    def blk(id: Long, end: Long, delta: Long): Array[Byte] =
      i64(1, id) ++ i64(2, math.max(end, 0)) ++ i64(3, 0) ++ i64(4, 0) ++
        i64(5, 0) ++ i64(6, end) ++ (if (delta != 0) i64(7, delta) else Array.emptyByteArray)
    val tx = i64(1, 9L) ++ i64(2, 5L) ++ i64(3, 1L)
    val file = str(2, "/f") ++ i64(3, 0L)
    // DFSUpdateBlocks with TWO blocks: deltas 100 and 200
    val upBody = ld(1, tx) ++ ld(2, file) ++
      ld(3, blk(7, 50, 100)) ++ ld(3, blk(8, 90, 200))
    val upEnv = str(4, "ai.sapper.hcdc.common.model.DFSUpdateBlocks") ++ ld(6, upBody)
    val up = ChangeDeltaCodec.decode(upEnv)
    assert(up.sizeCents === 300L, "repeated blocks' deltaSizes must sum")
    assert(up.blockId === 7L, "first block keeps the event identity")
    // DFSTruncateBlock where block.endOffset (50) != newLength (4096)
    val trBody = ld(1, tx) ++ ld(2, file) ++ ld(3, blk(7, 50, 0)) ++ i64(4, 4096L)
    val trEnv = str(4, "ai.sapper.hcdc.common.model.DFSTruncateBlock") ++ ld(6, trBody)
    val tr = ChangeDeltaCodec.decode(trEnv)
    assert(tr.endOffset === 4096L, "newLength (field 4) is authoritative")
  }

  test("corrupted length prefixes fail loudly, never decode garbage") {
    val good = ChangeDeltaCodec.encode(
      ChangeEvent(5L, Op.AddFile, "/data/x", Mode.New, 10L, 7L), "ns")
    // flip the envelope's namespace length byte to point past the end
    val corrupt = good.clone()
    corrupt(1) = 125.toByte // was len("ns") = 2
    val e = intercept[IllegalArgumentException] {
      ChangeDeltaCodec.decode(corrupt)
    }
    assert(e.getMessage.contains("malformed protobuf"))
  }

  test("unknown payload type throws (ChangeDeltaSerDe contract)") {
    val envelope = str(4, "ai.sapper.hcdc.common.model.DFSNope") ++
      ld(6, Array.emptyByteArray)
    val e = intercept[IllegalArgumentException] {
      ChangeDeltaCodec.decode(envelope)
    }
    assert(e.getMessage.contains("invalid message type"))
  }

  test("mode rides the message id (namespace:mode:txId:id)") {
    val ev = ChangeEvent(1L, Op.CloseFile, "/f", Mode.Snapshot, 0L, 5L)
    val bytes = ChangeDeltaCodec.encode(ev, "ns")
    assert(ChangeDeltaCodec.decode(bytes, "ns:Snapshot:1:0").mode === Mode.Snapshot)
    assert(ChangeDeltaCodec.decode(bytes, "ns:Backlog:1:0").mode === Mode.Backlog)
    assert(ChangeDeltaCodec.decode(bytes, null).mode === Mode.New)
    assert(ChangeDeltaCodec.decode(bytes, "garbage").mode === Mode.New)
  }

  test("DFSAppendFile refuses a size it cannot carry on the wire") {
    val e = intercept[IllegalArgumentException] {
      ChangeDeltaCodec.encode(
        ChangeEvent(1L, Op.AppendFile, "/f", sizeCents = 10L), "ns")
    }
    assert(e.getMessage.contains("UpdateBlocks"))
  }

  // ── round-trip property over every payload type ─────────────────────
  private val genMode: Gen[String] = Gen.oneOf(Mode.all.toSeq)
  private val genPath: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(cs => "/" + cs.mkString)

  /** Events constrained to what each payload type can carry (documented
    * in the codec's scaladoc): AppendFile has no size slot; only
    * AddBlock transports prevBlockId; only block ops transport
    * block/offsets; renames carry srcPath. */
  private val genEvent: Gen[ChangeEvent] = for {
    op <- Gen.oneOf(Op.all)
    tx <- Gen.choose(1L, 1000000L)
    ts <- Gen.choose(0L, 2000000000000L)
    path <- genPath
    src <- genPath
    mode <- genMode
    size <- Gen.choose(0L, 5000000L)
    blockId <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 99999L))
    start <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 1 << 20))
    prev <- Gen.choose(0L, 99999L)
    hasPrev <- Gen.oneOf(true, false)
  } yield {
    val base = ChangeEvent(tx, op, path, mode, 0L, ts)
    op match {
      case Op.AddFile | Op.CloseFile =>
        if (blockId >= 0)
          base.copy(sizeCents = size, blockId = blockId,
            startOffset = start, endOffset = start + 10)
        else base.copy(sizeCents = size)
      case Op.AppendFile => base.copy(blockId = if (blockId >= 0) 0L else -1L)
      case Op.DeleteFile | Op.IgnoreTx | Op.ErrorTx => base
      case Op.AddBlock =>
        base.copy(sizeCents = size, blockId = math.max(blockId, 0L),
          startOffset = start, endOffset = start + 10,
          prevBlockId = if (hasPrev) prev else -1L)
      case Op.UpdateBlocks | Op.TruncateBlock =>
        base.copy(sizeCents = size, blockId = blockId,
          startOffset = start, endOffset = start + 10)
      case Op.RenameFile => base.copy(sizeCents = size, srcPath = src)
      case Op.ChangeData => base.copy(srcPath = src)
      case _ => base
    }
  }

  test("decode(encode(e)) == e for every payload type × mode") {
    check(Prop.forAll(genEvent) { e =>
      val bytes = ChangeDeltaCodec.encode(e, "graft")
      val id = ChangeDeltaCodec.messageIdOf(e, "graft")
      ChangeDeltaCodec.decode(bytes, id) == e
    })
  }

  test("encodeRecords/decodeRecords round-trip through Spark") {
    implicit val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
    import spark.implicits._
    val evs = Seq(
      ChangeEvent(1L, Op.AddFile, "/a", Mode.Snapshot, 100L, 10L),
      ChangeEvent(2L, Op.UpdateBlocks, "/a", Mode.New, 250L, 11L,
        blockId = 7L, startOffset = 0L, endOffset = 10L),
      ChangeEvent(3L, Op.RenameFile, "/b", Mode.Backlog, 0L, 12L,
        srcPath = "/a"),
      ChangeEvent(4L, Op.CloseFile, "/b", Mode.New, 0L, 13L),
      ChangeEvent(5L, Op.IgnoreTx, "/c", Mode.New, 0L, 14L))
    val records = ChangeDeltaCodec.encodeRecords(evs.toDS(), "ns")
    assert(records.columns.toSeq === Seq("key", "message_id", "value"))
    // entity key drives partition ordering (K2): rename keys by SRC path
    val keys = records.select("key").as[String].collect().sorted
    assert(keys.contains("/a"))
    val back = ChangeDeltaCodec.decodeRecords(records)
      .collect().sortBy(_.txId).toSeq
    assert(back === evs)
  }
}
