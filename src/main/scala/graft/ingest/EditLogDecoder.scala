package graft.ingest

import graft.model.{ChangeEvent, Mode, Op}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Binary HDFS edit-log segment decoder (SURVEY §2.1 S2) — reads the
  * NameNode journal format directly (layout version -63, the format of
  * the reference's test fixtures at
  * `namenode-agent/src/test/resources/edits/`), with no dependency on
  * the HDFS server jars the reference links against
  * (`hdfs-agent/tools/offlineEditsViewer/EditsLogReader.java:24-55`,
  * `hdfs-agent/server/namenode/DFSEditLogParser.java:90-136`).
  *
  * Wire format (validated byte-for-byte against the reference fixtures):
  * {{{
  *   file   := layoutVersion:i32(-63) layoutFlags:i32 op* (0xff padding)*
  *   op     := opcode:u8 length:i32 txid:i64 body checksum:u32
  *             -- length covers txid + body + checksum
  *   checksum = CRC32 over [opcode..body]
  * }}}
  * Strings are ushort-length UTF-8 (`DeprecatedUTF8`) except
  * PermissionStatus user/group which are vint-length (`Text`); block
  * arrays in ADD/CLOSE are fixed (i64 id, i64 bytes, i64 genStamp);
  * ADD_BLOCK/UPDATE_BLOCKS use the compact form (vint count; per block:
  * i64 id, vlong size-delta, vlong genStamp-delta).
  *
  * The 9 tracked opcodes map to typed [[ChangeEvent]]s exactly as the
  * reference's dispatch does (`DFSEditLogParser.java:109-131`); every
  * other opcode becomes IgnoreTx (`:138-148`) so the transaction
  * watermark still advances.
  *
  * Scale shape: one segment file = one decode task (`binaryFile` source,
  * `flatMap`); segment selection happens before the scan via
  * [[EditsFileFinder]] so only files overlapping the requested tx range
  * are read at all (S1+S3 pushdown composed outside the engine).
  */
object EditLogDecoder {

  val LayoutVersion = -63

  final case class EditBlock(blockId: Long, numBytes: Long, genStamp: Long)

  /** One decoded journal transaction. `renameOptions` carries the
    * OP_RENAME option bytes as names (NONE/OVERWRITE/TO_TRASH — the
    * reference maps these in `DFSEditLogParser.handleOpRename`). */
  final case class EditOp(
      txId: Long,
      opCode: Int,
      opName: String,
      path: String = "",
      dst: String = "",
      inodeId: Long = -1L,
      mtime: Long = 0L,
      blockSize: Long = 0L,
      newLength: Long = -1L,
      overwrite: Boolean = false,
      blocks: Seq[EditBlock] = Nil,
      renameOptions: Seq[String] = Nil,
      crcOk: Boolean = true)

  // FSEditLogOpCodes values for the tracked ops
  val OpAdd = 0
  val OpRenameOld = 1
  val OpDelete = 2
  val OpClose = 9
  val OpRename = 15
  val OpEndLogSegment = 23
  val OpStartLogSegment = 24
  val OpUpdateBlocks = 25
  val OpAddBlock = 33
  val OpTruncate = 46
  val OpAppend = 47

  private val opNames = Map(
    OpAdd -> "OP_ADD", OpRenameOld -> "OP_RENAME_OLD",
    OpDelete -> "OP_DELETE", OpClose -> "OP_CLOSE",
    OpRename -> "OP_RENAME", OpEndLogSegment -> "OP_END_LOG_SEGMENT",
    OpStartLogSegment -> "OP_START_LOG_SEGMENT",
    OpUpdateBlocks -> "OP_UPDATE_BLOCKS", OpAddBlock -> "OP_ADD_BLOCK",
    OpTruncate -> "OP_TRUNCATE", OpAppend -> "OP_APPEND")

  /** Big-endian cursor over a segment's bytes. */
  private final class Reader(val b: Array[Byte], var o: Int) {
    def u8(): Int = { val v = b(o) & 0xff; o += 1; v }
    def u16(): Int = { val v = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff); o += 2; v }
    def i32(): Int = {
      val v = ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      o += 4; v
    }
    def i64(): Long = { val v = (i32().toLong << 32) | (i32().toLong & 0xffffffffL); v }
    def str(): String = { // DeprecatedUTF8: ushort length + UTF-8
      val n = u16(); val v = new String(b, o, n, "UTF-8"); o += n; v
    }
    def text(): String = { // Hadoop Text: vint length + UTF-8
      val n = vlong().toInt; val v = new String(b, o, n, "UTF-8"); o += n; v
    }
    def vlong(): Long = { // WritableUtils.readVLong
      val fb = b(o).toInt; o += 1
      if (fb >= -112) fb.toLong
      else {
        val len = if (fb >= -120) -112 - fb else -120 - fb
        val neg = fb < -120
        var v = 0L
        var i = 0
        while (i < len) { v = (v << 8) | (b(o) & 0xffL); o += 1; i += 1 }
        if (neg) ~v else v
      }
    }
  }

  private def fixedBlocks(r: Reader): Seq[EditBlock] = {
    val n = r.i32()
    (0 until n).map(_ => EditBlock(r.i64(), r.i64(), r.i64()))
  }

  private def compactBlocks(r: Reader): Seq[EditBlock] = {
    // FSImageSerialization.readCompactBlockArray: sizes/genstamps are
    // deltas against the previous block
    val n = r.vlong().toInt
    var sz = 0L
    var gs = 0L
    (0 until n).map { _ =>
      val id = r.i64(); sz += r.vlong(); gs += r.vlong()
      EditBlock(id, sz, gs)
    }
  }

  /** Decode one segment. Ops outside [startTx, endTx] are skipped (-1 =
    * open bound — the in-scan tx filter S3,
    * `DFSEditLogParser.java:131-136`); 0xff padding (preallocated
    * in-progress tail) terminates the scan. */
  def decodeSegment(bytes: Array[Byte], startTx: Long = -1L,
      endTx: Long = -1L): Seq[EditOp] = {
    val r = new Reader(bytes, 0)
    val ver = r.i32()
    require(ver == LayoutVersion,
      s"unsupported edit-log layout version $ver (expected $LayoutVersion)")
    r.i32() // layout flags
    val out = Seq.newBuilder[EditOp]
    var halted = false
    while (!halted && r.o < bytes.length && (bytes(r.o) & 0xff) != 0xff) {
      val start = r.o
      val opc = r.u8()
      // framing guard: a corrupted/truncated length field must flag the
      // op and stop the scan, not crash the decode task
      if (r.o + 4 > bytes.length) {
        out += EditOp(-1L, opc, opNames.getOrElse(opc, s"OP_$opc"),
          crcOk = false)
        halted = true
      } else {
      val length = r.i32()
      // Long arithmetic: a corrupted length near Int.MaxValue must not
      // overflow the bounds check and sneak past the guard
      val bodyEndL = r.o.toLong + length.toLong - 4L
      if (length < 12 || bodyEndL + 4L > bytes.length) {
        out += EditOp(-1L, opc, opNames.getOrElse(opc, s"OP_$opc"),
          crcOk = false)
        halted = true
      } else {
      val bodyEnd = bodyEndL.toInt
      val txId = r.i64()
      val base = EditOp(txId, opc, opNames.getOrElse(opc, s"OP_$opc"))
      val op = try {
        opc match {
          case OpAdd | OpClose =>
            val inode = r.i64(); val path = r.str(); r.u16() // replication
            val mtime = r.i64(); r.i64() // atime
            val blockSize = r.i64()
            val blocks = fixedBlocks(r)
            r.text(); r.text(); r.u16() // PermissionStatus
            val overwrite = if (opc == OpAdd) {
              val acl = r.i32() // ACL entry count (entries unsupported)
              require(acl == 0, s"ACL entries not supported ($acl)")
              val xattrLen = r.vlong().toInt // 1-byte varints coincide
              r.o += xattrLen
              r.str(); r.str() // clientName, clientMachine
              r.u8() != 0
            } else false
            base.copy(path = path, inodeId = inode, mtime = mtime,
              blockSize = blockSize, blocks = blocks, overwrite = overwrite)
          case OpDelete =>
            base.copy(path = r.str(), mtime = r.i64())
          case OpUpdateBlocks | OpAddBlock =>
            base.copy(path = r.str(), blocks = compactBlocks(r))
          case OpAppend =>
            val path = r.str(); r.str(); r.str() // client, machine
            base.copy(path = path, overwrite = r.u8() != 0) // newBlock flag
          case OpTruncate =>
            val path = r.str(); r.str(); r.str()
            base.copy(path = path, newLength = r.i64(), mtime = r.i64())
          case OpRenameOld =>
            base.copy(path = r.str(), dst = r.str(), mtime = r.i64())
          case OpRename =>
            val (src, dst, ts) = (r.str(), r.str(), r.i64())
            // options ride as BytesWritable: i32 count + one ordinal
            // byte per Options.Rename value
            val n = r.i32()
            val opts = (0 until n).map(_ => r.u8() match {
              case 1 => "OVERWRITE"
              case 2 => "TO_TRASH"
              case _ => "NONE"
            })
            base.copy(path = src, dst = dst, mtime = ts,
              renameOptions = opts, overwrite = opts.contains("OVERWRITE"))
          case _ => base
        }
      } catch { // undecodable body → IgnoreTx-shaped op, txId preserved
        case _: Exception => base
      }
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, start, bodyEnd - start)
      val stored = ((bytes(bodyEnd) & 0xffL) << 24) |
        ((bytes(bodyEnd + 1) & 0xffL) << 16) |
        ((bytes(bodyEnd + 2) & 0xffL) << 8) | (bytes(bodyEnd + 3) & 0xffL)
      val inRange = (startTx < 0 || txId >= startTx) &&
        (endTx < 0 || txId <= endTx)
      if (inRange) out += op.copy(crcOk = crc.getValue == stored)
      r.o = bodyEnd + 4
      } }
    }
    out.result()
  }

  /** Map a decoded journal op to the pipeline's typed event, mirroring
    * the reference's opcode dispatch (`DFSEditLogParser.java:109-136`;
    * untracked → IgnoreTx per `:138-148`). Multi-block ops carry their
    * first new block (the per-block fan-out happens in the range-merge
    * stage, which re-reads `blocks`). */
  def toChangeEvent(e: EditOp): ChangeEvent = {
    val lastBlock = e.blocks.lastOption
    val totalBytes = e.blocks.map(_.numBytes).sum
    e.opCode match {
      case OpAdd => ChangeEvent(e.txId, Op.AddFile, e.path, Mode.New,
        ts = e.mtime)
      case OpAppend => ChangeEvent(e.txId, Op.AppendFile, e.path, Mode.New)
      case OpDelete => ChangeEvent(e.txId, Op.DeleteFile, e.path, Mode.New,
        ts = e.mtime)
      case OpAddBlock => ChangeEvent(e.txId, Op.AddBlock, e.path, Mode.New,
        blockId = lastBlock.map(_.blockId).getOrElse(-1L),
        startOffset = 0L,
        endOffset = lastBlock.map(_.numBytes).getOrElse(0L),
        // ADD_BLOCK's compact array is [penultimate, new] when the file
        // already has blocks — the penultimate IS the chain predecessor
        prevBlockId =
          if (e.blocks.size >= 2) e.blocks(e.blocks.size - 2).blockId
          else -1L)
      case OpUpdateBlocks => ChangeEvent(e.txId, Op.UpdateBlocks, e.path,
        Mode.New,
        blockId = lastBlock.map(_.blockId).getOrElse(-1L),
        startOffset = 0L,
        endOffset = lastBlock.map(_.numBytes).getOrElse(0L))
      case OpTruncate => ChangeEvent(e.txId, Op.TruncateBlock, e.path,
        Mode.New, ts = e.mtime, startOffset = 0L, endOffset = e.newLength)
      case OpClose => ChangeEvent(e.txId, Op.CloseFile, e.path, Mode.New,
        sizeCents = totalBytes * 100, ts = e.mtime,
        blockId = lastBlock.map(_.blockId).getOrElse(-1L),
        startOffset = 0L,
        endOffset = lastBlock.map(_.numBytes).getOrElse(0L))
      case OpRename | OpRenameOld =>
        ChangeEvent(e.txId, Op.RenameFile, e.dst, Mode.New, ts = e.mtime,
          srcPath = e.path)
      case _ => ChangeEvent(e.txId, Op.IgnoreTx,
        if (e.path.nonEmpty) e.path else e.opName, Mode.New)
    }
  }

  /** Distributed decode of an edits directory: driver-side segment
    * pruning via [[EditsFileFinder]] (only files overlapping the tx
    * range are scanned at all), then one decode task per segment via the
    * `binaryFile` source. */
  def read(spark: SparkSession, dir: String, startTx: Long = -1L,
      endTx: Long = -1L): Dataset[ChangeEvent] = {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(dir), spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSeq
    val segs = EditsFileFinder.findEditsFiles(names, startTx, endTx)
    if (segs.isEmpty) spark.emptyDataset[ChangeEvent]
    else spark.read.format("binaryFile")
      .load(segs.map(s => s"$dir/${s.name}"): _*)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(bytes =>
        // CRC/framing failures stay diagnostic EditOps in decodeSegment;
        // they must never become phantom typed events in the stream
        decodeSegment(bytes, startTx, endTx)
          .filter(_.crcOk)
          .map(toChangeEvent))
  }
}
