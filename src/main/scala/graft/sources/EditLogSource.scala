package graft.sources

import java.util

import graft.ingest.{EditLogDecoder, EditsFileFinder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 provider for binary HDFS edit-log directories — the
  * S1+S2+S3 composition as a first-class Spark source:
  *
  * {{{
  *   spark.read.format("graft.sources.EditLogSource")
  *     .load("/path/to/edits/current")
  *     .filter($"tx_id" >= 7 && $"tx_id" <= 17)   // prunes whole files
  * }}}
  *
  * The scan-builder consumes `tx_id` range predicates
  * (SupportsPushDownFilters) and hands them to [[EditsFileFinder]], so
  * segment files whose name-encoded transaction range
  * (`edits_<start>-<end>`, `edits_inprogress_<start>`) falls outside
  * the requested window are never opened, never read, never decoded —
  * planning-time partition pruning, the same mechanism as parquet
  * partition pruning but driven by the journal's naming contract
  * (reference: `DFSEditsFileFinder.java`; the tx-range filter the
  * reference applies per-op in `DFSEditLogParser` becomes a file-level
  * prune here + the same per-op filter inside the decode).
  *
  * One segment file = one [[InputPartition]] = one decode task, so a
  * 10-year journal of N segments decodes with N-way parallelism and a
  * executor never holds more than one segment in memory.
  */
class EditLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EditLogSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EditLogTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object EditLogSource {
  val BlockType: StructType = StructType(Seq(
    StructField("block_id", LongType, nullable = false),
    StructField("num_bytes", LongType, nullable = false),
    StructField("gen_stamp", LongType, nullable = false)))

  val Schema: StructType = StructType(Seq(
    StructField("tx_id", LongType, nullable = false),
    StructField("op_code", IntegerType, nullable = false),
    StructField("op_name", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("dst", StringType, nullable = false),
    StructField("inode_id", LongType, nullable = false),
    StructField("mtime", LongType, nullable = false),
    StructField("block_size", LongType, nullable = false),
    StructField("new_length", LongType, nullable = false),
    StructField("overwrite", BooleanType, nullable = false),
    StructField("rename_options", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("blocks", ArrayType(BlockType, containsNull = false),
      nullable = false),
    StructField("crc_ok", BooleanType, nullable = false)))
}

private class EditLogTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft edit-log source needs a .load(path)")
  override def name(): String = s"graft-editlog:$path"
  override def schema(): StructType = EditLogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EditLogScanBuilder(path)
}

/** Accepts tx_id range predicates and column pruning; everything else
  * stays with Spark. */
private class EditLogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {
  private var startTx = -1L
  private var endTx = -1L
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = EditLogSource.Schema

  // column pruning (SupportsPushDownRequiredColumns): a projection like
  // `select(tx_id, op_name)` narrows the rows the reader MATERIALIZES —
  // the decode still parses every op (the wire format is sequential),
  // but strings/arrays for dropped columns are never converted to
  // UTF8String/ArrayData or copied across the row boundary
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case GreaterThanOrEqual("tx_id", _: Long) => true
      case GreaterThan("tx_id", _: Long) => true
      case LessThanOrEqual("tx_id", _: Long) => true
      case LessThan("tx_id", _: Long) => true
      case EqualTo("tx_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual(_, v: Long) => startTx = math.max(startTx, v)
      case GreaterThan(_, v: Long) => startTx = math.max(startTx, v + 1)
      case LessThanOrEqual(_, v: Long) =>
        endTx = if (endTx < 0) v else math.min(endTx, v)
      case LessThan(_, v: Long) =>
        endTx = if (endTx < 0) v - 1 else math.min(endTx, v - 1)
      case EqualTo(_, v: Long) =>
        startTx = math.max(startTx, v)
        endTx = if (endTx < 0) v else math.min(endTx, v)
      case _ =>
    }
    pushed = accepted
    // the decode re-applies the range per-op (file pruning is coarse:
    // a surviving segment can still straddle the window), so accepted
    // filters need not be re-evaluated by Spark — but returning them
    // is harmless and keeps the scan honest if the contract drifts
    rest ++ accepted
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new EditLogScan(path, startTx, endTx, required)
}

private class EditLogScan(path: String, startTx: Long, endTx: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftEditLog path=$path txRange=[$startTx,$endTx] " +
      s"columns=[${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side: the session's Hadoop conf directly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create(path), org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).toSeq
    EditsFileFinder.findEditsFiles(names, startTx, endTx)
      .map(s => EditLogPartition(s"$path/${s.name}", startTx, endTx)
        : InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // executor-side: ship the conf as a serializable snapshot
    new EditLogReaderFactory(HadoopConfShip.capture(), required)
}

private case class EditLogPartition(file: String, startTx: Long, endTx: Long)
    extends InputPartition

private class EditLogReaderFactory(conf: HadoopConfShip.Shipped,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EditLogPartition]
    new PartitionReader[InternalRow] {
      // per-column extractors for exactly the PRUNED schema, resolved
      // once per reader: a dropped string/array column is never
      // converted to UTF8String/ArrayData at all
      private val fieldOf: Array[EditLogDecoder.EditOp => Any] =
        required.fieldNames.map {
          case "tx_id" => (e: EditLogDecoder.EditOp) => e.txId
          case "op_code" => (e: EditLogDecoder.EditOp) => e.opCode
          case "op_name" =>
            (e: EditLogDecoder.EditOp) => UTF8String.fromString(e.opName)
          case "path" =>
            (e: EditLogDecoder.EditOp) => UTF8String.fromString(e.path)
          case "dst" =>
            (e: EditLogDecoder.EditOp) => UTF8String.fromString(e.dst)
          case "inode_id" => (e: EditLogDecoder.EditOp) => e.inodeId
          case "mtime" => (e: EditLogDecoder.EditOp) => e.mtime
          case "block_size" => (e: EditLogDecoder.EditOp) => e.blockSize
          case "new_length" => (e: EditLogDecoder.EditOp) => e.newLength
          case "overwrite" => (e: EditLogDecoder.EditOp) => e.overwrite
          case "rename_options" => (e: EditLogDecoder.EditOp) =>
            new GenericArrayData(
              e.renameOptions.map(UTF8String.fromString).toArray[Any])
          case "blocks" => (e: EditLogDecoder.EditOp) =>
            new GenericArrayData(e.blocks.map(b => new GenericInternalRow(
              Array[Any](b.blockId, b.numBytes, b.genStamp))).toArray[Any])
          case "crc_ok" => (e: EditLogDecoder.EditOp) => e.crcOk
          case other => throw new IllegalArgumentException(
            s"unknown edit-log column $other")
        }

      private val ops = {
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create(p.file), conf.value)
        val in = fs.open(new org.apache.hadoop.fs.Path(p.file))
        val bytes = try {
          val len = fs.getFileStatus(new org.apache.hadoop.fs.Path(p.file)).getLen
          // len.toInt on a >2 GB segment wraps negative and surfaces as a
          // baffling NegativeArraySizeException — fail with the real cause
          require(len <= Int.MaxValue,
            s"edit-log segment ${p.file} is $len bytes — too large to " +
              "decode in one buffer; split the segment")
          val b = new Array[Byte](len.toInt)
          in.readFully(0, b)
          b
        } finally in.close()
        EditLogDecoder.decodeSegment(bytes, p.startTx, p.endTx).iterator
      }
      private var row: InternalRow = _

      override def next(): Boolean =
        if (!ops.hasNext) false
        else {
          val e = ops.next()
          row = new GenericInternalRow(fieldOf.map(_(e)))
          true
        }

      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
