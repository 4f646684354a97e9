package graft

import graft.changeset.{ChangeSetAssembler, RangeMerge}
import graft.changeset.RangeMerge.{Delta, DeltaOp}
import graft.filters.DomainFilters.Filter
import graft.model.{ChangeEvent, FileLifecycle => L, Op}
import graft.api.Graft
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's full materialization flow (SURVEY §3.3) composed from
  * this library's pieces: change events → filter routing → FSM state →
  * per-block range merge → byte slicing → .blk replica files on the
  * target FS → read back. One test, every seam. */
class EndToEndPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("REAL NameNode artifacts: binary fsimage bootstrap + binary edit-log catch-up") {
    implicit val s = spark
    val fixtures =
      "/root/reference/change-manager/namenode-agent/src/test/resources/edits/logs/current"
    val work = java.nio.file.Files.createTempDirectory("graft_real_").toString

    // 1. bootstrap the namespace from the binary protobuf image
    //    (txid 28553) and seed it as the Graft state store's base version
    val boot = graft.ingest.FsImageBinary.bootstrapState(
      spark, s"$fixtures/fsimage_0000000000000028553")
    boot.toDF().write.parquet(s"$work/state/files_v0")
    val g = new Graft(spark, s"$work/state")
    assert(g.stateTable.filter(_.path ==
      "/test/hcdc/loader/parquet/links_2.parquet").head().state == L.Finalized)

    // 2. catch up from the binary edit segments AFTER the image: the
    //    fixtures carry two complete real lifecycles
    //    (create ._COPYING_ -> add block -> close -> rename) at
    //    txids 28563-28568 and 28605-28610
    val catchUp = graft.ingest.EditLogDecoder.read(
      spark, fixtures, startTx = 28554L)
    assert(catchUp.filter(_.op != Op.IgnoreTx).count() > 0)
    g.replayIncrement(catchUp)

    // 3. converged state: both new files Finalized under their final
    //    names, their temp names Deleted by the rename fan-out, and the
    //    image-era files untouched
    val st = g.stateTable.collect().map(x => x.path -> x).toMap
    assert(st("/test/hcdc/loader/parquet/links_2").state == L.Finalized)
    assert(st("/test/hcdc/loader/parquet/data/links_2").state == L.Finalized)
    assert(st("/test/hcdc/loader/parquet/links_2._COPYING_").state == L.Deleted)
    assert(st("/test/hcdc/loader/parquet/data/links_2._COPYING_").state == L.Deleted)
    // untouched image file keeps its bootstrap watermark (raw image txid;
    // the catch-up events live on the ×4 rename sub-tx grid above it)
    assert(st("/test/hcdc/loader/parquet/links_2.parquet").lastTxId == 28553L)
    // the temp files accumulated their real block (1 block, 1036349 B)
    assert(st("/test/hcdc/loader/parquet/links_2._COPYING_").numBlocks == 1L)
    assert(g.watermark() >= 28610L * 4)
  }

  test("real edit-log events survive the reference protobuf wire") {
    implicit val s = spark
    import graft.state.FileStateFSM
    import graft.streaming.ChangeDeltaCodec
    val fixtures =
      "/root/reference/change-manager/namenode-agent/src/test/resources/edits/logs/current"
    // the REAL decoded journal -> DFSChangeDelta bytes -> decode -> FSM
    // must equal the direct FSM replay: this is the drop-in claim (an
    // hcdc consumer fed our bytes, or us fed theirs, converges to the
    // same state table)
    val evs = graft.ingest.EditLogDecoder.read(spark, fixtures, startTx = 0L)
    val direct = FileStateFSM.replayAll(evs)
      .collect().map(x => x.path -> x).toMap
    val decoded = ChangeDeltaCodec.decodeRecords(
      ChangeDeltaCodec.encodeRecords(evs, "hcdc"))
    val viaWire = FileStateFSM.replayAll(decoded)
      .collect().map(x => x.path -> x).toMap
    assert(viaWire == direct)
    // and the event stream itself round-trips record-for-record
    val a = evs.collect().sortBy(e => (e.txId, e.op, e.path)).toSeq
    val b = decoded.collect().sortBy(e => (e.txId, e.op, e.path)).toSeq
    assert(b == a)
  }

  test("events -> route -> FSM -> range merge -> slice -> replicas -> read back") {
    implicit val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_e2e_").toString

    // 1. a day of change events for two files (one matching the filter)
    val g = new Graft(spark, s"$work/state")
    g.addFilter(Filter("wh", "TBL", "/warehouse", ".*\\.parquet$", 1))
    val events = Seq(
      ChangeEvent(1, Op.AddFile, "/warehouse/t/p0.parquet"),
      ChangeEvent(2, Op.AddBlock, "/warehouse/t/p0.parquet", blockId = 100),
      ChangeEvent(3, Op.UpdateBlocks, "/warehouse/t/p0.parquet",
        blockId = 100, startOffset = 0, endOffset = 49, sizeCents = 50),
      ChangeEvent(4, Op.UpdateBlocks, "/warehouse/t/p0.parquet",
        blockId = 100, startOffset = 30, endOffset = 119, sizeCents = 70),
      ChangeEvent(5, Op.CloseFile, "/warehouse/t/p0.parquet"),
      ChangeEvent(6, Op.AddFile, "/logs/skip.txt")).toDS()
    g.replay(events)

    // 2. routing: only the parquet file is a tracked entity
    val routed = g.route(g.stateTable.toDF())
      .filter(col("entity") =!= "IgnoreTx")
    assert(routed.count() == 1)
    assert(g.stateTable.filter(_.path == "/warehouse/t/p0.parquet")
      .head().state == L.Finalized)

    // 3. compressed change set for the tracked file's block
    val deltas = events
      .filter(e => e.op == Op.UpdateBlocks && e.blockId >= 0)
      .map(e => Delta(e.blockId, e.txId, e.startOffset, e.endOffset,
        DeltaOp.Append))
    val merged = deltas.groupByKey(_.blockId).agg(RangeMerge.agg.toColumn)
      .collect().toMap
    assert(merged(100L).startOffset == 0 && merged(100L).endOffset == 119)

    // 4. slice the merged range out of the block bytes, write replicas
    val content = Array.tabulate(200)(i => (i % 251).toByte)
    val blocks = Seq((
      "/warehouse/t/p0.parquet", 100L, -1L, content,
      merged(100L).startOffset, merged(100L).endOffset,
      merged(100L).deleted))
      .toDF("path", "blockId", "prevBlockId", "content", "startOffset",
        "endOffset", "deleted")
    ChangeSetAssembler.writeReplicas(
      ChangeSetAssembler.sliceChangeSets(blocks), s"file://$work/replicas")

    // 5. read back: the replica holds exactly bytes [0, 119]
    val back = ChangeSetAssembler.readReplicas(spark, s"file://$work/replicas")
      .collect()
    assert(back.length == 1)
    assert(back(0).getLong(0) == 100L)
    assert(back(0).getAs[Array[Byte]](2).toSeq == content.slice(0, 120).toSeq)

    // 6. downstream pointer records, Kafka-shaped
    val pointers = graft.streaming.ChangeStreamPipeline.toKafkaRecords(
      routed.select(col("domain"), col("entity"),
        lit("New").as("mode"), col("lastTxId").as("txId")), "e2e")
      .collect()
    assert(pointers.length == 1 && pointers(0).getString(0) == "wh::TBL")
  }
}
