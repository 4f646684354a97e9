package graft

import graft.changeset.{ChangeSetAssembler, RangeMerge}
import graft.changeset.RangeMerge.{Delta, DeltaOp}
import org.scalatest.funsuite.AnyFunSuite

class ChangeSetAssemblerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("end-to-end: fold ranges -> slice bytes -> write .blk replicas -> read back") {
    implicit val s = spark
    import s.implicits._
    val content = (0 until 200).map(_.toByte).toArray

    // block 10: appends [20,49] and [30,99] → merged [20,99]
    // block 11: append then truncate back to [0,9]
    // block 12: deleted
    val merged = Map(
      10L -> RangeMerge.fold(Seq(
        Delta(10, 1, 20, 49, DeltaOp.Append),
        Delta(10, 2, 30, 99, DeltaOp.Append))),
      11L -> RangeMerge.fold(Seq(
        Delta(11, 1, 0, 150, DeltaOp.Append),
        Delta(11, 2, 0, 9, DeltaOp.Truncate))),
      12L -> RangeMerge.fold(Seq(
        Delta(12, 1, 0, 99, DeltaOp.Append),
        Delta(12, 2, 0, 0, DeltaOp.Delete))))
    assert(merged(10L).startOffset == 20 && merged(10L).endOffset == 99)
    assert(merged(11L).endOffset == 9)
    assert(merged(12L).deleted)

    val blocks = merged.toSeq.map { case (id, m) =>
      ("/data/f1.parquet", id, id - 1, content, m.startOffset, m.endOffset,
        m.deleted)
    }.toDF("path", "blockId", "prevBlockId", "content", "startOffset",
      "endOffset", "deleted")

    val deltas = ChangeSetAssembler.sliceChangeSets(blocks)
    val byId = deltas.collect().map(r => r.getLong(1) ->
      r.getAs[Array[Byte]](3)).toMap
    assert(byId(10L).toSeq == content.slice(20, 100).toSeq) // end inclusive
    assert(byId(11L).toSeq == content.slice(0, 10).toSeq)
    assert(byId(12L).isEmpty)

    val dir = java.nio.file.Files.createTempDirectory("graft_blk_").toString
    ChangeSetAssembler.writeReplicas(deltas, s"file://$dir")
    val back = ChangeSetAssembler.readReplicas(spark, s"file://$dir")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    // deleted block 12 writes NO replica — tombstone rides the pointer
    assert(back.keySet == Set(10L, 11L))
    assert(back(10L).toSeq == content.slice(20, 100).toSeq)
    assert(back(11L).toSeq == content.slice(0, 10).toSeq)
    assert(!new java.io.File(s"$dir/data_f1.parquet/12-11.blk").exists())
    // naming parity: <blockId>-<prevBlockId>.blk
    assert(new java.io.File(s"$dir/data_f1.parquet/10-9.blk").exists())
  }

  test("range clamped to content length") {
    implicit val s = spark
    import s.implicits._
    val blocks = Seq(("/f", 1L, 0L, Array[Byte](1, 2, 3), 0L, 999L, false))
      .toDF("path", "blockId", "prevBlockId", "content", "startOffset",
        "endOffset", "deleted")
    val out = ChangeSetAssembler.sliceChangeSets(blocks).collect()(0)
      .getAs[Array[Byte]](3)
    assert(out.toSeq == Seq[Byte](1, 2, 3))
  }
}
