package graft

import graft.changeset.ChangeSetAssembler
import graft.model.{ChangeEvent, Op}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The K5/K7 replica + delta path against an OBJECT STORE contract —
  * the hermetic e2e the reference ran with S3Mock
  * (`FileDeltaProcessorTest.java:21-73`), here against
  * [[MockS3FileSystem]] (`mocks3://`, rename = copy+delete, never
  * atomic — the S3A semantics class). Production points the very same
  * code at `s3a://` URIs; nothing in the pipeline names a scheme, so
  * the contract below is exactly what changes between local disk and
  * S3. */
class S3ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bucket(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_s3_").toString
    s"mocks3://$d" // authority-less: mocks3:///tmp/... maps into /tmp
  }

  test("K5 replica blocks round-trip through the object store") {
    import spark.implicits._
    val base = bucket()
    val deltas = Seq(
      ("/data/a.parquet", 101L, -1L, Array[Byte](1, 2, 3, 4)),
      ("/data/a.parquet", 102L, 101L, Array[Byte](9, 8)),
      ("/data/b.parquet", 201L, -1L, Array.tabulate(4096)(_.toByte)),
      ("/data/gone.parquet", 301L, -1L, Array.emptyByteArray)) // tombstone
      .toDF("path", "blockId", "prevBlockId", "delta")
    ChangeSetAssembler.writeReplicas(deltas, s"$base/replicas")
    val back = ChangeSetAssembler.readReplicas(spark, s"$base/replicas")
      .select(col("blockId"), col("prevBlockId"), col("delta"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(back == Set(
      (101L, -1L, Seq[Byte](1, 2, 3, 4)),
      (102L, 101L, Seq[Byte](9, 8)),
      (201L, -1L, Array.tabulate(4096)(_.toByte).toSeq)),
      "replica bytes diverged through the object store (tombstone must not land)")
  }

  test("K7 delta upload (avro) + pointer read-back on the object store") {
    import spark.implicits._
    val base = bucket()
    val avro = graft.convert.Formats.byName("avro")
    val delta = Seq((1L, "/data/m/p1.parquet"), (2L, "/data/m/p2.parquet"))
      .toDF("doc_id", "path")
    avro.write(delta, s"$base/delta/MOVIES")
    val back = avro.read(spark, s"$base/delta/MOVIES")
    assert(back.agg(count(lit(1)), sum(col("doc_id"))).head() ==
      org.apache.spark.sql.Row(2L, 3L))
  }

  test("K6 versioned state store commits correctly under non-atomic rename") {
    import spark.implicits._
    val base = bucket()
    val g = new graft.api.Graft(spark, s"$base/state")
    g.replay(Seq(
      ChangeEvent(1, Op.AddFile, "/d/x"),
      ChangeEvent(2, Op.CloseFile, "/d/x"),
      ChangeEvent(3, Op.AddFile, "/d/y")).toDS())
    val wm0 = g.watermark()
    g.replayIncrement(Seq(
      ChangeEvent(9, Op.CloseFile, "/d/y")).toDS())
    assert(g.versions().size == 2, "base + delta version expected")
    assert(g.watermark() > wm0)
    g.compact()
    assert(g.versions().size == 1, "compaction must fold to one version")
    assert(g.stateTable.count() == 2)
    // the whole protocol ran on the mocks3 scheme, and job commits DID
    // exercise the object-store rename (copy+delete), not posix rename
    assert(MockS3FileSystem.renames.get() > 0,
      "no rename ever hit the object-store path — contract not exercised")
  }
}
