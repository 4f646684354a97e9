package graft

import graft.ingest.FsImageBinary
import graft.model.FileLifecycle
import org.scalatest.funsuite.AnyFunSuite

/** Parses the reference repo's REAL binary (protobuf) fsimage fixture
  * and cross-validates it against the edit-log fixtures from the same
  * NameNode. */
class FsImageBinarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val image =
    "/root/reference/change-manager/namenode-agent/src/test/resources/edits/logs/current/fsimage_0000000000000028553"

  private lazy val summary = FsImageBinary.parseImage(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(image)))

  test("image metadata: txid matches the filename, inode count matches header") {
    assert(summary.txId == 28553L)
    assert(summary.numInodes == summary.inodes.size.toLong)
    assert(summary.inodes.nonEmpty && summary.edges.nonEmpty)
  }

  test("root directory and a known file inode decode correctly") {
    val root = summary.inodes.find(_.id == 16385L).get
    assert(root.inodeType == "DIRECTORY" && root.name == "")
    // inode 17111 = links_2.parquet in the edit-log fixtures (OP_ADD
    // txid 28323 names this inodeId; the rename gave it its final name)
    val f = summary.inodes.find(_.id == 17111L).get
    assert(f.inodeType == "FILE")
    assert(f.name == "links_2.parquet")
    assert(f.numBlocks == 1L)
    assert(f.totalBytes == 1036349L) // block numBytes from OP_CLOSE 28327
  }

  test("path resolution reconstructs the namespace seen in the edit logs") {
    implicit val s = spark
    val (inodes, edges) = FsImageBinary.parse(spark, image)
    val paths = FsImageBootstrapPathsHelper.resolve(inodes, edges)
    assert(paths.contains(17111L))
    assert(paths(17111L) == "/test/hcdc/loader/parquet/links_2.parquet")
    assert(paths(16385L) == "/") // root
  }

  test("bootstrapState: every FILE inode becomes Finalized at the image txid") {
    val st = FsImageBinary.bootstrapState(spark, image).collect()
    assert(st.nonEmpty)
    assert(st.forall(_.state == FileLifecycle.Finalized))
    assert(st.forall(_.lastTxId == 28553L))
    val links = st.find(_.path == "/test/hcdc/loader/parquet/links_2.parquet").get
    assert(links.numBlocks == 1L && links.dataSizeCents == 1036349L * 100)
    val nFiles = summary.inodes.count(_.inodeType == "FILE")
    assert(st.length == nFiles)
  }
}

/** Small bridge so the spec can read resolved paths as a map. */
object FsImageBootstrapPathsHelper {
  def resolve(inodes: org.apache.spark.sql.Dataset[graft.ingest.FsImageBootstrap.INode],
      edges: org.apache.spark.sql.Dataset[graft.ingest.FsImageBootstrap.Edge])(
      implicit spark: org.apache.spark.sql.SparkSession): Map[Long, String] =
    graft.ingest.FsImageBootstrap.resolvePaths(inodes, edges)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
}
