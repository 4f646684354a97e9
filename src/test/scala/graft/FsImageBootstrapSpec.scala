package graft

import graft.ingest.FsImageBootstrap
import graft.model.{ChangeEvent, FileLifecycle => L, Op}
import graft.state.FileStateFSM
import org.scalatest.funsuite.AnyFunSuite

class FsImageBootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** `hdfs oiv -p XML`-shaped fixture: /, /data, /data/movies with two
    * files at different depths. */
  private val fsimageXml =
    """<?xml version="1.0"?>
      |<fsimage>
      |<INodeSection>
      |  <inode><id>16385</id><type>DIRECTORY</type><name></name></inode>
      |  <inode><id>16386</id><type>DIRECTORY</type><name>data</name></inode>
      |  <inode><id>16387</id><type>DIRECTORY</type><name>movies</name></inode>
      |  <inode><id>16388</id><type>FILE</type><name>part-0.parquet</name>
      |    <blocks>
      |      <block><id>1073741825</id><genstamp>1001</genstamp><numBytes>1000</numBytes></block>
      |      <block><id>1073741826</id><genstamp>1002</genstamp><numBytes>500</numBytes></block>
      |    </blocks>
      |  </inode>
      |  <inode><id>16389</id><type>FILE</type><name>top.csv</name>
      |    <blocks>
      |      <block><id>1073741827</id><genstamp>1003</genstamp><numBytes>42</numBytes></block>
      |    </blocks>
      |  </inode>
      |</INodeSection>
      |<INodeDirectorySection>
      |  <directory><parent>16385</parent><child>16386</child><child>16389</child></directory>
      |  <directory><parent>16386</parent><child>16387</child></directory>
      |  <directory><parent>16387</parent><child>16388</child></directory>
      |</INodeDirectorySection>
      |</fsimage>""".stripMargin

  test("fsimage XML -> inodes/edges -> resolved paths -> bootstrap state") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_img_")
    java.nio.file.Files.write(dir.resolve("fsimage.xml"), fsimageXml.getBytes)

    val st = FsImageBootstrap.bootstrapState(spark, dir.toString, asOfTxId = 99)
      .collect().map(x => x.path -> x).toMap
    assert(st.keySet == Set("/data/movies/part-0.parquet", "/top.csv"))
    val f = st("/data/movies/part-0.parquet")
    assert(f.state == L.Finalized && f.numBlocks == 2 &&
      f.dataSizeCents == 150000 && f.lastTxId == 99)
    assert(st("/top.csv").numBlocks == 1 && st("/top.csv").dataSizeCents == 4200)
  }

  test("bootstrap state feeds replayWithInit (S4 -> T4 chain)") {
    implicit val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_img2_")
    java.nio.file.Files.write(dir.resolve("fsimage.xml"), fsimageXml.getBytes)
    val boot = FsImageBootstrap.bootstrapState(spark, dir.toString, 99)
    val out = FileStateFSM.replayWithInit(boot, Seq(
      ChangeEvent(100, Op.DeleteFile, "/top.csv"),
      ChangeEvent(101, Op.AddFile, "/fresh.json")).toDS())
      .collect().map(x => x.path -> x).toMap
    assert(out("/top.csv").state == L.Deleted)
    assert(out("/data/movies/part-0.parquet").state == L.Finalized)
    assert(out("/fresh.json").state == L.New)
  }
}
