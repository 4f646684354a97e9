package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 edit-log provider against the reference repo's
  * real binary fixtures: row parity with the direct decoder, and
  * planning-time segment pruning driven by pushed tx_id predicates. */
class EditLogSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val fixtures =
    "/root/reference/change-manager/namenode-agent/src/test/resources/edits/logs/current"
  private val fmt = classOf[graft.sources.EditLogSource].getName

  private def source = spark.read.format(fmt).load(fixtures)

  test("decodes the real fixture directory with valid CRCs") {
    val rows = source.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("crc_ok")))
    // same ops the direct decoder sees (it drops nothing here either)
    val direct = graft.ingest.EditLogDecoder.read(spark, fixtures).count()
    val typedHere = source.count()
    assert(typedHere == direct)
  }

  test("tx_id range predicates prune whole segment files at planning time") {
    val all = source.rdd.getNumPartitions
    assert(all > 1, s"fixture dir should span several segments, got $all")
    // the finder knows each file's tx range from its name; a narrow
    // window must plan strictly fewer decode tasks
    val narrow = source.filter(
      col("tx_id") >= 28554L && col("tx_id") <= 28559L)
    assert(narrow.rdd.getNumPartitions < all,
      s"expected pruned partitions < $all")
    // and the surviving rows honor the predicate exactly
    val txs = narrow.select(col("tx_id")).collect().map(_.getLong(0))
    assert(txs.nonEmpty && txs.forall(t => t >= 28554L && t <= 28559L))
  }

  test("pushed range agrees with an unpruned full scan + post-filter") {
    val a = source.filter(col("tx_id").between(28560L, 28575L))
      .select(col("tx_id"), col("op_name"), col("path"))
      .orderBy(col("tx_id")).collect().toSeq
    val b = source
      .select(col("tx_id"), col("op_name"), col("path"))
      .orderBy(col("tx_id")).collect().toSeq
      .filter(r => r.getLong(0) >= 28560L && r.getLong(0) <= 28575L)
    assert(a == b)
  }

  test("column pruning reaches the scan (projected ReadSchema)") {
    val q = source.select(col("tx_id"), col("op_name"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("columns=[tx_id,op_name]"),
      s"scan did not prune columns:\n$scan")
    // and the projected read agrees with the full read
    val a = q.orderBy(col("tx_id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = source.orderBy(col("tx_id")).collect()
      .map(r => (r.getAs[Long]("tx_id"), r.getAs[String]("op_name"))).toSeq
    assert(a == b)
  }

  test("nested columns surface (blocks, rename options)") {
    val withBlocks = source.filter(size(col("blocks")) > 0)
    assert(withBlocks.count() > 0)
    val ids = withBlocks
      .select(explode(col("blocks")).as("b"))
      .select(col("b.block_id")).collect().map(_.getLong(0))
    assert(ids.forall(_ > 0))
  }
}
