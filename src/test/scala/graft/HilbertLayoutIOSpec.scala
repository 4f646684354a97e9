package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HilbertIndex2

/** Physical-layer evidence for the q284/q287 layout story: actually
  * WRITE the table both ways (Hilbert-clustered into 64 range
  * partitions vs key-shuffled), read the REAL per-file zone maps back
  * from the written files, and assert the clustered layout lets a 2-D
  * rectangle predicate skip most files while the unclustered one
  * cannot. This is the min/max file-skipping a lakehouse reader
  * (Delta/Iceberg stats, parquet row-group bounds) performs — proven
  * on files on disk, not on a modeled bucketing. */
class HilbertLayoutIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Hilbert-clustered parquet yields prunable per-file boxes; shuffled does not") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_hio_").toString
    val rng = new scala.util.Random(37)
    val rows = (1 to 60000).map { i =>
      (i.toLong, rng.nextInt(2000).toLong + 1, rng.nextInt(800).toLong + 1)
    }
    val df = rows.toDF("id", "pk", "sk")
      .withColumn("x", expr("pk * 65536 div 2001"))
      .withColumn("y", expr("sk * 65536 div 801"))
      .withColumn("hk", HilbertIndex2(col("x"), col("y")))

    // clustered: range-partition on the Hilbert key -> 64 real files,
    // each covering a contiguous curve segment
    df.repartitionByRange(64, col("hk"))
      .write.mode("overwrite").parquet(s"$tmp/clustered")
    // control: shuffled on the row id -> same 64 files, no clustering
    df.repartitionByRange(64, col("id"))
      .write.mode("overwrite").parquet(s"$tmp/shuffled")

    // REAL zone maps: per written file, the (pk, sk) bounds
    def boxes(dir: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("pk")).as("pkmin"), max(col("pk")).as("pkmax"),
          min(col("sk")).as("skmin"), max(col("sk")).as("skmax"))
        .collect()
        .map(r => (r.getAs[Long]("pkmin"), r.getAs[Long]("pkmax"),
          r.getAs[Long]("skmin"), r.getAs[Long]("skmax")))

    // the q287 rectangle: 20-30% x 40-60% of each domain
    val (lo1, hi1) = (2000L * 20 / 100, 2000L * 30 / 100)
    val (lo2, hi2) = (800L * 40 / 100, 800L * 60 / 100)
    def scanned(bs: Array[(Long, Long, Long, Long)]): Int =
      bs.count { case (pmin, pmax, smin, smax) =>
        pmin <= hi1 && pmax >= lo1 && smin <= hi2 && smax >= lo2
      }

    val cb = boxes(s"$tmp/clustered"); val sb = boxes(s"$tmp/shuffled")
    assert(cb.length == 64 && sb.length == 64,
      s"expected 64 files each, got ${cb.length}/${sb.length}")
    val cScan = scanned(cb); val sScan = scanned(sb)
    info(s"files scanned for the rectangle: clustered=$cScan shuffled=$sScan")
    // soundness on the real files: pruned read equals the true count
    val expected = rows.count { case (_, p, s) =>
      p >= lo1 && p <= hi1 && s >= lo2 && s <= hi2
    }
    val prunedCount = spark.read.parquet(s"$tmp/clustered")
      .withColumn("f", input_file_name())
      .filter(col("pk").between(lo1, hi1) &&
        col("sk").between(lo2, hi2))
      .count()
    assert(prunedCount == expected.toLong)
    // the win: clustering must skip >= 75% of files; the shuffled
    // control must be unable to skip (every file spans both domains)
    assert(cScan <= 16, s"clustered layout scanned $cScan of 64 files")
    assert(sScan == 64, s"shuffled control skipped files: $sScan")
  }
}
