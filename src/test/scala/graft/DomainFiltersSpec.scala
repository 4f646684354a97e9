package graft

import graft.filters.DomainFilters
import graft.filters.DomainFilters.Filter
import org.scalatest.funsuite.AnyFunSuite

class DomainFiltersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val filters = Seq(
    Filter("d1", "PARQ", "/data/movies", ".*\\.parquet$", 1),
    Filter("d1", "ANY", "/data/movies", ".*", 2), // shadowed for .parquet
    Filter("d2", "XML", "/data/core", ".*\\.xml$", 3))

  private def paths = Seq(
    "/data/movies/part-1.parquet", // → PARQ (not ANY: first match wins)
    "/data/movies/notes.txt", // → ANY
    "/data/core/conf.xml", // → XML
    "/data/core/conf.json", // → unmatched
    "/data/movies/part-2.parquet.COPYING", // suppressed (ignore regex)
    "/tmp/scratch/x.parquet", // suppressed
    "/data/other/a.parquet") // unmatched

  test("compiled route: first match wins, ignore regex suppresses") {
    import spark.implicits._
    val out = DomainFilters.route(paths.toDF("path"), filters)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      ("/data/core/conf.json", "_none", "IgnoreTx"),
      ("/data/core/conf.xml", "d2", "XML"),
      ("/data/movies/notes.txt", "d1", "ANY"),
      ("/data/movies/part-1.parquet", "d1", "PARQ"),
      ("/data/other/a.parquet", "_none", "IgnoreTx")))
  }

  test("dynamic routeJoin matches compiled route") {
    import spark.implicits._
    implicit val s = spark
    val df = paths.toDF("path")
    val a = DomainFilters.route(df, filters)
      .select("path", "domain", "entity").orderBy("path").collect().toSeq
    val b = DomainFilters.routeJoin(df, filters.toDF())
      .select("path", "domain", "entity").orderBy("path").collect().toSeq
    assert(a == b)
  }
}
