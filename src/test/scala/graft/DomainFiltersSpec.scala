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

  test("false-prefix match keeps full remainder (reference conditional strip)") {
    import spark.implicits._
    // /data/movies2/... prefix-matches dir /data/movies with remainder
    // "2/x.parquet" (no '/' eaten); the ANY filter claims it, PARQ's
    // ".*\.parquet$" also matches the remainder so PARQ (prio 1) wins.
    val out = DomainFilters.route(
        Seq("/data/movies2/x.parquet", "/data/movies2/x.txt").toDF("path"),
        filters)
      .orderBy("path").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq == Seq(
      ("/data/movies2/x.parquet", "PARQ"),
      ("/data/movies2/x.txt", "ANY")))
  }

  test("routeJoin keeps every event on duplicate paths (row-id dedup)") {
    import spark.implicits._
    implicit val s = spark
    // 3 events on the SAME path — a path-keyed first-match window would
    // collapse them to one row
    val events = Seq(
      (1L, "/data/movies/part-1.parquet"),
      (2L, "/data/movies/part-1.parquet"),
      (3L, "/data/movies/part-1.parquet")).toDF("txId", "path")
    val out = DomainFilters.routeJoin(events, filters.toDF())
    assert(out.count() == 3)
    assert(out.select("entity").distinct().collect().map(_.getString(0)).toSeq
      == Seq("PARQ"))
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
