package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full pretraining-release pipeline (q64) composes scans, narrow
    * quality projections, hash-agg dedup, the MinHash LSH band join, the
    * candidate-scoped Jaccard verify, eval-set decontamination, hash-quota
    * rebalancing, and the deterministic split report — the engine's
    * identity in one query. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q64_corpus_release")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
