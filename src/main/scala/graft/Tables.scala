package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import org.apache.spark.sql.Column

/** Test-table access + shared numeric helpers.
  *
  * Oracle-parity note: the driver hash-compares our parquet output against
  * DuckDB running `oracleSql` on the same tables. Floating-point SUMs are
  * order-dependent, so every compared aggregate goes through an exact
  * DECIMAL accumulation and is cast back to DOUBLE at the very end — both
  * engines then produce bit-identical values.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS): Spark reads it only as a long
    // (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench/tests).
    // Truncate to micros — the generator emits whole-micro values.
    df.schema.fields.foldLeft(df) {
      case (acc, f) if f.name == "ts" && f.dataType == LongType =>
        acc.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (acc, _) => acc
    }
  }

  /** Exact decimal sum of a double column, emitted as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact decimal average (decimal sum / count), emitted as double. */
  def davg(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(lit(1))
}
