package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Gate-contract audit: every registered query's OUTPUT schema must be
  * atomic-typed. The driver's correctness comparer lexsorts result
  * cells through pandas, which cannot hash an ARRAY/MAP/STRUCT cell —
  * shipping one turns the query's gate row red regardless of value
  * correctness (round 8's q252, the only red row of the round, shipped
  * a raw `ARRAY<BIGINT>` sketch column). Nested values must be encoded
  * sortably before they reach the gate (`array_join`, `concat_ws`,
  * explode-to-rows, md5).
  *
  * Coverage is MECHANICAL for the whole battery, streaming included
  * (the round-9 verdict's ask — the previous revision excluded the 17
  * streaming gates via a hand-maintained allow-list, so a NEW
  * streaming gate with an array column would have shipped past this
  * spec and only failed at the driver). Batch queries resolve their
  * schema analysis-only (no job); streaming gates execute their
  * multi-trigger pipeline once at sf0.001 and the READ-BACK schema —
  * exactly what the driver writes and DuckDB re-reads — is audited.
  */
class AtomicOutputSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def nonAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** The audit itself, factored so the negative test below can feed it
    * a synthetic gate: build (running any streaming side effects) and
    * list the non-atomic output columns. */
  private def offendersOf(name: String,
      build: (SparkSession, String) => DataFrame): Seq[String] =
    build(spark, dir).schema.fields.toSeq.collect {
      case f if nonAtomic(f.dataType) =>
        s"$name.${f.name}: ${f.dataType.simpleString}"
    }

  test("every gate query, batch AND streaming, ships atomic-typed columns") {
    val offenders = Registry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) => offendersOf(name, fn) }
    assert(offenders.isEmpty,
      s"non-atomic gate output columns (driver comparer cannot sort " +
        s"these):\n  ${offenders.mkString("\n  ")}")
  }

  test("a deliberately array-typed streaming-shaped gate IS caught") {
    // Mimics the streaming-gate shape end to end: write to a GateOut
    // parquet, return the read-back — with a raw ARRAY column, the
    // round-8 q252 failure class. The audit must flag the read-back.
    val fake: (SparkSession, String) => DataFrame = (s, _) => {
      implicit val session: SparkSession = s
      import s.implicits._
      val out = graft.streaming.GateOut.dir()
      Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "sk")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
    }
    val off = offendersOf("fake_array_gate", fake)
    assert(off.nonEmpty && off.head.contains("fake_array_gate.sk"),
      s"audit missed the planted ARRAY column: $off")
  }
}
