package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Gate-contract audit: every registered query's OUTPUT schema must be
  * atomic-typed. The driver's correctness comparer lexsorts result
  * cells through pandas, which cannot hash an ARRAY/MAP/STRUCT cell —
  * shipping one turns the query's gate row red regardless of value
  * correctness (round 8's q252, the only red row of the round, shipped
  * a raw `ARRAY<BIGINT>` sketch column). Nested values must be encoded
  * sortably before they reach the gate (`array_join`, `concat_ws`,
  * explode-to-rows, md5). Schema resolution is analysis-only — no job
  * runs — so this audits the full battery in seconds.
  */
class AtomicOutputSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Streaming/stateful gates run side effects at build time, so their
    * schemas can't be resolved without executing multi-trigger streams
    * here; their outputs are read back from parquet the queries
    * themselves wrote, and each was green through the driver's pandas
    * comparer in CORRECTNESS_r08 — which is only possible for
    * atomic-renderable cells. Any NEW streaming gate must keep its
    * read-back schema atomic (enforced by the driver row going red,
    * and by this list being append-reviewed). */
  private val streamingBuilds = Set("q262_stream_wav_health",
    "q27_cdc_stream_fsm",
    "q63_stream_dedup", "q72_stream_lsh_index", "q77_stream_topk",
    "q80_stream_agg_maintain", "q109_stream_sessionize",
    "q112_stream_rate_anomaly", "q124_stream_sessions_tws",
    "q129_stream_cdc_merge", "q130_stream_interval_join",
    "q134_stream_static_join", "q139_stream_scd2",
    "q145_stream_dedup_wm", "q152_stream_ivm", "q158_stream_outer_join",
    "q172_stream_complete_agg")

  private def nonAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("every batch gate query ships only atomic-typed output columns") {
    val offenders = Registry.queries.toSeq
      .filterNot { case (name, _) => streamingBuilds(name) }
      .flatMap { case (name, fn) =>
        fn(spark, dir).schema.fields.collect {
          case f if nonAtomic(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      }
    assert(offenders.isEmpty,
      s"non-atomic gate output columns (driver comparer cannot sort " +
        s"these):\n  ${offenders.mkString("\n  ")}")
  }
}
