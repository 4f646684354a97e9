package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import Tables.load

/** Materialization battery: the three table-shaping operators a CDC
  * engine's consumers run on the WAREHOUSE side of the pipe — merge the
  * change stream into current state (q126), keep the full slowly-changing
  * history (q127), and lay the merged table out for multi-dimension scan
  * pruning (q128). The reference stops at delivering ordered deltas to
  * Kafka (`core/.../ChangeDeltaSerDe.java` envelopes, per-entity ordered
  * partitions); these gates state what the downstream applies to them,
  * re-expressed as single-shuffle Spark plans over the `events` change
  * stream (key = `user_id`, change order = `ts, event_id`).
  *
  * Scale shapes:
  *  - q126/q127: ONE shuffle on the merge key; the window rank and the
  *    per-key aggregate reuse the same hash partitioning (no second
  *    exchange — the same device as the q26 FSM). Latest-wins with a
  *    delete rule is exactly Debezium/Delta `MERGE` compaction; per-key
  *    state is one row, so a 1000-executor run is embarrassingly
  *    key-parallel with no driver state.
  *  - q128: the Morton key is computed row-local by a codegen'd
  *    expression, and FILE assignment is a bit-prefix of the key — no
  *    global sort, no single-partition window, no exchange at all beyond
  *    the final stats aggregate. That is deliberately the
  *    range-partition-free formulation that survives 100 TB: tiles are a
  *    fixed grid of the key space, so the layout job is one map + one agg
  *    regardless of row count.
  */
object Materialize {

  // --------------------------------------------------------------- q126

  /** q126: CDC MERGE — materialize current state from the change stream,
    * latest-wins per key with a delete rule (`error` = tombstone, the
    * DLQ-adjacent convention of the fixture stream). Emits per surviving
    * key the last change's payload, the change count, and the update
    * instant: the table a `MERGE INTO` on an ordered CDC feed produces. */
  private def qCdcMerge(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast(LongType).as("n_changes"),
        max(when(col("rn") === 1, col("event_type"))).as("last_type"),
        max(when(col("rn") === 1, col("value"))).as("last_value"),
        max(when(col("rn") === 1, col("ts"))).as("updated_at"))
      .filter(col("last_type") =!= "error")
      .orderBy(col("user_id"))
  }

  private val qCdcMergeSql =
    """WITH r AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_changes,
      |  max(CASE WHEN rn = 1 THEN event_type END) AS last_type,
      |  max(CASE WHEN rn = 1 THEN value END) AS last_value,
      |  max(CASE WHEN rn = 1 THEN ts END) AS updated_at
      |FROM r GROUP BY user_id
      |HAVING max(CASE WHEN rn = 1 THEN event_type END) <> 'error'
      |ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------- q127

  /** q127: SCD TYPE-2 — the history-keeping complement of q126: per key,
    * collapse runs of the unchanged tracked attribute and emit one
    * validity interval per actual change (`valid_to` = next change's
    * instant, NULL while current). Change detection is a `lag` on the
    * full stream; interval stitching is a `lead` on the survivors —
    * both windows share the `user_id` hash partitioning, so the whole
    * dimension build is one shuffle. */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    load(s, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(ord))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(ord))
      .withColumn("valid_to", lead(col("ts"), 1).over(ord))
      .select(col("user_id"), col("version").cast(LongType),
        col("event_type"), col("ts").as("valid_from"), col("valid_to"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  private val qScd2Sql =
    """WITH d AS (
      |  SELECT *, LAG(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |c AS (
      |  SELECT user_id, event_type, ts, event_id FROM d
      |  WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
      |  event_type, ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END
      |    AS BIGINT) AS is_current
      |FROM c
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  // --------------------------------------------------------------- q128

  /** q128: Z-ORDER LAYOUT — cluster `lineitem` on the Morton interleave
    * of (`l_partkey`, `l_suppkey`) and report per-tile min/max statistics
    * plus whether a probe predicate (`l_partkey` in [500, 599]) can skip
    * the tile. A tile is the top `22-Shift` bits of the Z-key — a fixed
    * grid of the key space — so BOTH dimensions are range-bounded inside
    * every tile and the hit flags show the probe touching only the tiles
    * whose partkey band overlaps: min/max footer stats become 2-D
    * pruning, the thing single-column sort layout cannot give. */
  private val ZShift = 12
  private val ProbeLo = 500
  private val ProbeHi = 599

  private def qZorderLayout(s: SparkSession, dir: String): DataFrame = {
    val z = graft.functions.bits.morton(col("l_partkey"), col("l_suppkey"))
    load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        shiftright(z, ZShift).as("tile"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        min(col("l_partkey")).as("min_part"),
        max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"),
        max(col("l_suppkey")).as("max_supp"))
      .withColumn("probe_hit",
        when(col("min_part") <= ProbeHi && col("max_part") >= ProbeLo, 1L)
          .otherwise(0L))
      .orderBy(col("tile"))
  }

  private val qZorderLayoutSql =
    s"""WITH z AS (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(list_sum(list_transform(range(0, 11), i ->
       |      (((l_partkey >> i) & 1) << (2 * i))
       |      + (((l_suppkey >> i) & 1) << (2 * i + 1)))) AS BIGINT)
       |      >> $ZShift AS tile
       |  FROM lineitem)
       |SELECT tile, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
       |  CAST(CASE WHEN min(l_partkey) <= $ProbeHi
       |    AND max(l_partkey) >= $ProbeLo THEN 1 ELSE 0 END AS BIGINT)
       |    AS probe_hit
       |FROM z GROUP BY tile ORDER BY tile""".stripMargin

  // ------------------------------------------------------------- registry

  def defs: Seq[(String, QueryDef)] = Seq(
    "q126_cdc_merge" -> QueryDef(qCdcMerge, Some(qCdcMergeSql),
      "CDC merge materialization: latest-wins per key + delete rule"),
    "q127_scd2_history" -> QueryDef(qScd2, Some(qScd2Sql),
      "SCD type-2 dimension: change detection + validity intervals"),
    "q128_zorder_layout" -> QueryDef(qZorderLayout, Some(qZorderLayoutSql),
      "Z-order layout: Morton tiles, per-tile stats, 2-D probe pruning"))
}
