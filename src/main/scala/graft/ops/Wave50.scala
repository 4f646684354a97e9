package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Fiftieth wave (round 10): the full as-of join battery —
  *
  *  - q296: MERGE-ASOF DIRECTIONS. q11 ships the classic BACKWARD
  *    as-of (last signup ≤ t); this completes the pandas
  *    `merge_asof` surface: per purchase, the backward, FORWARD
  *    (first signup ≥ t), and NEAREST signup within a 1-hour
  *    tolerance, each as a keyed RANGE-frame window — max/min over a
  *    conditional instead of last/first over a rows frame, so
  *    equal-timestamp events are handled by TIME semantics (ties all
  *    included) rather than stream-position luck. Nearest tie
  *    (equal distance both directions) resolves BACKWARD — stated,
  *    not inherited from an engine. Missing matches surface as -1
  *    sentinels (null-free atomic output). No join materializes:
  *    the whole battery is two RANGE windows over the per-user
  *    event stream, the same single-pass shape q11 proved.
  *
  * Scale shape: two keyed windows partitioned by user_id — per-key
  * streams, no global sort, no pairwise join at any corpus size. */
object Wave50 {

  // ------------------------------------------------------------- q296

  private val TolUs = 3600L * 1000000L // 1 hour

  private def qAsofDirections(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val wb = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    ev
      .withColumn("back_t",
        max(when(col("event_type") === "signup", col("t"))).over(wb))
      .withColumn("fwd_t",
        min(when(col("event_type") === "signup", col("t"))).over(wf))
      .filter(col("event_type") === "purchase")
      .withColumn("back_ok",
        col("back_t").isNotNull && col("t") - col("back_t") <= TolUs)
      .withColumn("fwd_ok",
        col("fwd_t").isNotNull && col("fwd_t") - col("t") <= TolUs)
      .select(col("event_id"), col("user_id"), col("t").as("t_us"),
        when(col("back_ok"), col("back_t")).otherwise(-1L).as("back_us"),
        when(col("fwd_ok"), col("fwd_t")).otherwise(-1L).as("fwd_us"),
        when(col("back_ok") && (!col("fwd_ok") ||
            col("t") - col("back_t") <= col("fwd_t") - col("t")),
            col("back_t"))
          .when(col("fwd_ok"), col("fwd_t"))
          .otherwise(-1L).as("nearest_us"),
        when(col("back_ok") && (!col("fwd_ok") ||
            col("t") - col("back_t") <= col("fwd_t") - col("t")),
            "back")
          .when(col("fwd_ok"), "fwd")
          .otherwise("none").as("nearest_dir"))
      .orderBy(col("event_id"))
  }

  private val qAsofDirectionsSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t
       |  FROM events),
       |w AS (
       |  SELECT user_id, event_id, event_type, t,
       |    MAX(CASE WHEN event_type = 'signup' THEN t END)
       |      OVER (PARTITION BY user_id ORDER BY t
       |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS back_t,
       |    MIN(CASE WHEN event_type = 'signup' THEN t END)
       |      OVER (PARTITION BY user_id ORDER BY t
       |        RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |      AS fwd_t
       |  FROM e),
       |p AS (
       |  SELECT *, back_t IS NOT NULL AND t - back_t <= $TolUs AS bok,
       |    fwd_t IS NOT NULL AND fwd_t - t <= $TolUs AS fok
       |  FROM w WHERE event_type = 'purchase')
       |SELECT event_id, user_id, t AS t_us,
       |  CASE WHEN bok THEN back_t ELSE -1 END AS back_us,
       |  CASE WHEN fok THEN fwd_t ELSE -1 END AS fwd_us,
       |  CASE WHEN bok AND (NOT fok OR t - back_t <= fwd_t - t)
       |    THEN back_t WHEN fok THEN fwd_t ELSE -1 END AS nearest_us,
       |  CASE WHEN bok AND (NOT fok OR t - back_t <= fwd_t - t)
       |    THEN 'back' WHEN fok THEN 'fwd' ELSE 'none' END
       |    AS nearest_dir
       |FROM p ORDER BY event_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q296_asof_directions" -> QueryDef(qAsofDirections,
      Some(qAsofDirectionsSql),
      "full merge_asof battery: backward / forward / nearest signup " +
        "per purchase within a 1-hour tolerance, keyed RANGE-frame " +
        "windows (tie-robust time semantics), nearest tie resolves " +
        "backward, -1 sentinels for no match"))
}
