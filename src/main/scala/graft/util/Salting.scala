package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-stage salted aggregation. A skewed group key
  * (few distinct values over billions of rows — e.g. 3 return flags over
  * a 100 TB lineitem) funnels whole key-groups through single reducers;
  * salting spreads each key over `nSalts` partial groups, aggregates,
  * then re-aggregates the partials — turning one hot reducer into
  * `nSalts` balanced ones. Catalyst's partial aggregation already covers
  * sum/count-style skew within a stage; explicit salting is for the
  * shuffle itself and for operations AQE can't split (e.g. exact
  * per-key sketches). AQE skew-join handles the join-side equivalent
  * automatically when `spark.sql.adaptive.enabled` is on.
  */
object Salting {

  /** Deterministic salt column derived from a spread column (NOT random —
    * results must be reproducible across runs and engines). */
  def saltCol(spread: Column, nSalts: Int): Column =
    pmod(hash(spread), lit(nSalts))

  /** Two-stage salted sum: exact regardless of salt count because the
    * partials are re-aggregated with the same associative function. */
  def saltedSum(df: DataFrame, groupKeys: Seq[Column], spread: Column,
      sumExpr: Column, resultName: String, nSalts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", saltCol(spread, nSalts))
      .groupBy(groupKeys :+ col("_salt"): _*)
      .agg(sum(sumExpr).as("_partial"), count(lit(1)).as("_pn"))
    partial
      .groupBy(groupKeys: _*)
      .agg(sum(col("_partial")).as(resultName), sum(col("_pn")).as("n_rows"))
  }

  /** Keys whose row count exceeds `hotFactor` × the mean per-key count.
    * The heavy-hitter set is bounded by construction — at most
    * total/(hotFactor·mean) = #keys/hotFactor rows, and in real skew a
    * handful — so it always broadcasts. */
  def hotKeys(df: DataFrame, key: String, hotFactor: Int = 4): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("_n"))
    // bounded collect: one scalar (the mean per-key row count);
    // avg() over an EMPTY probe is NULL — treat as "no hot keys"
    // rather than NPE-crashing the caller's join on empty input
    val meanN = Option(counts.agg(avg(col("_n"))).head()
      .getAs[java.lang.Double](0)).fold(Double.MaxValue)(_.doubleValue)
    counts.filter(col("_n") > meanN * hotFactor).select(col(key))
  }

  /** Hot-key-gated SALTED EQUI-JOIN — the manual join-skew treatment,
    * replicating the build side ONLY under keys a frequency pass flags
    * as hot; cold keys ride salt 0 with zero overhead.
    *
    * Why gated, measured (round-7 `graft.SkewProbe`, 30% of probe rows
    * on one hot key): blanket ×8 salting took 24.1 s at the 100×
    * directory vs 10.1 s for AQE's runtime skew split and 22.4 s for
    * the UNTREATED join — replicating the whole build side costs more
    * than the skew it cures, losing even to doing nothing. So at 100 TB
    * the first-choice treatment is AQE (`skewJoin.enabled`, on by
    * default, re-plans from real shuffle sizes); this manual form
    * exists for the places AQE cannot re-plan — a pre-partitioned
    * stateful stage, a fixed-layout mid-pipeline exchange — and then it
    * must only pay for the keys that are actually hot. */
  def hotSaltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, spread: Column,
      nSalts: Int = 8, hotFactor: Int = 4): DataFrame = {
    val hot = hotKeys(probe, probeKey, hotFactor)
      .withColumnRenamed(probeKey, "__hot")
    val p = probe
      .join(broadcast(hot), col(probeKey) === col("__hot"), "left")
      .withColumn("__salt", when(col("__hot").isNotNull,
        saltCol(spread, nSalts)).otherwise(lit(0)))
      .drop("__hot")
    val b = build
      .join(broadcast(hot), col(buildKey) === col("__hot"), "left")
      .withColumn("__salt", explode(when(col("__hot").isNotNull,
        expr(s"sequence(0, ${nSalts - 1})")).otherwise(array(lit(0)))))
      .drop("__hot")
    p.join(b, p(probeKey) === b(buildKey) && p("__salt") === b("__salt"))
      .drop("__salt")
  }
}
