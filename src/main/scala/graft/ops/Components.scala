package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge set — the clustering
  * stage that turns pairwise near-dup VERDICTS (MinHash/SimHash verify
  * output) into dedup CLUSTERS with one keeper per cluster. The
  * reference has no graph operator; this is pipeline-completing
  * machinery a corpus dedup actually ships: pairs alone don't tell you
  * which documents to drop when duplicates chain (a~b, b~c ⇒ {a,b,c}
  * is one cluster with one keeper, not two independent pairs).
  *
  * Algorithm: iterative min-label propagation (the Pregel/GraphX
  * ConnectedComponents shape, expressed as DataFrame joins so Catalyst
  * plans it):
  *   L₀(v) = v;  Lᵢ₊₁(v) = min(Lᵢ(v), min over neighbors u of Lᵢ(u))
  * Each round is one equi-shuffle of the edge list on the node key + a
  * min aggregation — no all-pairs work anywhere. Rounds needed = the
  * eccentricity of each component's minimum node ≤ component diameter.
  * Near-dup clusters are dense (most pairs within a cluster are
  * themselves candidate pairs), so the diameter is small and bounded in
  * practice; for adversarial long-chain graphs the standard upgrade is
  * large-star/small-star (O(log² n) rounds) — same join shapes, more
  * of them.
  *
  * Scale notes: per round, cost is O(|E|) shuffle + O(|V|) aggregate;
  * `localCheckpoint` truncates the growing lineage each round (without
  * it the plan doubles per iteration and the driver, not the data,
  * becomes the bottleneck — same device `FsImageBootstrap` uses for its
  * iterative path resolution). The convergence check is a count on the
  * propagation delta, which is already materialized by the checkpoint.
  */
object Components {

  /** @param edges DataFrame with two columns naming node ids (one row
    *              per undirected edge, either orientation)
    * @return (id, component) — component = min node id reachable
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    val src = edges.columns(0)
    val dst = edges.columns(1)
    val both = edges.select(col(src).as("eSrc"), col(dst).as("eDst"))
      .union(edges.select(col(dst).as("eSrc"), col(src).as("eDst")))
      .localCheckpoint(true)
    // Size the per-round shuffles to the GRAPH, not the session's
    // corpus-scale default: the verified-pair graph is orders of
    // magnitude smaller than the corpus it came from, and a 32-way
    // shuffle of a few hundred edges pays 32 task launches per stage
    // per round for nothing. ~1M edges/partition keeps a round's
    // partition in memory at any scale; the count is free (the edge
    // list was just materialized by the checkpoint).
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      both.count() / 1000000L + 1L)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      var labels = both.select(col("eSrc").as("id")).distinct()
        .select(col("id"), col("id").as("component"))
        .localCheckpoint(true)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val incoming = both.join(labels, col("eSrc") === col("id"))
          .groupBy(col("eDst")).agg(min(col("component")).as("viaEdge"))
        // carry the previous label through the round so convergence is a
        // filter over the just-checkpointed result — one job per round
        // for the propagation, one partition-local scan for the check,
        // no second join
        val next = labels.withColumnRenamed("component", "prev")
          .join(incoming, col("id") === col("eDst"), "left")
          .select(col("id"), col("prev"),
            least(col("prev"), coalesce(col("viaEdge"), col("prev")))
              .as("component"))
          .localCheckpoint(true)
        converged = next.filter(col("component") < col("prev")).isEmpty
        labels = next.select(col("id"), col("component"))
        round += 1
      }
      require(converged,
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "component diameter exceeds the bound; switch to star contraction")
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
