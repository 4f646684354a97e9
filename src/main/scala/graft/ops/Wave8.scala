package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Eighth-wave battery (round 7): distribution-drift, annotation-
  * agreement, and vocabulary statistics — the dataset-health metrics a
  * training-data platform runs on every corpus refresh. House rules:
  * integer-exact arithmetic wherever engines could disagree (products
  * routed through DECIMAL(38,0)/HUGEINT where they can pass 2^63),
  * every heavy aggregation map-side combinable, per-group windows only
  * on bounded histogram tables (the q154/q168 lesson), deterministic
  * ORDER BY with tie-breaks.
  *
  * The word alphabet of the `documents` table is tiny (31 tokens), so
  * "terms" here are word n-grams: 2-grams (916 types, df-rich) for
  * burstiness, 3-grams (~16k types at sf0.01, ~58% singletons) for
  * richness/overlap/growth — measured, not assumed.
  */
object Wave8 {

  /** Word n-gram term table: (doc_id, lang, source, t). One row per
    * OCCURRENCE (not distinct) — callers distinct where needed. */
  private def grams(docs: DataFrame, n: Int): DataFrame = {
    val concatCols = (0 until n).map(j => col("ws")(col("i") + j))
    docs
      .select(col("doc_id"), col("lang"), col("source"),
        split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(sequence(lit(0), size(col("ws")) - n)).as("i"),
        col("ws"))
      .select(col("doc_id"), col("lang"), col("source"),
        concat_ws(" ", concatCols: _*).as("t"))
  }

  /** DuckDB CTE `g(doc_id, lang, source, t)` mirroring [[grams]]. */
  private def gramsCte(n: Int): String = {
    val parts = (0 until n).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""w AS (
       |  SELECT doc_id, lang, source, string_split(text, ' ') AS ws
       |  FROM documents WHERE len(string_split(text, ' ')) >= $n),
       |g AS (
       |  SELECT doc_id, lang, source,
       |    unnest(list_transform(range(1, len(ws) - ${n - 2}),
       |      i -> $parts)) AS t
       |  FROM w)""".stripMargin
  }

  // ------------------------------------------------------------- q190

  /** q190: TWO-SAMPLE KOLMOGOROV–SMIRNOV DRIFT, integer-exact — "did
    * the value distribution shift between populations": here sample A
    * = even user_ids, sample B = odd, per event type (the shape a
    * platform runs between yesterday's corpus and today's). The KS
    * statistic is the max CDF gap; cross-multiplied counts keep it
    * exact: D_ppm = max_v |cumA(v)·nB − cumB(v)·nA| · 10^6 div
    * (nA·nB), products in DECIMAL(38,0) so petabyte-scale counts
    * cannot overflow.
    *
    * Scale shape: the only big-data op is the map-side-combinable
    * groupBy(type, value); the running CDFs ride the VALUE HISTOGRAM
    * (bounded alphabet — same device and caveat as q185; the q189
    * two-level scan is the fallback for truly continuous columns). */
  private def qKsDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = load(s, dir, "events")
      .select(col("event_type"),
        expr("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)").as("v"),
        pmod(col("user_id"), lit(2)).as("grp"))
    val hist = ev.groupBy(col("event_type"), col("v"))
      .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(expr("abs(CAST(cuma AS DECIMAL(38,0)) * nb - " +
          "CAST(cumb AS DECIMAL(38,0)) * na)")).as("d_num"))
      .withColumn("ks_ppm", expr(
        "CAST(d_num * 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) " +
          "AS BIGINT)"))
      .select(col("event_type"), col("n_a"), col("n_b"), col("ks_ppm"))
      .orderBy(col("event_type"))
  }

  private val qKsDriftSql =
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v,
      |    user_id % 2 AS grp
      |  FROM events),
      |hist AS (
      |  SELECT event_type, v,
      |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM ev GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type,
      |    SUM(ca) OVER (PARTITION BY event_type ORDER BY v) AS cuma,
      |    SUM(cb) OVER (PARTITION BY event_type ORDER BY v) AS cumb,
      |    SUM(ca) OVER (PARTITION BY event_type) AS na,
      |    SUM(cb) OVER (PARTITION BY event_type) AS nb
      |  FROM hist)
      |SELECT event_type, CAST(MAX(na) AS BIGINT) AS n_a,
      |  CAST(MAX(nb) AS BIGINT) AS n_b,
      |  CAST(MAX(abs(CAST(cuma AS HUGEINT) * nb -
      |               CAST(cumb AS HUGEINT) * na)) * 1000000
      |    // (CAST(MAX(na) AS HUGEINT) * MAX(nb)) AS BIGINT) AS ks_ppm
      |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- q191

  /** q191: COHEN'S KAPPA inter-annotator agreement, integer-exact —
    * the label-quality statistic before trusting human (or model)
    * annotations. Two deterministic 3-class annotators are synthesized
    * from document stats (a1 from length alone, a2 length+id — so they
    * correlate without agreeing); kappa corrects observed agreement
    * for the agreement their marginals would produce by chance:
    * kappa_milli = (po_ppm − pe_ppm)·1000 div (10^6 − pe_ppm), with pe
    * from the marginal products in DECIMAL(38,0) (n² passes 2^63 long
    * before 100 TB).
    *
    * Scale shape: ONE map-side-combinable groupBy(lang, a1, a2) builds
    * the 3×3 confusion matrix; marginals, po and pe all come from that
    * ≤9-row-per-language table. Chance-perfect marginals (pe = 10^6)
    * define kappa = 0. */
  private def qKappa(s: SparkSession, dir: String): DataFrame = {
    val cm = load(s, dir, "documents")
      .select(col("lang"),
        expr("(n_chars div 50) % 3").as("a1"),
        expr("((n_chars + doc_id) div 50) % 3").as("a2"))
      .groupBy(col("lang"), col("a1"), col("a2"))
      .agg(count(lit(1)).as("c"))
    val base = cm.groupBy(col("lang"))
      .agg(sum(col("c")).as("n_docs"),
        sum(when(col("a1") === col("a2"), col("c")).otherwise(0L))
          .as("agree"))
    // marginal product Σ_k row_k·col_k — classes absent from either
    // marginal contribute 0, so the inner join on the class id is exact
    val rows = cm.groupBy(col("lang"), col("a1").as("k"))
      .agg(sum(col("c")).as("r"))
    val cols = cm.groupBy(col("lang"), col("a2").as("k"))
      .agg(sum(col("c")).as("cl"))
    val pe = rows.join(cols, Seq("lang", "k"))
      .groupBy(col("lang"))
      .agg(sum(expr("CAST(r AS DECIMAL(38,0)) * cl")).as("pe_num"))
    base.join(pe, Seq("lang"))
      .withColumn("po_ppm", expr("agree * 1000000 div n_docs"))
      .withColumn("pe_ppm", expr(
        "CAST(pe_num * 1000000 div " +
          "(CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)"))
      .withColumn("kappa_milli", expr(
        "CASE WHEN pe_ppm = 1000000 THEN 0L " +
          "ELSE (po_ppm - pe_ppm) * 1000 div (1000000 - pe_ppm) END"))
      .select(col("lang"), col("n_docs"), col("po_ppm"), col("pe_ppm"),
        col("kappa_milli"))
      .orderBy(col("lang"))
  }

  private val qKappaSql =
    """WITH d AS (
      |  SELECT lang, (n_chars // 50) % 3 AS a1,
      |    ((n_chars + doc_id) // 50) % 3 AS a2
      |  FROM documents),
      |cm AS (
      |  SELECT lang, a1, a2, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM d GROUP BY 1, 2, 3),
      |base AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN a1 = a2 THEN c ELSE 0 END) AS BIGINT)
      |      AS agree
      |  FROM cm GROUP BY 1),
      |r AS (SELECT lang, a1 AS k, CAST(SUM(c) AS BIGINT) AS r
      |      FROM cm GROUP BY 1, 2),
      |cl AS (SELECT lang, a2 AS k, CAST(SUM(c) AS BIGINT) AS cl
      |       FROM cm GROUP BY 1, 2),
      |pe AS (
      |  SELECT r.lang, SUM(CAST(r.r AS HUGEINT) * cl.cl) AS pe_num
      |  FROM r JOIN cl ON r.lang = cl.lang AND r.k = cl.k
      |  GROUP BY 1),
      |m AS (
      |  SELECT base.lang, n_docs, agree * 1000000 // n_docs AS po_ppm,
      |    CAST(pe_num * 1000000 //
      |      (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS pe_ppm
      |  FROM base JOIN pe ON base.lang = pe.lang)
      |SELECT lang, n_docs, CAST(po_ppm AS BIGINT) AS po_ppm, pe_ppm,
      |  CAST(CASE WHEN pe_ppm = 1000000 THEN 0
      |       ELSE (po_ppm - pe_ppm) * 1000 // (1000000 - pe_ppm) END
      |    AS BIGINT) AS kappa_milli
      |FROM m ORDER BY lang""".stripMargin

  // ------------------------------------------------------------- q192

  /** q192: CHAO1 VOCABULARY RICHNESS per source — "how much vocabulary
    * have we NOT seen yet": the species-richness estimator applied to
    * 3-gram types, the signal behind "is this source mined out".
    * Bias-corrected form stays integer and total: chao1_milli =
    * 1000·s_obs + 1000·f1·(f1−1) div (2·(f2+1)), where f1/f2 = types
    * seen exactly once/twice.
    *
    * Scale shape: groupBy(source, t) term histogram (map-side
    * combinable — the only pass over gram volume), then the
    * frequency-of-frequencies on the type table; output one row per
    * source. */
  private def qChao1(s: SparkSession, dir: String): DataFrame = {
    val tf = grams(load(s, dir, "documents"), 3)
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("source"))
      .agg(count(lit(1)).as("s_obs"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .withColumn("chao1_milli", expr(
        "1000 * s_obs + 1000 * f1 * (f1 - 1) div (2 * (f2 + 1))"))
      .select(col("source"), col("s_obs"), col("f1"), col("f2"),
        col("chao1_milli"))
      .orderBy(col("source"))
  }

  private val qChao1Sql =
    s"""WITH ${gramsCte(3)},
       |tf AS (
       |  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM g GROUP BY 1, 2)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS s_obs,
       |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       |  CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       |  CAST(1000 * COUNT(*)
       |    + 1000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
       |        * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
       |      // (2 * (SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
       |    AS BIGINT) AS chao1_milli
       |FROM tf GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------- q193

  /** q193: TERM BURSTINESS (variance-to-mean ratio) top-20 — terms
    * whose occurrences CLUMP into few documents (VMR ≫ 1) versus
    * spread Poisson-like (VMR ≈ 1): the screen for template/boiler
    * terms that inflate n-gram counts. Over all n docs (absent docs
    * count 0): vmr_micro = (n·S2 − S1²)·10^6 div (n·S1) with S1 = Σc,
    * S2 = Σc² per 2-gram, products in DECIMAL(38,0).
    *
    * Scale shape: per-(doc, term) counts then per-term partial aggs —
    * both map-side combinable; the doc total rides a broadcast 1-row
    * scalar; top-20 is a TakeOrdered (per-partition heap + k-merge),
    * never a global sort. */
  private def qBurstiness(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val nDocs = docs.filter(size(split(col("text"), " ")) >= 2)
      .agg(count(lit(1)).as("n"))
    val perDoc = grams(docs, 2)
      .groupBy(col("t"), col("doc_id")).agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("t"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("s1"),
        sum(expr("c * c")).as("s2"))
      .filter(col("df") >= 20)
      .crossJoin(broadcast(nDocs))
      .withColumn("vmr_micro", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)" +
          " * 1000000 div (CAST(n AS DECIMAL(38,0)) * s1) AS BIGINT)"))
      .select(col("t"), col("df"), col("s1"), col("s2"), col("vmr_micro"))
      .orderBy(col("vmr_micro").desc, col("t").asc)
      .limit(20)
  }

  private val qBurstinessSql =
    s"""WITH ${gramsCte(2)},
       |n AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
       |  WHERE len(string_split(text, ' ')) >= 2),
       |pd AS (
       |  SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM g GROUP BY 1, 2),
       |tt AS (
       |  SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
       |    CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
       |  FROM pd GROUP BY 1 HAVING COUNT(*) >= 20)
       |SELECT t, df, s1, s2,
       |  CAST((CAST(n.n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
       |    * 1000000 // (CAST(n.n AS HUGEINT) * s1) AS BIGINT) AS vmr_micro
       |FROM tt, n
       |ORDER BY vmr_micro DESC, t LIMIT 20""".stripMargin

  // ------------------------------------------------------------- q194

  /** q194: SOURCE-PAIR VOCABULARY OVERLAP — the 20×20 Jaccard matrix
    * over 3-gram type sets: which sources are near-clones of each
    * other at the vocabulary level (feeds source-mixture planning and
    * flags scraped-twice feeds). jac_ppm = |A∩B|·10^6 div
    * (|A|+|B|−|A∩B|), all counts exact.
    *
    * Scale shape: posting-list algebra — distinct (t, source), pairs
    * form only WITHIN a term's source list (≤20 sources ⇒ ≤190 pairs
    * per term, a bounded fan-out equi-join on t), per-source type
    * counts broadcast onto the 190-row pair table. Never source×source
    * over raw grams. */
  private def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val sv = grams(load(s, dir, "documents"), 3)
      .select(col("t"), col("source")).distinct()
    val sizes = sv.groupBy(col("source")).agg(count(lit(1)).as("nt"))
    val inter = sv.as("x")
      .join(sv.as("y"),
        col("x.t") === col("y.t") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "src_a")
        .withColumnRenamed("nt", "n_a")), Seq("src_a"))
      .join(broadcast(sizes.withColumnRenamed("source", "src_b")
        .withColumnRenamed("nt", "n_b")), Seq("src_b"))
      .withColumn("jac_ppm",
        expr("inter * 1000000 div (n_a + n_b - inter)"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("inter"), col("jac_ppm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val qSourceOverlapSql =
    s"""WITH ${gramsCte(3)},
       |sv AS (SELECT DISTINCT t, source FROM g),
       |sizes AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nt
       |  FROM sv GROUP BY 1),
       |inter AS (
       |  SELECT x.source AS src_a, y.source AS src_b,
       |    CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM sv x JOIN sv y ON x.t = y.t AND x.source < y.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b, a.nt AS n_a, b.nt AS n_b, inter,
       |  CAST(inter * 1000000 // (a.nt + b.nt - inter) AS BIGINT)
       |    AS jac_ppm
       |FROM inter
       |JOIN sizes a ON a.source = src_a
       |JOIN sizes b ON b.source = src_b
       |ORDER BY src_a, src_b""".stripMargin

  // ------------------------------------------------------------- q195

  /** q195: VOCABULARY GROWTH CURVE — "is the corpus saturating":
    * 3-gram types by FIRST-occurrence position, bucketed into 20
    * equal doc_id ranges, with the cumulative type count per bucket.
    * A flattening curve says more of the same source adds no new
    * language; the slope prices marginal data.
    *
    * Scale shape: term → min(doc_id) is one map-side-combinable agg
    * over gram volume; bucketing and the running sum happen on the
    * ≤20-row bucket table (window over a broadcast-scale group). */
  private def qVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val docs = load(s, dir, "documents")
    val maxd = docs.agg((max(col("doc_id")) + 1).as("maxd"))
    val first = grams(docs, 3)
      .groupBy(col("t")).agg(min(col("doc_id")).as("fd"))
    first.crossJoin(broadcast(maxd))
      .withColumn("bucket", expr("fd * 20 div maxd"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))
      .withColumn("cum_terms",
        sum(col("new_terms")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("bucket"), col("new_terms"), col("cum_terms"))
      .orderBy(col("bucket"))
  }

  private val qVocabGrowthSql =
    s"""WITH ${gramsCte(3)},
       |maxd AS (SELECT MAX(doc_id) + 1 AS maxd FROM documents),
       |first AS (
       |  SELECT t, MIN(doc_id) AS fd FROM g GROUP BY 1),
       |b AS (
       |  SELECT CAST(fd * 20 // maxd AS BIGINT) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS new_terms
       |  FROM first, maxd GROUP BY 1)
       |SELECT bucket, new_terms,
       |  CAST(SUM(new_terms) OVER (ORDER BY bucket) AS BIGINT)
       |    AS cum_terms
       |FROM b ORDER BY bucket""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(
    "q190_ks_drift" -> QueryDef(qKsDrift, Some(qKsDriftSql),
      "two-sample KS statistic, cross-multiplied integer CDFs on the value histogram"),
    "q191_cohens_kappa" -> QueryDef(qKappa, Some(qKappaSql),
      "Cohen's kappa from a 3x3 confusion matrix, DECIMAL-routed marginal products"),
    "q192_chao1_richness" -> QueryDef(qChao1, Some(qChao1Sql),
      "Chao1 vocabulary-richness estimator per source, bias-corrected integer form"),
    "q193_burstiness" -> QueryDef(qBurstiness, Some(qBurstinessSql),
      "term burstiness (VMR) top-20 via TakeOrdered, DECIMAL-routed products"),
    "q194_source_overlap" -> QueryDef(qSourceOverlap, Some(qSourceOverlapSql),
      "source-pair vocabulary Jaccard matrix via bounded posting-list pair join"),
    "q195_vocab_growth" -> QueryDef(qVocabGrowth, Some(qVocabGrowthSql),
      "vocabulary growth curve: first-occurrence bucketing + 20-row running sum"))
}
