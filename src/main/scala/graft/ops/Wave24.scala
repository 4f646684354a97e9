package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Twenty-fourth wave (round 8): search-infrastructure operators —
  * three shapes every retrieval-backed data platform ships:
  *
  *  - q242: AUTOCOMPLETE candidate tables — top-3 completions per
  *    word prefix, built through the engine's own TopKPerGroup
  *    physical operator (partial per-partition heaps, no global sort,
  *    no per-group row_number shuffle-then-filter).
  *  - q243: K-CORE decomposition of the co-purchase graph — the
  *    standard "peel nodes with degree < k" fixpoint as a bounded
  *    iterative loop with Pin-cut lineage; the DuckDB oracle is the
  *    SAME peel unrolled to the loop bound, so the iteration count,
  *    not just the final set, is contract-checked.
  *  - q244: POSITIONAL PHRASE match — exact adjacent-bigram search
  *    through a positional posting list, pruned to the phrase
  *    vocabulary BEFORE the self-join (the posting-list discipline:
  *    candidate pairs scale with term frequency, not corpus size).
  *
  * House rules: integer exactness, deterministic orders, DuckDB oracle
  * per query, windows partitioned or provably bounded. */
object Wave24 {

  // ------------------------------------------------------------- q242

  /** q242: AUTOCOMPLETE top-3 completions for every 1–3 char prefix,
    * reported for the 50 heaviest prefixes. Word counts are one
    * map-side-combinable groupBy; each word then fans out to ≤3 prefix
    * rows (bounded ×3 blowup); TopKPerGroup keeps 3 rows per prefix
    * with per-partition heaps. The 50-prefix report cap is a
    * TakeOrdered, and the rank column is a window over ≤3-row
    * partitions. */
  private def qAutocomplete(s: SparkSession, dir: String): DataFrame = {
    val wc = load(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val px = wc.select(explode(sequence(lit(1), lit(3))).as("l"),
        col("word"), col("cnt"))
      .filter(length(col("word")) >= col("l"))
      .select(expr("substring(word, 1, l)").as("pfx"), col("word"),
        col("cnt"))
    val pxP = graft.util.Pin(px) // ≤3×vocab rows, consumed twice
    val tk = graft.plans.TopK.perGroup(pxP, Seq(col("pfx")),
        Seq(col("cnt").desc, col("word").asc), 3)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("pfx"))
          .orderBy(col("cnt").desc, col("word"))).cast("long"))
    val top = pxP.groupBy(col("pfx")).agg(sum(col("cnt")).as("ptotal"))
      .orderBy(col("ptotal").desc, col("pfx")).limit(50)
    tk.join(broadcast(top), Seq("pfx"))
      .select(col("pfx"), col("ptotal"), col("rank"), col("word"),
        col("cnt"))
      .orderBy(col("ptotal").desc, col("pfx"), col("rank"))
  }

  private val qAutocompleteSql =
    """WITH w AS (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |wc AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM w WHERE len(word) > 0 GROUP BY 1),
      |px AS (
      |  SELECT substr(word, 1, l) AS pfx, word, cnt
      |  FROM wc CROSS JOIN unnest([1, 2, 3]) AS u(l)
      |  WHERE len(word) >= l),
      |tk AS (
      |  SELECT pfx, word, cnt, CAST(row_number() OVER (
      |    PARTITION BY pfx ORDER BY cnt DESC, word) AS BIGINT) AS rank
      |  FROM px),
      |pt AS (
      |  SELECT pfx, CAST(SUM(cnt) AS BIGINT) AS ptotal
      |  FROM px GROUP BY 1),
      |top AS (SELECT * FROM pt ORDER BY ptotal DESC, pfx LIMIT 50)
      |SELECT t.pfx, ptotal, rank, word, cnt
      |FROM tk t JOIN top ON top.pfx = t.pfx
      |WHERE rank <= 3
      |ORDER BY ptotal DESC, t.pfx, rank""".stripMargin

  // ------------------------------------------------------------- q243

  /** Peel-loop bound shared by the Spark loop and the unrolled oracle:
    * both stop after exactly this many peels unless the fixpoint lands
    * earlier, so the two sides agree even on a hypothetical input that
    * hasn't converged by the bound. */
  private val CoreRounds = 20
  private val CoreK = 3

  /** q243: K-CORE (k=3) of the co-purchase graph (q217's edges: parts
    * co-ordered ≥2 times). Each peel round is one degree aggregate +
    * two semi-joins, lineage cut by Pin so round r's plan never nests
    * round r−1's; the loop exits early at the fixpoint (edge count
    * stable — the count is the per-round action, a scalar, never a
    * collect). Output: the 20 highest-degree core members beside the
    * core's node/edge totals. */
  private def qKCore(s: SparkSession, dir: String): DataFrame = {
    // battery-shared pinned edge device (q206/q217/q243)
    val e = Graphs.strongEdges(s, dir)
    var edges = graft.util.Pin(Graphs.symmetricEdges(e))
    var nEdges = edges.count()
    var round = 0
    var stable = nEdges == 0L
    while (round < CoreRounds && !stable) {
      val keep = edges.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= CoreK).select(col("a"))
      val next = graft.util.Pin(edges
        .join(keep, Seq("a"), "left_semi")
        .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      val n = next.count()
      // next is eagerly materialized — drop the superseded pin (q270's
      // sf10 lesson: generations of pinned edge tables accumulate)
      graft.util.Pin.release(edges)
      stable = n == nEdges
      edges = next
      nEdges = n
      round += 1
    }
    val deg = edges.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("degree"))
    val tot = deg.agg(count(lit(1)).as("core_nodes"),
        coalesce(sum(col("degree")), lit(0L)).as("sd"))
      .select(col("core_nodes"), expr("sd div 2").as("core_edges"))
    deg.orderBy(col("degree").desc, col("node")).limit(20)
      .crossJoin(broadcast(tot)) // one-row totals frame
      .select(col("node"), col("degree"), col("core_nodes"),
        col("core_edges"))
      .orderBy(col("degree").desc, col("node"))
  }

  /** The same peel unrolled: s0 = symmetric edges, s{i+1} = s{i}
    * restricted to nodes with degree ≥ k in s{i}. */
  private val qKCoreSql: String = {
    // Every round MATERIALIZED: DuckDB inlines plain CTEs, and each
    // round references its predecessor three times — un-materialized,
    // the 20-round unroll re-evaluates the whole chain exponentially.
    val rounds = (0 until CoreRounds).map { i =>
      s"""n${i + 1} AS MATERIALIZED (
         |  SELECT a FROM s$i GROUP BY a HAVING COUNT(*) >= $CoreK),
         |s${i + 1} AS MATERIALIZED (
         |  SELECT s.a, s.b FROM s$i s
         |  JOIN n${i + 1} x ON x.a = s.a
         |  JOIN n${i + 1} y ON y.a = s.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e AS (
       |  SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o
       |  WHERE x.p < y.p GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |s0 AS MATERIALIZED (
       |  SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
       |$rounds,
       |deg AS (
       |  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree
       |  FROM s$CoreRounds GROUP BY 1),
       |tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS core_nodes,
       |    CAST(COALESCE(SUM(degree), 0) // 2 AS BIGINT) AS core_edges
       |  FROM deg)
       |SELECT node, degree, core_nodes, core_edges
       |FROM (SELECT * FROM deg ORDER BY degree DESC, node LIMIT 20), tot
       |ORDER BY degree DESC, node""".stripMargin
  }

  // ------------------------------------------------------------- q244

  /** The phrase vocabulary: adjacent-word phrases searched by q244.
    * Fixed constants (the operator's "query"), chosen from the corpus
    * generator's working vocabulary. */
  private val Phrases = Seq(
    ("order", "fast"), ("stream", "column"), ("window", "join"))

  /** q244: POSITIONAL PHRASE search. The positional posting list
    * (doc, pos, term) is filtered to the phrase vocabulary BEFORE the
    * adjacency self-join — the classic posting-list prune: the join
    * touches only rows whose term appears in some phrase, so candidate
    * volume follows the phrase terms' document frequency, never
    * corpus size. Adjacency is an equi-join on (doc, pos); phrases
    * with zero hits still report a 0/0 row (left join from the
    * 3-row broadcast phrase table). */
  private def qPhraseMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ph = Phrases.toDF("w1", "w2")
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    val t1 = toks.filter(col("term").isin(Phrases.map(_._1): _*))
      .select(col("doc_id"), col("pos"), col("term").as("w1"))
    val t2 = toks.filter(col("term").isin(Phrases.map(_._2): _*))
      .select(col("doc_id"), (col("pos") - 1).as("pos"),
        col("term").as("w2"))
    val hits = t1.join(t2, Seq("doc_id", "pos"))
      .join(broadcast(ph), Seq("w1", "w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
    broadcast(ph).join(hits, Seq("w1", "w2"), "left")
      .select(concat_ws(" ", col("w1"), col("w2")).as("phrase"),
        coalesce(col("n_occ"), lit(0L)).as("n_occ"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy(col("phrase"))
  }

  private val qPhraseMatchSql = {
    val values = Phrases.map { case (a, b) => s"('$a', '$b')" }
      .mkString(", ")
    s"""WITH l AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |p AS (
       |  SELECT doc_id, unnest(range(1, len(t))) AS i, t FROM l),
       |bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM p),
       |ph AS (SELECT * FROM (VALUES $values) v(w1, w2)),
       |m AS (
       |  SELECT ph.w1, ph.w2,
       |    CAST(COUNT(bg.doc_id) AS BIGINT) AS n_occ,
       |    CAST(COUNT(DISTINCT bg.doc_id) AS BIGINT) AS n_docs
       |  FROM ph LEFT JOIN bg ON bg.w1 = ph.w1 AND bg.w2 = ph.w2
       |  GROUP BY 1, 2)
       |SELECT w1 || ' ' || w2 AS phrase, n_occ, n_docs
       |FROM m ORDER BY phrase""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q242_autocomplete" -> QueryDef(qAutocomplete, Some(qAutocompleteSql),
      "prefix autocomplete candidates via the TopKPerGroup operator"),
    "q243_k_core" -> QueryDef(qKCore, Some(qKCoreSql),
      "k-core decomposition by bounded iterative peel, oracle-unrolled"),
    "q244_phrase_match" -> QueryDef(qPhraseMatch, Some(qPhraseMatchSql),
      "positional phrase search over a pruned posting list"))
}
