package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.HilbertIndex2
import graft.util.Ranks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import Tables.load

/** Forty-third wave (round 10): space-filling-curve layout planning and
  * a frequency-sketch error audit —
  *
  *  - q284: HILBERT vs Z-ORDER LAYOUT AUDIT — the question a table
  *    layout rewrite asks before paying for a 100-TB re-sort: which
  *    clustering key gives tighter per-file bounding boxes in
  *    (l_partkey, l_suppkey) space? The Hilbert key is the native
  *    codegen'd [[graft.functions.HilbertIndex2]] (X7 tier — 16
  *    rotate/reflect bit planes inside whole-stage codegen); the
  *    Morton key is q228's pure div/mod interleave. Both layouts cut
  *    64 EQUAL-ROW-COUNT files along curve order (what a layout
  *    writer does) — NOT top-bit buckets, where both curves induce
  *    the same quadtree cells and the comparison is vacuous by
  *    construction. The sum-of-box-areas column IS the data-skipping
  *    win: smaller boxes ⇒ more files pruned by min/max zone maps on
  *    either predicate column (measured here: Hilbert ≈ 0.54× the
  *    Morton total box area at sf0.01). The DuckDB oracle states the
  *    identical Hilbert arithmetic as 16 unrolled CTE steps (no XOR
  *    dialect: (3·rx)⊕ry is spelled rx=1 ? 3−ry : ry on both
  *    engines).
  *  - q285: COUNT-MIN SKETCH ERROR AUDIT — before shipping a CMS for
  *    100-TB heavy-hitter counting, measure its overestimate on this
  *    corpus: a 4×256 sketch with stated LCG row hashes over the
  *    48-bit md5 key (every constant spelled identically in both
  *    engines), built FROM the exact per-shingle counts (summing
  *    counters from grouped counts is algebraically identical to
  *    streaming increments — CMS counters are linear), probed at the
  *    20 heaviest 3-word shingles; reports exact count, sketch
  *    estimate (min over the 4 rows), and overestimate ppm. Shingles,
  *    not unigrams — the 31-word synthetic vocab is degenerate
  *    (verify-skill note); 3-shingles give 27k+ keys against 1024
  *    counters, so collisions are real and the audit is informative.
  *
  * Scale shapes: q284 is two map-side key computations + two ≤1024-row
  * groupBys + limit(16) tops; q285 is one vocab-bounded exact groupBy,
  * four ≤256-row counter aggregates (broadcast to the 20 probes), no
  * join wider than the vocab table. */
object Wave43 {

  // ------------------------------------------------------------- q284

  private[ops] val NumFiles = 64 // equal-row-count file cuts per scheme

  /** The q228 Morton interleave over the pre-scaled grid coordinates. */
  private def zKey(idiv: String): String =
    "(" + Wave19.zExpr("x", "y", idiv) + ")"

  /** 16 unrolled Hilbert steps as chained CTEs (DuckDB side of
    * [[HilbertIndex2]]): each step consumes bit plane s of the
    * current (x, y), accumulates s²·((3·rx)⊕ry) with the ⊕ spelled
    * arithmetically, and applies the reflect+swap rotation. */
  private[ops] def hilbertSqlChain(firstCte: String): String = {
    val steps = (15 to 0 by -1).zipWithIndex.map { case (bit, idx) =>
      val sv = 1L << bit
      val prev = if (idx == 0) firstCte else s"hst${idx - 1}"
      s"""hst$idx AS (
         |  SELECT l_partkey, l_suppkey,
         |    CASE WHEN (y // $sv) % 2 = 0 THEN
         |      (CASE WHEN (x // $sv) % 2 = 1 THEN 65535 - y ELSE y END)
         |    ELSE x END AS x,
         |    CASE WHEN (y // $sv) % 2 = 0 THEN
         |      (CASE WHEN (x // $sv) % 2 = 1 THEN 65535 - x ELSE x END)
         |    ELSE y END AS y,
         |    d + $sv * $sv * (CASE WHEN (x // $sv) % 2 = 1
         |      THEN 3 - (y // $sv) % 2 ELSE (y // $sv) % 2 END) AS d
         |  FROM $prev)"""
        .stripMargin
    }
    steps.mkString(",\n")
  }

  /** (l_partkey, l_suppkey) scaled onto the full 2^16 grid (monotone,
    * exact integer arithmetic) — raw keys occupy a corner of the grid
    * otherwise and every row lands in file 0, making layouts vacuous.
    * Shared with q287's range-scan demo. */
  private[ops] def scaledBase(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val maxes = raw.agg(max(col("l_partkey")).as("pk_mx"),
      max(col("l_suppkey")).as("sk_mx"))
    // pinned: q284 ranks this frame twice (once per scheme) and q287
    // once more — one scan instead of re-reading the parquet per rank
    graft.util.Pin(raw.crossJoin(broadcast(maxes)) // one-row scalar
      .withColumn("x", expr("l_partkey * 65536 div (pk_mx + 1)"))
      .withColumn("y", expr("l_suppkey * 65536 div (sk_mx + 1)")))
  }

  /** Assign each row of [[scaledBase]] to one of [[NumFiles]]
    * equal-row-count files along `key` order (ties beyond
    * (key, pk, sk) are interchangeable — equal tuples contribute
    * identical values to whichever file they land in). */
  private[ops] def rankedFiles(base: DataFrame, key: Column): DataFrame = {
    val nTot = base.agg(count(lit(1)).as("n_total"))
    Ranks.globalRank(base.withColumn("hk", key),
        "rnk", col("hk"), col("l_partkey"), col("l_suppkey"))
      .crossJoin(broadcast(nTot)) // one-row count scalar
      .withColumn("file", expr(s"(rnk - 1) * $NumFiles div n_total"))
  }

  /** The Hilbert key over the scaled grid (shared with q287). */
  private[ops] def hilbertKey: Column =
    HilbertIndex2(expr("CAST(x AS BIGINT)"), expr("CAST(y AS BIGINT)"))

  private def qHilbertAudit(s: SparkSession, dir: String): DataFrame = {
    val base = scaledBase(s, dir)
    // equal-row-count cuts (what a layout writer does: sort by the
    // curve key, cut into 64 files) — NOT top-bit buckets: at
    // power-of-two bucket boundaries Hilbert and Morton induce the
    // SAME quadtree cells (just renumbered) and the audit is vacuous;
    // the curves differ exactly when a file straddles a quadrant
    // boundary, where Morton's diagonal jump inflates the bounding box
    def audit(scheme: String, key: Column): DataFrame = {
      val files = rankedFiles(base, key)
        .groupBy(col("file"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("pk_min"),
          max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"),
          max(col("l_suppkey")).as("sk_max"))
        .withColumn("pk_extent", col("pk_max") - col("pk_min") + 1)
        .withColumn("sk_extent", col("sk_max") - col("sk_min") + 1)
        .withColumn("area", col("pk_extent") * col("sk_extent"))
      val summary = files.agg(
        sum(col("area").cast(DecimalType(38, 0)))
          .cast(LongType).as("total_area"),
        max(col("n_rows")).as("max_file_rows"))
      files.crossJoin(broadcast(summary)) // one-row scheme totals
        .select(lit(scheme).as("scheme"), col("file"), col("n_rows"),
          col("pk_extent"), col("sk_extent"), col("area"),
          col("total_area"), col("max_file_rows"))
    }
    val hil = audit("hilbert", hilbertKey)
    val zor = audit("zorder", expr(zKey("div")))
    hil.unionByName(zor).orderBy(col("scheme"), col("file"))
  }

  private val qHilbertAuditSql = {
    def filed(keySel: String, src: String) =
      s"""  SELECT file, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
         |    MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
         |  FROM (
         |    SELECT l_partkey, l_suppkey,
         |      ((row_number() OVER (ORDER BY $keySel, l_partkey,
         |        l_suppkey)) - 1) * $NumFiles // n.n_total AS file
         |    FROM $src, n)
         |  GROUP BY 1""".stripMargin
    def report(bcte: String, scheme: String) =
      s"""  SELECT '$scheme' AS scheme, CAST(file AS BIGINT) AS file,
         |    n_rows,
         |    pk_max - pk_min + 1 AS pk_extent,
         |    sk_max - sk_min + 1 AS sk_extent,
         |    (pk_max - pk_min + 1) * (sk_max - sk_min + 1) AS area,
         |    t.total_area, t.max_file_rows
         |  FROM $bcte,
         |    (SELECT CAST(SUM((pk_max - pk_min + 1) *
         |         (sk_max - sk_min + 1)) AS BIGINT) AS total_area,
         |       MAX(n_rows) AS max_file_rows FROM $bcte) t"""
        .stripMargin
    s"""WITH mx AS (
       |  SELECT MAX(l_partkey) AS pk_mx, MAX(l_suppkey) AS sk_mx
       |  FROM lineitem),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lineitem),
       |sc AS MATERIALIZED (
       |  SELECT l_partkey, l_suppkey,
       |    l_partkey * 65536 // (pk_mx + 1) AS x,
       |    l_suppkey * 65536 // (sk_mx + 1) AS y
       |  FROM lineitem, mx),
       |h0 AS (
       |  SELECT l_partkey, l_suppkey, x, y, CAST(0 AS BIGINT) AS d
       |  FROM sc),
       |${hilbertSqlChain("h0")},
       |hb AS MATERIALIZED (
       |${filed("d", "hst15")}),
       |zb AS MATERIALIZED (
       |${filed(zKey("//"), "sc")})
       |SELECT * FROM (
       |${report("hb", "hilbert")}
       |UNION ALL
       |${report("zb", "zorder")})
       |ORDER BY scheme, file""".stripMargin
  }

  // ------------------------------------------------------------- q285

  // private[ops]: Wave44's streaming twin (q286) reads these — the two
  // gates MUST hash into the same sketch, so there is one authority
  private[ops] val CmsW = 256
  private[ops] val CmsA = Seq(31L, 131L, 313L, 1009L)
  private[ops] val CmsB = Seq(7L, 911L, 4507L, 8191L)
  private[ops] val CmsP = 2147483647L // 2^31 - 1
  private val TopProbes = 20

  private def qCmsAudit(s: SparkSession, dir: String): DataFrame = {
    val sh = load(s, dir, "documents")
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 3), i -> " +
          "concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("sh"))
    // exact per-shingle counts: the vocab-bounded table BOTH the
    // sketch build and the audit probe derive from (CMS counters are
    // linear, so summing grouped counts == streaming increments)
    val exact = graft.util.Pin(sh.groupBy(col("sh"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("kh", expr(
        "CAST(conv(substring(md5(sh), 1, 12), 16, 10) AS BIGINT)")))
    val counters = CmsA.indices.map { i =>
      exact
        .withColumn("b", expr(
          s"((${CmsA(i)} * kh + ${CmsB(i)}) % $CmsP) % $CmsW"))
        .groupBy(col("b")).agg(sum(col("cnt")).as(s"row$i"))
        .select(col("b").as(s"b$i"), col(s"row$i"))
    }
    val probes = exact
      .orderBy(col("cnt").desc, col("sh").asc).limit(TopProbes)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("cnt").desc, col("sh").asc))
        .cast(LongType))
    val joined = CmsA.indices.foldLeft(probes) { (acc, i) =>
      acc.withColumn(s"b$i", expr(
          s"((${CmsA(i)} * kh + ${CmsB(i)}) % $CmsP) % $CmsW"))
        .join(broadcast(counters(i)), Seq(s"b$i")) // <=256-row counter table
    }
    joined
      .withColumn("cms_estimate",
        least(col("row0"), col("row1"), col("row2"), col("row3")))
      .select(col("rk"), col("sh"), col("cnt").as("exact_cnt"),
        col("cms_estimate"),
        expr("(cms_estimate - cnt) * 1000000 div cnt").as("over_ppm"))
      .orderBy(col("rk"))
  }

  private val qCmsAuditSql = {
    val counterCtes = CmsA.indices.map { i =>
      s"""c$i AS (
         |  SELECT ((${CmsA(i)} * kh + ${CmsB(i)}) % $CmsP) % $CmsW AS b,
         |    CAST(SUM(cnt) AS BIGINT) AS row$i
         |  FROM exact GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val probeJoins = CmsA.indices.map { i =>
      s"JOIN c$i ON c$i.b = ((${CmsA(i)} * p.kh + ${CmsB(i)}) " +
        s"% $CmsP) % $CmsW"
    }.mkString("\n  ")
    s"""WITH w AS (
       |  SELECT string_split(text, ' ') AS ws FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT unnest(list_transform(range(1, len(ws) - 1),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
       |  FROM w),
       |exact AS MATERIALIZED (
       |  SELECT sh, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    CAST(('0x' || substring(md5(sh), 1, 12)) AS BIGINT) AS kh
       |  FROM sh GROUP BY 1),
       |$counterCtes,
       |p AS (
       |  SELECT sh, cnt, kh,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, sh) AS BIGINT)
       |      AS rk
       |  FROM (SELECT * FROM exact ORDER BY cnt DESC, sh
       |        LIMIT $TopProbes))
       |SELECT rk, p.sh, cnt AS exact_cnt,
       |  LEAST(row0, row1, row2, row3) AS cms_estimate,
       |  CAST((LEAST(row0, row1, row2, row3) - cnt) * 1000000 // cnt
       |    AS BIGINT) AS over_ppm
       |FROM p
       |  $probeJoins
       |ORDER BY rk""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q284_hilbert_audit" -> QueryDef(qHilbertAudit,
      Some(qHilbertAuditSql),
      "Hilbert vs Z-order layout audit: native codegen'd " +
        "graft_hilbert2 key vs the Morton interleave, 64 " +
        "equal-row-count file cuts per scheme, per-file bounding " +
        "boxes + sum-of-box-areas (the min/max data-skipping win)"),
    "q285_cms_audit" -> QueryDef(qCmsAudit, Some(qCmsAuditSql),
      "Count-Min sketch error audit: 4x256 sketch with stated LCG " +
        "row hashes over 48-bit md5 keys, built from exact shingle " +
        "counts (linear counters), probed at the 20 heaviest " +
        "shingles; overestimate ppm per probe"))
}
