package graft.ops

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.load

/** Fortieth wave (round 10): pixel-space image dedup plus three
  * storage-layout planning audits —
  *
  *  - q273: IMAGE NEAR-DUP JOIN VIA dHASH — pixel-space perceptual
  *    dedup, the production complement to embedding SemDeDup (q89):
  *    each image is REALLY encoded (PNG) and REALLY decoded
  *    (`javax.imageio`), a 9×8 nearest-neighbor grid is probed in ONE
  *    codec pass, and the 64-bit difference hash (bit = right pixel >
  *    left pixel) ships as FOUR 16-bit band integers — bit tricks stay
  *    inside 32-bit words (the q169 rule), and the bands double as the
  *    LSH keys: candidates are pairs sharing at least one EXACT band
  *    (equi-join on (band, value), never all-pairs), verified by
  *    total Hamming distance ≤ 6 via `bit_count(xor)`. The synthetic
  *    corpus pairs docs (2m, 2m+1) over a shared base image with a
  *    bottom-half-only perturbation, so true pairs keep their top two
  *    bands intact — banding recall is 1.0 BY CONSTRUCTION, and the
  *    oracle replays the whole pipeline closed form from the
  *    generative pixel formula (the q225/q253 device: the real codec
  *    path must reproduce the formula bit-exactly).
  *  - q274: POSTING-LIST DELTA + VARINT LAYOUT AUDIT — the classic IR
  *    compression decision: per term, doc-id posting lists are
  *    gap-encoded (lag over the sorted list) and each gap priced at
  *    its LEB128 varint width (a CASE ladder — integer-exact in both
  *    engines); the report compares raw fixed-8-byte postings to
  *    delta+varint bytes per term. Window is partitioned by term.
  *  - q275: DICTIONARY-ENCODING PLANNER — per column: raw bytes
  *    (Σ octet_length) vs dictionary bytes (distinct values' bytes +
  *    n·⌈log₂ ndv⌉ bits of indices, the bit width computed EXACTLY as
  *    the binary-string length of ndv−1), and the resulting
  *    recommendation — the encoding decision a 100-TB columnar writer
  *    makes per column chunk.
  *  - q276: BLOOM SIZING AUDIT, plan vs measured — for three
  *    (bits/key, k) plans the filter is emulated RELATIONALLY on both
  *    engines (positions = (h1 + i·h2) mod m from two md5-prefix
  *    hashes — double hashing, Kirsch–Mitzenmacher), membership = all
  *    k probe positions present in the member-set bit table, and the
  *    MEASURED false-positive rate on a disjoint probe keyspace is
  *    reported per plan. Planning-time audit on a sample by design:
  *    the bit table is rows here, bits in production (q59/q88 carry
  *    the native codegen filter).
  *
  * Scale shapes: q273's join is band-bucketed (collision volume
  * ~n²/2¹⁶ per band, never n²) and decode is one pass per image;
  * q274/q275 are one melt/explode + bounded-group aggregates; q276's
  * position tables are n·k rows, equi-joined. */
object Wave40 {

  // ------------------------------------------------------------- q273

  private val HammingMax = 8

  /** Docs (2m, 2m+1) share base m: identical top half, bottom-half
    * perturbation on the odd twin (keeps bands 0-1 equal, so banding
    * recall on twins is 1.0 by construction). */
  private def qImageDhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = load(s, dir, "documents").select(col("doc_id"))
      .as[Long]
      .map { id =>
        val base = id / 2
        val w = (base % 41 + 12).toInt
        val h = (base % 23 + 9).toInt
        def gray(x: Int, y: Int): Int = {
          val p = if (id % 2 == 1 && y * 2 >= h && (x + y) % 11 == 0) 96
            else 0
          ((base * 7 + x.toLong * 31 + y.toLong * 17 + p) % 256).toInt
        }
        // REAL codec round-trip: encode the formula, decode the blob,
        // hash the DECODED pixels (one decode pass, 72 grid probes)
        val png = Multimodal.encodePng(w, h, gray)
        val grid = for (gy <- 0 until 8; gx <- 0 until 9)
          yield (gx * w / 9, gy * h / 8)
        val probed = Multimodal.decodeProbe(png, (_, _) => grid).get._3
        def p(gx: Int, gy: Int): Int = probed(gy * 9 + gx)
        val bands = (0 until 4).map { band =>
          var v = 0
          for (ry <- 0 until 2; gx <- 0 until 8) {
            val gy = band * 2 + ry
            if (p(gx + 1, gy) > p(gx, gy)) v |= 1 << (ry * 8 + gx)
          }
          v
        }
        (id, bands(0), bands(1), bands(2), bands(3))
      }
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    val hp = graft.util.Pin(hashes)
    // LSH banding: candidates share at least one exact 16-bit band
    val bandRows = hp.select(col("doc_id"), posexplode(array(
      col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("doc_id", "band", "v")
    val cands = bandRows.as("x").join(bandRows.as("y"),
        col("x.band") === col("y.band") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val ha = hp.select(col("doc_id").as("a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val hb = hp.select(col("doc_id").as("b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val verified = cands.join(ha, "a").join(hb, "b")
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("long"))
      .filter(col("hamming") <= HammingMax)
    val tot = verified.agg(
      coalesce(count(lit(1)), lit(0L)).as("n_pairs"),
      coalesce(sum(when(col("b") - col("a") === 1 &&
        (col("a") % 2) === 0, 1L).otherwise(0L)), lit(0L))
        .as("n_twin_pairs"))
    verified.orderBy(col("hamming"), col("a"), col("b")).limit(50)
      .crossJoin(broadcast(tot)) // one-row totals frame
      .select(col("a"), col("b"), col("hamming"), col("n_pairs"),
        col("n_twin_pairs"))
      .orderBy(col("hamming"), col("a"), col("b"))
  }

  private val qImageDhashDedupSql =
    s"""WITH d AS (SELECT doc_id AS id, doc_id // 2 AS base,
       |    (doc_id // 2) % 41 + 12 AS w, (doc_id // 2) % 23 + 9 AS h
       |  FROM documents),
       |-- 9x8 grid pixels, closed form (the real decode must match)
       |g AS (
       |  SELECT id, gx, gy,
       |    (base * 7 + (gx * w // 9) * 31 + (gy * h // 8) * 17 +
       |     CASE WHEN id % 2 = 1 AND (gy * h // 8) * 2 >= h
       |       AND ((gx * w // 9) + (gy * h // 8)) % 11 = 0
       |       THEN 96 ELSE 0 END) % 256 AS p
       |  FROM d, range(0, 9) t1(gx), range(0, 8) t2(gy)),
       |bits AS (
       |  SELECT l.id, l.gy // 2 AS band,
       |    ((l.gy % 2) * 8 + l.gx) AS pos,
       |    CASE WHEN r.p > l.p THEN 1 ELSE 0 END AS bit
       |  FROM g l JOIN g r ON r.id = l.id AND r.gy = l.gy
       |    AND r.gx = l.gx + 1
       |  WHERE l.gx < 8),
       |bands AS (
       |  SELECT id, band,
       |    CAST(SUM(bit * (1 << pos)) AS INT) AS v
       |  FROM bits GROUP BY 1, 2),
       |cands AS (
       |  SELECT DISTINCT x.id AS a, y.id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.v = y.v AND x.id < y.id),
       |hx AS (SELECT id, band, v FROM bands),
       |ham AS (
       |  SELECT c.a, c.b,
       |    CAST(SUM(bit_count(CAST(xor(CAST(xa.v AS BIGINT),
       |      CAST(xb.v AS BIGINT)) AS BIGINT))) AS BIGINT) AS hamming
       |  FROM cands c
       |  JOIN hx xa ON xa.id = c.a
       |  JOIN hx xb ON xb.id = c.b AND xb.band = xa.band
       |  GROUP BY 1, 2),
       |v AS (SELECT * FROM ham WHERE hamming <= $HammingMax),
       |tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |    CAST(COALESCE(SUM(CASE WHEN b - a = 1 AND a % 2 = 0
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_twin_pairs
       |  FROM v)
       |SELECT a, b, hamming, n_pairs, n_twin_pairs
       |FROM (SELECT * FROM v ORDER BY hamming, a, b LIMIT 50), tot
       |ORDER BY hamming, a, b""".stripMargin

  // ------------------------------------------------------------- q274

  private def qPostingsVarint(s: SparkSession, dir: String): DataFrame = {
    val toks = load(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    val gaps = toks
      .withColumn("prev", lag(col("doc_id"), 1).over(w))
      // first posting stores the doc id itself; followers store the gap
      .withColumn("gap", when(col("prev").isNull, col("doc_id"))
        .otherwise(col("doc_id") - col("prev")))
      .withColumn("vbytes", expr(
        """CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
          |WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
          |ELSE 5 END""".stripMargin).cast("long"))
    gaps.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("vbytes")).as("delta_bytes"),
        max(col("gap")).as("max_gap"))
      .select(col("term"), col("df"),
        (col("df") * 8).as("raw_bytes"), col("delta_bytes"),
        col("max_gap"),
        expr("delta_bytes * 1000000 div (df * 8)").as("size_ppm"))
      .orderBy(col("term"))
  }

  private val qPostingsVarintSql =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |t2 AS (SELECT * FROM toks WHERE len(term) > 0),
      |gaps AS (
      |  SELECT term,
      |    COALESCE(doc_id - lag(doc_id) OVER
      |      (PARTITION BY term ORDER BY doc_id), doc_id) AS gap
      |  FROM t2),
      |vb AS (
      |  SELECT term, gap,
      |    CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
      |      WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
      |      ELSE 5 END AS vbytes
      |  FROM gaps)
      |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
      |  CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
      |  CAST(SUM(vbytes) AS BIGINT) AS delta_bytes,
      |  CAST(MAX(gap) AS BIGINT) AS max_gap,
      |  CAST(SUM(vbytes) * 1000000 // (COUNT(*) * 8) AS BIGINT)
      |    AS size_ppm
      |FROM vb GROUP BY term ORDER BY term""".stripMargin

  // ------------------------------------------------------------- q275

  private def qDictPlanner(s: SparkSession, dir: String): DataFrame = {
    // two low-ndv enum columns (dict wins), one mid-ndv key, one
    // unique key (dict loses) — keys string-cast so byte accounting
    // is engine-identical
    val MeltExpr =
      """stack(4,
        |  'o_orderpriority', o_orderpriority,
        |  'o_orderstatus',   o_orderstatus,
        |  'o_custkey_s',     CAST(o_custkey AS STRING),
        |  'o_orderkey_s',    CAST(o_orderkey AS STRING)
        |) AS (col_name, v)""".stripMargin
    load(s, dir, "orders").selectExpr(MeltExpr)
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("v")).as("ndv"),
        sum(octet_length(col("v")).cast("long")).as("raw_bytes"))
      .join(
        load(s, dir, "orders").selectExpr(MeltExpr)
          .select(col("col_name"), col("v")).distinct()
          .groupBy(col("col_name"))
          .agg(sum(octet_length(col("v")).cast("long"))
            .as("dict_value_bytes")),
        Seq("col_name"))
      .withColumn("idx_bits",
        when(col("ndv") <= 1, 0L)
          .otherwise(length(bin(col("ndv") - 1)).cast("long")))
      .withColumn("dict_bytes",
        col("dict_value_bytes") +
          expr("(n_rows * idx_bits + 7) div 8"))
      .select(col("col_name"), col("n_rows"), col("ndv"),
        col("raw_bytes"), col("dict_value_bytes"), col("idx_bits"),
        col("dict_bytes"),
        (col("dict_bytes") < col("raw_bytes")).as("dict_wins"),
        expr("dict_bytes * 1000000 div raw_bytes").as("size_ppm"))
      .orderBy(col("col_name"))
  }

  private val qDictPlannerSql =
    """WITH melt AS (
      |  SELECT 'o_orderpriority' AS col_name, o_orderpriority AS v
      |    FROM orders
      |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
      |  UNION ALL SELECT 'o_custkey_s', CAST(o_custkey AS VARCHAR)
      |    FROM orders
      |  UNION ALL SELECT 'o_orderkey_s', CAST(o_orderkey AS VARCHAR)
      |    FROM orders),
      |base AS (
      |  SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
      |    CAST(SUM(strlen(v)) AS BIGINT) AS raw_bytes
      |  FROM melt GROUP BY 1),
      |dv AS (
      |  SELECT col_name,
      |    CAST(SUM(strlen(v)) AS BIGINT) AS dict_value_bytes
      |  FROM (SELECT DISTINCT col_name, v FROM melt) GROUP BY 1),
      |j AS (
      |  SELECT b.*, dv.dict_value_bytes,
      |    CAST(CASE WHEN b.ndv <= 1 THEN 0
      |      ELSE len(format('{:b}', b.ndv - 1)) END AS BIGINT)
      |      AS idx_bits
      |  FROM base b JOIN dv ON dv.col_name = b.col_name)
      |SELECT col_name, n_rows, ndv, raw_bytes, dict_value_bytes,
      |  idx_bits,
      |  CAST(dict_value_bytes + (n_rows * idx_bits + 7) // 8 AS BIGINT)
      |    AS dict_bytes,
      |  (dict_value_bytes + (n_rows * idx_bits + 7) // 8) < raw_bytes
      |    AS dict_wins,
      |  CAST((dict_value_bytes + (n_rows * idx_bits + 7) // 8)
      |    * 1000000 // raw_bytes AS BIGINT) AS size_ppm
      |FROM j ORDER BY col_name""".stripMargin

  // ------------------------------------------------------------- q276

  /** The three candidate plans: (bits per key, number of hashes). */
  private val BloomPlans = Seq((8L, 6), (12L, 8), (16L, 11))

  private def qBloomAudit(s: SparkSession, dir: String): DataFrame = {
    // members: part keys; probes: a disjoint key namespace
    val members = graft.util.Pin(load(s, dir, "lineitem")
      .select(concat(lit("k"), col("l_partkey")).as("key")).distinct())
    val probes = graft.util.Pin(load(s, dir, "orders")
      .select(concat(lit("p"), col("o_orderkey")).as("key")).distinct())
    val nMembers = members.count() // plan-time scalar (bounded)
    import s.implicits._
    val plans = BloomPlans.toDF("bits_per_key", "k")
      .withColumn("m", col("bits_per_key") * nMembers)
    def h(tag: String) = expr(
      s"CAST(conv(substring(md5(concat('$tag', key)), 1, 12), 16, 10) " +
        "AS BIGINT)")
    def positions(keys: DataFrame): DataFrame = keys
      .withColumn("h1", h("h1|")).withColumn("h2", h("h2|"))
      .crossJoin(broadcast(plans)) // 3-row plan table
      .select(col("key"), col("bits_per_key"), col("k"), col("m"),
        explode(expr("transform(sequence(0, k - 1), " +
          "i -> pmod(h1 + i * h2, m))")).as("pos"))
    val bits = positions(members)
      .select(col("bits_per_key"), col("pos")).distinct()
    val probePos = positions(probes)
    val fp = probePos.join(bits, Seq("bits_per_key", "pos"), "left_semi")
      .groupBy(col("bits_per_key"), col("k"), col("key"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === col("k")) // all k positions set
      .groupBy(col("bits_per_key"), col("k"))
      .agg(count(lit(1)).as("n_fp"))
    val nProbes = probes.count()
    plans.join(fp, Seq("bits_per_key", "k"), "left")
      .select(col("bits_per_key"), col("k").cast("long").as("k"), col("m"),
        lit(nMembers).as("n_members"), lit(nProbes).as("n_probes"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        expr(s"coalesce(n_fp, 0) * 1000000 div $nProbes").as("fp_ppm"))
      .orderBy(col("bits_per_key"))
  }

  private val qBloomAuditSql = {
    val plans = BloomPlans.map { case (b, k) => s"($b, $k)" }
      .mkString(", ")
    s"""WITH members AS (
       |  SELECT DISTINCT 'k' || l_partkey AS key FROM lineitem),
       |probes AS (SELECT DISTINCT 'p' || o_orderkey AS key FROM orders),
       |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM members),
       |np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probes),
       |plans AS (
       |  SELECT bits_per_key, k, bits_per_key * (SELECT n FROM nm) AS m
       |  FROM (VALUES $plans) t(bits_per_key, k)),
       |mh AS (
       |  SELECT key,
       |    CAST(('0x' || substring(md5('h1|' || key), 1, 12)) AS BIGINT)
       |      AS h1,
       |    CAST(('0x' || substring(md5('h2|' || key), 1, 12)) AS BIGINT)
       |      AS h2
       |  FROM members),
       |bits AS (
       |  SELECT DISTINCT p.bits_per_key, (mh.h1 + i.i * mh.h2) % p.m
       |    AS pos
       |  FROM mh, plans p, range(0, 16) i(i)
       |  WHERE i.i < p.k),
       |ph AS (
       |  SELECT key,
       |    CAST(('0x' || substring(md5('h1|' || key), 1, 12)) AS BIGINT)
       |      AS h1,
       |    CAST(('0x' || substring(md5('h2|' || key), 1, 12)) AS BIGINT)
       |      AS h2
       |  FROM probes),
       |pp AS (
       |  SELECT p.bits_per_key, p.k, ph.key,
       |    (ph.h1 + i.i * ph.h2) % p.m AS pos
       |  FROM ph, plans p, range(0, 16) i(i)
       |  WHERE i.i < p.k),
       |fp AS (
       |  SELECT pp.bits_per_key, pp.k, pp.key
       |  FROM pp JOIN bits b
       |    ON b.bits_per_key = pp.bits_per_key AND b.pos = pp.pos
       |  GROUP BY 1, 2, 3 HAVING COUNT(*) = MAX(pp.k)),
       |fpc AS (
       |  SELECT bits_per_key, k, CAST(COUNT(*) AS BIGINT) AS n_fp
       |  FROM fp GROUP BY 1, 2)
       |SELECT CAST(p.bits_per_key AS BIGINT) AS bits_per_key,
       |  CAST(p.k AS BIGINT) AS k, CAST(p.m AS BIGINT) AS m,
       |  (SELECT n FROM nm) AS n_members,
       |  (SELECT n FROM np) AS n_probes,
       |  COALESCE(f.n_fp, 0) AS n_fp,
       |  CAST(COALESCE(f.n_fp, 0) * 1000000 // (SELECT n FROM np)
       |    AS BIGINT) AS fp_ppm
       |FROM plans p LEFT JOIN fpc f
       |  ON f.bits_per_key = p.bits_per_key AND f.k = p.k
       |ORDER BY p.bits_per_key""".stripMargin
  }

  val defs: Seq[(String, QueryDef)] = Seq(
    "q273_image_dhash_dedup" -> QueryDef(qImageDhashDedup,
      Some(qImageDhashDedupSql),
      "pixel-space image near-dup join: real PNG encode/decode, 64-bit " +
        "dHash as 4x16-bit bands, band-bucketed LSH candidates, " +
        "bit_count Hamming verify <= 6; oracle replays the generative " +
        "pixel formula closed form"),
    "q274_postings_varint" -> QueryDef(qPostingsVarint,
      Some(qPostingsVarintSql),
      "posting-list delta + LEB128 varint layout audit per term: " +
        "gap-encode doc ids, price each gap at exact varint width, " +
        "compare to fixed-8-byte postings"),
    "q275_dict_planner" -> QueryDef(qDictPlanner, Some(qDictPlannerSql),
      "dictionary-encoding planner per column: raw bytes vs dict " +
        "values + ceil(log2 ndv)-bit indices (exact integer bit " +
        "width), emit the encoding recommendation"),
    "q276_bloom_audit" -> QueryDef(qBloomAudit, Some(qBloomAuditSql),
      "Bloom sizing audit, plan vs measured: double-hashing positions " +
        "emulated relationally on both engines, measured FP rate on a " +
        "disjoint probe keyspace per (bits/key, k) plan"))
}
