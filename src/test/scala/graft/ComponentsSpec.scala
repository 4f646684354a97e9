package graft

import graft.ops.Components
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (the q52 cluster stage): label propagation must
  * find exact components on known graph shapes, regardless of edge
  * orientation or row order. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a chain is one component labeled by its minimum") {
    // worst-case diameter shape for min propagation
    val chain = (1L until 8L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.keySet == (1L to 8L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("disjoint triangle + pair + reversed chain keep separate labels") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (12L, 10L), // triangle
      (20L, 21L), // pair
      (32L, 31L), (31L, 30L))) // chain given dst<src
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L))
  }

  test("duplicate and self edges do not distort components") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("a 200-node chain (slow-decay frontier) converges exactly under the adaptive jump") {
    // changes decay ~1 node/round on a chain, so the adaptive rule
    // engages pointer jumping from round 1 and the 30-round budget
    // suffices (plain propagation would need ~200 rounds)
    val n = 200L
    val got = cc((0L until (n - 1)).map(i => (i, i + 1)))
    assert(got.size == n)
    assert(got.values.toSet == Set(0L))
  }

  test("a 10k-node path (diameter >> round budget) converges via star contraction") {
    // label propagation alone needs ~10k rounds here; the solver must
    // fall back to large-star/small-star and still return exact labels
    val n = 10000L
    val path = (0L until (n - 1)).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == n)
    assert(got.values.toSet == Set(0L), "one component labeled by its min")
  }

  test("star contraction agrees with label propagation on mixed graphs") {
    import spark.implicits._
    // deterministic pseudo-random graph: a few dense blobs + chains +
    // singleton self-loop, in mixed orientations
    val edges = (
      (0 until 60).map(i => ((i * 37 % 20).toLong, (i * 53 % 20 + 5).toLong)) ++
      (100L until 140L).map(i => (i + 1, i)) ++
      Seq((500L, 500L))
    ).filter { case (a, b) => a != b } :+ ((500L, 500L))
    val df = edges.toDF("src", "dst")
    val viaProp = Components.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val both = df.select(col("src").as("eSrc"), col("dst").as("eDst"))
      .union(df.select(col("dst").as("eSrc"), col("src").as("eDst")))
    val viaStar = Components.starLabels(both)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaProp)
  }

  test("q52 cluster table: every member maps to its cluster minimum and sizes agree") {
    val df = Registry.queries("q52_dedup_clusters")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid,
        s"cluster $cid not labeled by its min member")
      assert(members.forall(_.getLong(2) == members.length),
        s"cluster $cid size column disagrees with member count")
    }
    // clusters partition the member set
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("deterministic split is a pure function of doc_id (stable across runs)") {
    val a = Registry.queries("q54_sample_split")(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    val b = Registry.queries("q54_sample_split")(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    assert(a == b)
    // all three splits materialize and train dominates
    val bySplit = a.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
  }

  test("q57 shard packing: shards are contiguous doc runs that conserve tokens") {
    val rows = Registry.queries("q57_token_packing")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, shards) =>
      val ordered = shards.sortBy(_.getLong(1))
      // shard ids are 0..k-1 with no gaps
      assert(ordered.map(_.getLong(1)).toSeq == (0L until ordered.length).toSeq,
        s"lang $lang shard ids not contiguous")
      // consecutive shards hold non-overlapping increasing doc_id runs
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) < b.getLong(4), // last_doc(i) < first_doc(i+1)
            s"lang $lang shards ${a.getLong(1)},${b.getLong(1)} overlap")
        case _ =>
      }
      // every shard starts below the budget boundary it was assigned to:
      // a doc's START offset decides its shard, so all but the last shard
      // must carry at least one token past the previous boundary
      assert(ordered.forall(_.getLong(3) > 0))
    }
    // token conservation: shard_tokens sums to the corpus token count
    val packed = rows.map(_.getLong(3)).sum
    val total = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(packed == total, s"packed $packed != corpus tokens $total")
  }

  test("q58 rare terms: top-3 per doc ranked by ascending document frequency") {
    val rows = Registry.queries("q58_text_rare_terms")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, terms) =>
      val ordered = terms.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq == (1L to ordered.length).toSeq,
        s"doc $doc ranks not 1..k")
      assert(ordered.length <= 3)
      // rarity order: df non-decreasing down the rank
      assert(ordered.sliding(2).forall {
        case Array(a, b) => a.getLong(3) <= b.getLong(3)
        case _ => true
      }, s"doc $doc df not ascending with rank")
    }
    // df sanity: a term's df equals the number of docs it appears in
    import spark.implicits._
    val docTerms = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy("term").count().as[(String, Long)].collect().toMap
    rows.take(50).foreach { r =>
      assert(docTerms(r.getString(2)) == r.getLong(3),
        s"df mismatch for term ${r.getString(2)}")
    }
  }

  test("PII redaction removes every synthesized email and phone") {
    val df = Registry.queries("q53_text_pii_redact")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 500)
    // each doc got exactly one spliced email and one spliced phone
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(2) >= 1))
  }
}
