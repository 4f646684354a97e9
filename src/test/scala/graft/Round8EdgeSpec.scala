package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus properties for the round-8 waves (q231–q238):
  * empty tables and single-row inputs must produce a well-defined
  * (usually empty) result, never a crash — the discipline that caught
  * the q179 zero-denominator and Salting empty-probe traps. */
class Round8EdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dirWith(writes: (String, org.apache.spark.sql.DataFrame)*)
      : String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r8e_").toString
    writes.foreach { case (t, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/$t.parquet") }
    tmp
  }

  private def events(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    rows.map { case (id, u, t, us) => (id, u, t, 1.0, us) }
      .toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
  }

  test("event-wave queries are empty-safe and single-event-safe") {
    val empty = dirWith("events" -> events(Nil))
    val lone = dirWith("events" -> events(Seq((1L, 1L, "v", 0L))))
    for (q <- Seq("q231_markov_transitions", "q233_out_of_order",
        "q236_top_paths", "q238_dwell_time")) {
      val er = Registry.queries(q)(spark, empty).collect()
      assert(er.isEmpty, s"$q on empty events: ${er.toList}")
      val lr = Registry.queries(q)(spark, lone).collect()
      // a lone event emits no transition/path/dwell; the arrival audit
      // reports its (on-time) bucket
      if (q == "q233_out_of_order") assert(lr.length == 1)
      else assert(lr.isEmpty, s"$q on one event: ${lr.toList}")
    }
  }

  test("q234 empty orders and single-week nation are well-defined") {
    import spark.implicits._
    val cust = Seq((1L, 7L)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((7L, "X")).toDF("n_nationkey", "n_name")
    val ordSchema = Seq((1L, 1L, 10.0,
      new java.sql.Timestamp(0L)))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val empty = dirWith("orders" -> ordSchema.limit(0),
      "customer" -> cust, "nation" -> nat)
    assert(Registry.queries("q234_theil_sen")(spark, empty)
      .collect().isEmpty)
    // one week -> zero pairs -> no Theil row survives (median undefined)
    val oneWeek = dirWith("orders" -> ordSchema,
      "customer" -> cust, "nation" -> nat)
    assert(Registry.queries("q234_theil_sen")(spark, oneWeek)
      .collect().isEmpty)
  }

  test("q235/q237 empty and single-line lineitem are well-defined") {
    import spark.implicits._
    def t(day: Int) = new java.sql.Timestamp(86400000L * day)
    val li = Seq((1L, 1L, "F", 5.0, 10.00, t(1), 1L, 1))
      .toDF("l_orderkey", "l_partkey", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_shipdate", "l_orderkey2", "l_linenumber")
      .drop("l_orderkey2")
    val part = Seq((1L, "Brand#1")).toDF("p_partkey", "p_brand")
    val empty = dirWith("lineitem" -> li.limit(0), "part" -> part)
    assert(Registry.queries("q235_assoc_rules")(spark, empty)
      .collect().isEmpty)
    assert(Registry.queries("q237_fifo_cogs")(spark, empty)
      .collect().isEmpty)
    // one receipt, no issues -> no match row (demand side inner)
    val one = dirWith("lineitem" -> li, "part" -> part)
    assert(Registry.queries("q235_assoc_rules")(spark, one)
      .collect().isEmpty) // single 1-brand basket: no pair, no triple
    assert(Registry.queries("q237_fifo_cogs")(spark, one)
      .collect().isEmpty)
  }

  test("q232 empty documents corpus is empty-safe") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val empty = dirWith("documents" -> docs.limit(0))
    assert(Registry.queries("q232_keywords_topk")(spark, empty)
      .collect().isEmpty)
  }
}
