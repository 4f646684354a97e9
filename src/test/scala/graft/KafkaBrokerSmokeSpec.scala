package graft

import graft.model.{ChangeEvent, Mode, Op}
import graft.streaming.ChangeStreamPipeline
import org.scalatest.Tag
import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Tag for specs that need live infrastructure (a Docker daemon).
  * Run them alone with `sbt "testOnly -- -n graft.Integration"`. */
object IntegrationTag extends Tag("graft.Integration")

/** LIVE-BROKER smoke for the Kafka record contract (SURVEY §2.2 K1/K2,
  * §2.10 T3): spins up a single-node KRaft broker in Docker, produces
  * the exact `toKafkaRecords` projection through the console producer,
  * reads it back, and asserts the two properties the reference's
  * consumer relies on (`core/messaging/HCDCKafkaReceiver.java:149-173`):
  *
  *  1. HEADERS survive the broker round-trip (message id + mode ride
  *     headers, like the reference's HEADER_MESSAGE_ID/MODE);
  *  2. per-ENTITY total order: all records of one entity key land in
  *     one partition, in produced order — the key-hash partitioning
  *     that replaces `ChangeDeltaKafkaPartitioner.java:37-48`.
  *
  * SKIPPED (assume) when no Docker daemon is reachable — the CI
  * sandbox has none; any docker-enabled host runs it with the stock
  * `apache/kafka` image (override via GRAFT_KAFKA_IMAGE). The Spark
  * CONNECTOR path (`startKafkaSource`/`startKafkaSink`) additionally
  * needs spark-sql-kafka on the classpath, which this repo deliberately
  * does not bundle — KafkaAndMetricsSpec pins that boundary; this spec
  * proves the wire contract those methods ship over a real broker.
  *
  * IN-SANDBOX INFEASIBILITY (verified round 7): every path to a live
  * broker inside this sandbox is closed — (1) the Docker CLI exists
  * but no daemon is reachable (`docker info` → "Cannot connect to the
  * Docker daemon"); (2) an EMBEDDED KRaft broker needs the
  * `kafka_2.13` server jars, and a full-filesystem search finds zero
  * kafka jars (`find / -name "*kafka*.jar"` → nothing — Spark's jar
  * dir ships no connector or client either); (3) resolution is closed
  * too: COURSIER_MODE=offline against a cache that holds only
  * sbt/scalatest/scalacheck artifacts, with zero network egress. So
  * the one cancelable test stays Docker-gated by design — not a code
  * gap; the decode→FSM→encode contract it would exercise end-to-end
  * is already pinned hermetically by KafkaAndMetricsSpec (projection +
  * partitioner), ChangeDeltaCodecSpec (byte-level wire), and the
  * q26==q27 streaming==batch oracle. */
class KafkaBrokerSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dockerUp: Boolean =
    try Process(Seq("docker", "info")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Exception => false }

  private val image = sys.env.getOrElse("GRAFT_KAFKA_IMAGE", "apache/kafka:3.8.0")
  private val kbin = "/opt/kafka/bin"

  /** Retry a broker command until it succeeds (startup race). */
  private def await(name: String, cmd: Seq[String], tries: Int = 30): Unit = {
    var left = tries
    while (left > 0 &&
        Process(Seq("docker", "exec", name) ++ cmd).!(ProcessLogger(_ => ())) != 0) {
      Thread.sleep(2000); left -= 1
    }
    require(left > 0, s"broker in $name did not come up")
  }

  test("kafka round-trip preserves headers and per-entity order",
      IntegrationTag) {
    assume(dockerUp, "no Docker daemon — live-broker smoke skipped")
    import spark.implicits._
    val name = s"graft-kafka-${java.util.UUID.randomUUID().toString.take(8)}"
    val topic = "graft-smoke"
    assert(Process(Seq("docker", "run", "-d", "--rm", "--name", name, image)).! == 0,
      s"could not start $image")
    try {
      await(name, Seq(s"$kbin/kafka-topics.sh",
        "--bootstrap-server", "localhost:9092", "--list"))
      assert(Process(Seq("docker", "exec", name, s"$kbin/kafka-topics.sh",
        "--bootstrap-server", "localhost:9092", "--create", "--topic", topic,
        "--partitions", "3", "--replication-factor", "1")).! == 0)

      // 10 tx per entity, interleaved across entities on purpose: the
      // broker must still deliver each entity's events in tx order
      val events = (1 to 10).flatMap(tx => ('a' to 'd').map(e =>
        ChangeEvent(tx.toLong, Op.AppendFile, s"/data/$e", Mode.New,
          sizeCents = 0L, ts = tx.toLong)))
      val routed = events.toDF() // the F10 enrichment shape: domain::entity key
        .withColumn("domain", org.apache.spark.sql.functions.lit("dfs"))
        .withColumn("entity", org.apache.spark.sql.functions.col("path"))
      val records = ChangeStreamPipeline
        .toKafkaRecords(routed, "ns")
        .selectExpr("key", "value",
          "array_join(transform(headers, h -> concat(h.key, ':', cast(h.value as string))), ',') as hdr")
        .as[(String, String, String)].collect()

      // console producer line format: headers TAB key TAB value
      val payload = records
        .map { case (k, v, h) => s"$h\t$k\t$v" }.mkString("", "\n", "\n")
      val produce = Process(Seq("docker", "exec", "-i", name,
        s"$kbin/kafka-console-producer.sh",
        "--bootstrap-server", "localhost:9092", "--topic", topic,
        "--property", "parse.key=true",
        "--property", "parse.headers=true",
        "--property", "key.separator=\t",
        "--property", "headers.delimiter=\t",
        "--property", "headers.separator=,",
        "--property", "headers.key.separator=:"))
      assert((produce #< new java.io.ByteArrayInputStream(
        payload.getBytes("UTF-8"))).! == 0, "console producer failed")

      val out = Process(Seq("docker", "exec", name,
        s"$kbin/kafka-console-consumer.sh",
        "--bootstrap-server", "localhost:9092", "--topic", topic,
        "--from-beginning", "--max-messages", records.length.toString,
        "--timeout-ms", "60000",
        "--property", "print.partition=true",
        "--property", "print.headers=true",
        "--property", "print.key=true")).!!
      // line shape: Partition:N<TAB>h1:v1,h2:v2<TAB>key<TAB>value
      val rows = out.linesIterator.filter(_.contains("Partition:")).map { l =>
        val parts = l.split('\t')
        (parts(0).stripPrefix("Partition:").toInt, parts(1), parts(2), parts(3))
      }.toSeq
      assert(rows.length == records.length, s"lost records: ${rows.length}")

      // 1. headers survive: every record still carries id + mode
      assert(rows.forall(r => r._2.contains("graft_message_id:ns:New:")
        && r._2.contains("graft_mode:New")), "headers dropped by round-trip")

      // 2. per-entity total order: one partition per key, tx order kept
      rows.groupBy(_._3).foreach { case (key, rs) =>
        assert(rs.map(_._1).distinct.size == 1,
          s"entity $key spread across partitions")
        val txs = rs.map(r => r._2.split("graft_message_id:ns:New:")(1)
          .split("[,:]")(0).toLong)
        assert(txs == txs.sorted, s"entity $key out of order: $txs")
      }
    } finally {
      Process(Seq("docker", "rm", "-f", name)).!(ProcessLogger(_ => ()))
      ()
    }
  }
}
