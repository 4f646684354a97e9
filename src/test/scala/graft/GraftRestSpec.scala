package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.api.{Graft, GraftRest}
import graft.model.{ChangeEvent, Op}
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the §2.12 REST layer over real HTTP (ephemeral port):
  * the same verb sequence a reference operator would issue against the
  * Spring services — register filters, trigger a snapshot, poll status,
  * read the edits-log watermark — each answered from live Spark state. */
class GraftRestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val http = HttpClient.newHttpClient()
  private def send(method: String, url: String, body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val req = (method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }).build()
    val r = http.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("filters/snapshot/status/watermark round-trip over HTTP") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_").toString
    val g = new Graft(spark, dir)
    g.replay(Seq(
      ChangeEvent(1, Op.AddFile, "/data/movies/p1.parquet"),
      ChangeEvent(2, Op.CloseFile, "/data/movies/p1.parquet"),
      ChangeEvent(3, Op.AddFile, "/data/movies/p2.parquet"),
      ChangeEvent(4, Op.CloseFile, "/data/movies/p2.parquet"),
      ChangeEvent(5, Op.AddFile, "/data/other/x.csv")).toDS())
    val rest = new GraftRest(g).start()
    val base = s"http://localhost:${rest.boundPort}"
    try {
      // PUT single filter
      val (c1, b1) = send("PUT", s"$base/snapshot/filters/add/d1",
        """{"entity":"MOVIES","dir":"/data/movies","regex":".*\\.parquet$","priority":1}""")
      assert(c1 == 200 && b1.contains("\"MOVIES\""))

      // PUT batch with a second domain
      val (c2, b2) = send("PUT", s"$base/snapshot/filters/add/d2/batch",
        """[{"entity":"CSV","dir":"/data/other","regex":".*\\.csv$","priority":2}]""")
      assert(c2 == 200 && b2.contains("\"CSV\"") && b2.contains("\"MOVIES\""))

      // GET registry
      val (c3, b3) = send("GET", s"$base/snapshot/filters")
      assert(c3 == 200 && b3.contains("\"MOVIES\"") && b3.contains("\"CSV\""))

      // POST snapshot run — counts must match the facade's own answer
      val want = g.snapshot(100L).count()
      val (c4, b4) = send("POST", s"$base/snapshot/run", """{"asOfTxId":100}""")
      assert(c4 == 200 && b4 == s"""{"asOfTxId":100,"count":$want}""")

      // GET per-entity status
      val (c5, b5) = send("GET", s"$base/snapshot/status")
      assert(c5 == 200 && b5.contains("\"entity\":\"MOVIES\"")
        && b5.contains("\"n_files\":2"))

      // DELETE one filter; registry shrinks
      val (c6, b6) = send("DELETE", s"$base/snapshot/filters/remove/d2/CSV")
      assert(c6 == 200 && !b6.contains("\"CSV\""))

      // GET editslog status: watermark mirrors the facade
      val (c7, b7) = send("GET", s"$base/editslog/status")
      assert(c7 == 200 && b7.contains(s""""watermark":${g.watermark()}"""))

      // malformed body → 400, unknown route → 404
      assert(send("PUT", s"$base/snapshot/filters/add/d3", "{oops")._1 == 400)
      assert(send("GET", s"$base/nope")._1 == 404)
    } finally rest.stop()
  }
}
