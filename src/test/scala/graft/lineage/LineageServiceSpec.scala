package graft.lineage

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkTestBase

/** End-to-end REST facade parity (`controller/ParseController.java`):
  * POST raw SQL to /fetch over real HTTP, get the edge list as JSON. */
class LineageServiceSpec extends SparkTestBase {

  private def post(port: Int, body: String,
                   method: String = "POST"): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/fetch"))
      .method(method, HttpRequest.BodyPublishers.ofString(body)).build()
    HttpClient.newHttpClient().send(req, HttpResponse.BodyHandlers.ofString())
  }

  test("POST /fetch returns lineage edges as JSON; errors are named") {
    graft.Tables.registerAll(spark, sfDir)
    val server = LineageService.start(spark)
    try {
      val port = server.getAddress.getPort
      val ok = post(port,
        "SELECT n_name FROM nation WHERE n_regionkey = 0")
      assert(ok.statusCode() == 200)
      assert(ok.headers().firstValue("Content-Type").get == "application/json")
      assert(ok.body().contains(""""toName":"n_name""""))
      assert(ok.body().contains(""""fromName":"default.nation.n_name""""))
      assert(ok.body().contains("WHERE:(nation.n_regionkey = 0)"))

      // multi-statement body: USE threads the db across statements and
      // both statements' edges come back with their 1-based index
      val multi = post(port,
        "USE default; SELECT r_name FROM region")
      assert(multi.statusCode() == 200)
      assert(multi.body().contains(""""stmt":2"""))
      assert(multi.body().contains(""""fromName":"default.region.r_name""""))

      // a parse failure is a 400 with the parser's message, not a 500
      val bad = post(port, "SELEKT broken FROM")
      assert(bad.statusCode() == 400)
      assert(bad.body().startsWith("""{"error":"""))

      val empty = post(port, "   ")
      assert(empty.statusCode() == 400)

      val wrongMethod = post(port, "", method = "GET")
      assert(wrongMethod.statusCode() == 405)
    } finally server.stop(0)
  }

  test("toJson escapes quotes and emits sorted deterministic conditions") {
    val r = LineageResult(1, Operation.Select, Set("t"), Set.empty,
      Seq(ColLine("<EOF>", None, "c", "t.c",
        Set("WHERE:(x = \"q\")", "COLFUN:f(a)"))))
    val json = LineageService.toJson(Seq(r))
    assert(json.contains("\\\"q\\\""))
    // sorted: COLFUN before WHERE
    assert(json.indexOf("COLFUN:f(a)") < json.indexOf("WHERE:(x ="))
    assert(json.contains(""""colName":null"""))
  }
}
