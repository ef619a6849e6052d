package graft.lineage

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkTestBase

/** Pins the OpenLineage export (r17): the RunEvent JSON for an INSERT
  * statement (sink dataset + columnLineage facet), the no-sink /
  * literal elision rules, the INDIRECT classification of CTRL edges,
  * and the HTTP endpoint's deterministic runId. */
class OpenLineageExportSpec extends SparkTestBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    LineageQueries.registerFixtures(spark, sfDir)
  }

  test("an INSERT exports the full RunEvent, byte-deterministic") {
    val r = LineageParser.parseStatement(spark,
      "INSERT INTO lineage_target SELECT n_nationkey, n_name " +
        "FROM nation WHERE n_regionkey = 1", 1)
    val json = OpenLineageExport.runEvent(r, namespace = "warehouse",
      jobName = "etl.daily", runId = "run-1",
      eventTime = "2026-08-16T00:00:00Z")
    assert(json ==
      """{"eventType":"COMPLETE","eventTime":"2026-08-16T00:00:00Z",""" +
      """"run":{"runId":"run-1"},""" +
      """"job":{"namespace":"warehouse","name":"etl.daily"},""" +
      """"inputs":[{"namespace":"warehouse","name":"default.nation"}],""" +
      """"outputs":[{"namespace":"warehouse","name":"default.lineage_target",""" +
      """"facets":{"columnLineage":{"_producer":"urn:graft:lineage:v1",""" +
      """"_schemaURL":"https://openlineage.io/spec/facets/1-0-1/ColumnLineageDatasetFacet.json",""" +
      """"fields":{"tgt_key":{"inputFields":[{"namespace":"warehouse",""" +
      """"name":"default.nation","field":"n_nationkey",""" +
      """"transformations":[{"type":"DIRECT"}]}]},""" +
      """"tgt_name":{"inputFields":[{"namespace":"warehouse",""" +
      """"name":"default.nation","field":"n_name",""" +
      """"transformations":[{"type":"DIRECT"}]}]}}}}}],""" +
      """"producer":"urn:graft:lineage:v1",""" +
      """"schemaURL":"https://openlineage.io/spec/1-0-5/OpenLineage.json"}""")
    // re-export of the same parse is byte-identical (no wall clock,
    // no randomness enters the emitter)
    assert(json == OpenLineageExport.runEvent(r, "warehouse",
      "etl.daily", "run-1", "2026-08-16T00:00:00Z"))
  }

  test("a supplied catalog lookup adds the schema facet to outputs") {
    val r = LineageParser.parseStatement(spark,
      "INSERT INTO lineage_target SELECT n_nationkey, n_name " +
        "FROM nation", 1)
    val json = OpenLineageExport.runEvent(r, "ns", "j", "run", "t",
      schemaOf = t => if (t == "default.lineage_target")
        Seq("tgt_key", "tgt_name") else Nil)
    assert(json.contains(
      """"schema":{"_producer":"urn:graft:lineage:v1","_schemaURL":""" +
        """"https://openlineage.io/spec/facets/1-0-0/SchemaDatasetFacet.json",""" +
        """"fields":[{"name":"tgt_key"},{"name":"tgt_name"}]}"""))
    // schema facet precedes columnLineage inside the same facets object
    assert(json.indexOf("\"schema\":{") < json.indexOf("columnLineage"))
    // default (no lookup) stays byte-identical to the v-facet-less form
    assert(!OpenLineageExport.runEvent(r, "ns", "j", "run", "t")
      .contains("\"schema\":{"))
    // INPUT datasets carry the facet too (r18) — a catalog rendering
    // the event shows source schemas, not just sink schemas
    val both = OpenLineageExport.runEvent(r, "ns", "j", "run", "t",
      schemaOf = {
        case "default.nation" => Seq("n_nationkey", "n_name", "n_regionkey")
        case "default.lineage_target" => Seq("tgt_key", "tgt_name")
        case _ => Nil
      })
    assert(both.contains(
      """{"namespace":"ns","name":"default.nation","facets":{""" +
        """"schema":{"_producer":"urn:graft:lineage:v1","_schemaURL":""" +
        """"https://openlineage.io/spec/facets/1-0-0/SchemaDatasetFacet.json",""" +
        """"fields":[{"name":"n_nationkey"},{"name":"n_name"},""" +
        """{"name":"n_regionkey"}]}}}"""), both)
    // an unknown input (no catalog answer) stays facet-free
    assert(both.contains(""""name":"default.lineage_target""""))
  }

  test("a bare SELECT exports no outputs; literal edges export no pair") {
    val r = LineageParser.parseStatement(spark,
      "SELECT n_name, 123 AS num FROM nation", 1)
    val json = OpenLineageExport.runEvent(r, "ns", "j", "r", "t")
    assert(json.contains(""""outputs":[]"""))
    assert(json.contains(""""name":"default.nation""""))
    assert(OpenLineageExport.fieldRows(Seq(r)).isEmpty)
  }

  test("CTRL edges classify INDIRECT; value edges DIRECT") {
    val r = LineageParser.parseStatement(spark,
      "INSERT INTO lineage_target SELECT n_nationkey, n_name " +
        "FROM nation WHERE n_regionkey = 1", 1,
      includeControl = true)
    val rows = OpenLineageExport.fieldRows(Seq(r))
    val byKind = rows.groupBy(_._6)
    assert(byKind("DIRECT").map(x => (x._3, x._5)).toSet ==
      Set(("tgt_key", "n_nationkey"), ("tgt_name", "n_name")))
    // the WHERE's control column reaches BOTH destination fields
    assert(byKind("INDIRECT").map(x => (x._3, x._5)).toSet ==
      Set(("tgt_key", "n_regionkey"), ("tgt_name", "n_regionkey")))
  }

  test("DDL outputs strip the operation tag; multi-sink fans out") {
    // Hive multi-insert: one FROM, two sink datasets, each with its
    // own facet fields
    val r = LineageParser.parseStatement(spark,
      "FROM nation INSERT INTO lineage_target SELECT n_nationkey, " +
        "n_name WHERE n_regionkey = 2 " +
        "INSERT INTO lineage_target2 SELECT n_regionkey, n_name", 1)
    val json = OpenLineageExport.runEvent(r, "ns", "j", "r", "t")
    assert(json.contains(""""name":"default.lineage_target""""))
    assert(json.contains(""""name":"default.lineage_target2""""))
    // outputs are sorted, facet fields grouped under their own dataset
    val i1 = json.indexOf("default.lineage_target\"")
    val i2 = json.indexOf("default.lineage_target2")
    assert(i1 >= 0 && i2 > i1)
  }

  test("POST /openlineage serves RunEvents with a name-UUID runId") {
    val server = LineageService.start(spark)
    try {
      val port = server.getAddress.getPort
      def post(body: String, headers: Seq[(String, String)] = Nil)
          : HttpResponse[String] = {
        val b = HttpRequest
          .newBuilder(URI.create(s"http://127.0.0.1:$port/openlineage"))
          .POST(HttpRequest.BodyPublishers.ofString(body))
        headers.foreach { case (k, v) => b.header(k, v) }
        HttpClient.newHttpClient()
          .send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      val sql = "INSERT INTO lineage_target SELECT n_nationkey, " +
        "n_name FROM nation WHERE n_regionkey = 1"
      val a = post(sql, Seq("X-Event-Time" -> "2026-08-16T01:02:03Z"))
      assert(a.statusCode() == 200)
      assert(a.body().startsWith("""[{"eventType":"COMPLETE""""))
      assert(a.body().contains(""""eventTime":"2026-08-16T01:02:03Z""""))
      assert(a.body().contains(""""columnLineage""""))
      // the endpoint wires the session catalog as the schema lookup
      assert(a.body().contains(
        """"fields":[{"name":"tgt_key"},{"name":"tgt_name"}]"""))
      // same SQL → same runId (idempotent re-emission); different SQL
      // → different runId
      val b = post(sql, Seq("X-Event-Time" -> "2026-08-17T00:00:00Z"))
      def runId(s: String): String =
        """"runId":"([^"]+)"""".r.findFirstMatchIn(s).get.group(1)
      assert(runId(a.body()) == runId(b.body()))
      val c = post("SELECT n_name FROM nation")
      assert(runId(c.body()) != runId(a.body()))
      assert(c.body().contains(""""eventTime":"1970-01-01T00:00:00Z""""))
      assert(c.body().contains(""""outputs":[]"""))
    } finally server.stop(0)
  }
}
