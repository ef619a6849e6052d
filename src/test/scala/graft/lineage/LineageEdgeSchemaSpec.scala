package graft.lineage

import graft.SparkTestBase

/** Pins the PUBLISHED edge contract (VERDICT r16 #9): the v1 field
  * names, order, and types consumed by the impact engines, the q192
  * diff gate, the HTTP service, and external subscribers. A failure
  * here means the contract drifted — bump LineageEdgeSchema.Version
  * and the JSON document deliberately, never silently. */
class LineageEdgeSchemaSpec extends SparkTestBase {

  test("toDataset emits exactly the v1 field names and types, in order") {
    graft.Tables.registerAll(spark, sfDir)
    val df = LineageParser.toDataset(spark, Seq(
      LineageParser.parseStatement(spark,
        "SELECT n_name FROM nation WHERE n_regionkey = 0", 1)))
    assert(df.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq("stmt" -> "integer", "operation" -> "string",
        "table_name" -> "string", "col_name" -> "string",
        "to_name" -> "string", "from_name" -> "string",
        "conditions" -> "string"))
    // the schema derives from the case class itself — same assertion
    // through the encoder, so a field rename breaks BOTH paths
    assert(org.apache.spark.sql.Encoders.product[LineageEdge].schema ==
      df.schema)
  }

  test("version and JSON document stay in lockstep with the case class") {
    assert(LineageEdgeSchema.Version == 1)
    val required = classOf[LineageEdge].getDeclaredFields.map(_.getName)
    // every case-class field appears in the JSON contract, and the
    // JSON names no phantom fields in `required`
    required.foreach(f =>
      assert(LineageEdgeSchema.json.contains("\"" + f + "\""), f))
    assert(LineageEdgeSchema.json.contains("\"version\":1"))
    // parseable: balanced and quote-escaped (cheap sanity without a
    // JSON dependency)
    assert(LineageEdgeSchema.json.count(_ == '{') ==
      LineageEdgeSchema.json.count(_ == '}'))
  }

  test("the HTTP /fetch field names are the camelCase twins of v1") {
    // the REST face serializes the same edge with the reference's Java
    // field names (ColLine.java) — pin the mapping so a contract bump
    // forces a deliberate decision about the wire form too
    val r = LineageResult(1, Operation.Select, Set("t"), Set.empty,
      Seq(ColLine("<EOF>", None, "c", "t.c", Set("WHERE:(x)"))))
    val json = LineageService.toJson(Seq(r))
    Seq("stmt", "tableName", "colName", "toName", "fromName",
      "conditionSet").foreach(f => assert(json.contains("\"" + f + "\""), f))
  }
}
