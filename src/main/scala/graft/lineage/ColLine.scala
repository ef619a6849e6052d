package graft.lineage

/** Column-level lineage edge.
  *
  * Field-for-field the reference's lineage edge
  * (reference `src/main/java/com/complone/hiveparser/entity/ColLine.java:12-30`,
  * string-encoding rules from `common/Constants.java:4-7`):
  *
  *  - `tableName`  destination table, db-qualified (`db.table`); the
  *    sentinel `<EOF>` marks a bare SELECT with no sink (reference
  *    `common/Constants.java:7`, `LineParser.java:104-108`).
  *  - `colName`    destination column resolved from the sink's schema by
  *    ordinal position, `db.table.col`; `None` when the sink is unknown
  *    or the select list is wider than the schema (reference
  *    `LineParser.java:138-152`).
  *  - `toName`     destination column as parsed — the select-item alias
  *    or simple column name (`LineParser.java:427-428`).
  *  - `fromName`   source column(s), each `db.table.col`, sorted and
  *    `,`-joined when one expression reads several columns
  *    (`LineParser.java:709-723`); branch sources merged across UNION
  *    are `&`-joined (`LineParser.java:540-542`,
  *    `common/Constants.java:6`). Empty for literal-only items
  *    (`LineParser.java:508-525` filters literals).
  *  - `conditionSet` tagged condition strings under which data flows:
  *    `WHERE:<expr>` (`LineParser.java:433`), `<JOINTYPE>:<expr>`
  *    (`LineParser.java:449-453`), `COLFUN:<expr>` for non-trivial
  *    select-side expressions (`LineParser.java:499-506`). Expression
  *    text uses Catalyst `Expression.sql` surface forms (documented
  *    divergence — SURVEY.md §7.4 #1).
  */
case class ColLine(
    tableName: String,
    colName: Option[String],
    toName: String,
    fromName: String,
    conditionSet: Set[String])

/** Statement kind (reference `common/Operation.java:3-5`). */
sealed abstract class Operation(val name: String)
object Operation {
  case object Select extends Operation("SELECT")
  case object Insert extends Operation("INSERT")
  case object Drop extends Operation("DROP")
  case object Truncate extends Operation("TRUNCATE")
  case object Load extends Operation("LOAD")
  case object CreateTable extends Operation("CREATETABLE")
  case object Alter extends Operation("ALTER")
  case object Use extends Operation("USE")
  // Lakehouse DML — engine extensions beyond the reference's Hive-era
  // operation set (Hive MERGE/UPDATE/DELETE postdate it).
  case object Update extends Operation("UPDATE")
  case object Delete extends Operation("DELETE")
  case object Merge extends Operation("MERGE")
  case object Default extends Operation("DEFAULT")
}

/** Per-statement lineage: edges plus the statement-level table sets the
  * reference accumulates (`LineParser.java:40-61` `inputTables` /
  * `outputTables`; DDL outputs recorded `"<name>\t<OP>"`,
  * `LineParser.java:435-440`).
  */
case class LineageResult(
    statementIndex: Int,
    operation: Operation,
    inputTables: Set[String],
    outputTables: Set[String],
    colLines: Seq[ColLine])

/** PUBLISHED edge-ROW contract, v1 (VERDICT r16 #9): the flat shape
  * `LineageParser.toDataset` emits and every downstream consumer reads
  * — the impact/column-impact engines, the q192 diff gate, the HTTP
  * service, and external subscribers. Field names, declaration order,
  * and types ARE the DataFrame schema (the Dataset is derived from
  * this class's encoder, so code and contract cannot drift apart);
  * [[LineageEdgeSchema.Version]] bumps on any change, and the spec
  * suite pins the rendered schema (DESIGN.md "Lineage edge schema"
  * documents the JSON form).
  *
  * Encodings (unchanged from the reference's string conventions):
  * `col_name`/`from_name` empty when absent, `.` qualifies names, `,`
  * separates one expression's sources, `&` union-branch merges, `|`
  * joins the SORTED condition tags; `CTRL:`-prefixed tags appear only
  * when control-dependency mode was requested. */
case class LineageEdge(
    stmt: Int,
    operation: String,
    table_name: String,
    col_name: String,
    to_name: String,
    from_name: String,
    conditions: String)

object LineageEdgeSchema {
  /** Bump on ANY change to [[LineageEdge]]'s fields, order, or
    * encodings — consumers key compatibility off this. */
  val Version = 1

  /** The contract as a JSON-schema-ish document (also in DESIGN.md);
    * served to consumers that never touch the JVM. */
  val json: String =
    """{"title":"graft.lineage.edge","version":1,"type":"object",
      |"properties":{
      |"stmt":{"type":"integer","description":"1-based statement index"},
      |"operation":{"type":"string","enum":["SELECT","INSERT","DROP","TRUNCATE","LOAD","CREATETABLE","ALTER","USE","UPDATE","DELETE","MERGE","DEFAULT"]},
      |"table_name":{"type":"string","description":"dest table (db.table / catalog.db.table / stream.<sink>); <EOF> = no sink"},
      |"col_name":{"type":"string","description":"dest column db.table.col by sink-schema ordinal; '' when unknown"},
      |"to_name":{"type":"string","description":"dest column as parsed (select-item alias)"},
      |"from_name":{"type":"string","description":"source columns db.table.col, ','-joined per expression, '&'-joined across union branches; '' for literals"},
      |"conditions":{"type":"string","description":"'|'-joined sorted tags: WHERE:/JOIN…:/COLFUN:/WATERMARK:/FUNC:/MERGE:/WHEN:, CTRL:-prefixed in control mode"}},
      |"required":["stmt","operation","table_name","col_name","to_name","from_name","conditions"]}"""
      .stripMargin.replace("\n", "")
}
