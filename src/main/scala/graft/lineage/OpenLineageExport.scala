package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** OpenLineage export: the engine's edges rendered as OpenLineage
  * run events (the PUBLIC interop spec at openlineage.io — RunEvent
  * with input/output datasets and the `columnLineage` dataset facet).
  * The reference speaks only its private five-field shape
  * (`entity/ColLine.java:12-30`); a lineage service that feeds a
  * catalog (Marquez-style) must speak the open wire format too, so
  * this maps the v1 [[LineageEdge]] contract onto it:
  *
  *  - one RunEvent per statement; `inputs` = the statement's input
  *    tables, `outputs` = its sink tables (a bare SELECT has no sink
  *    — `<EOF>` — and exports with empty `outputs`, which is what
  *    OpenLineage means by a job that materializes nothing);
  *  - per output dataset, the `columnLineage` facet maps each output
  *    field to its input fields (`from_name` split on `,`/`&`,
  *    `db.table.col` → dataset `db.table` + field `col`);
  *  - value-flow edges export transformation type `DIRECT`;
  *    control-dependency edges (`CTRL:` tags, engine mode) export
  *    `INDIRECT` — OpenLineage's own word for "influences the rows,
  *    not the values".
  *
  * Everything is deterministically ordered (datasets, fields, and
  * inputFields sorted) and the caller supplies `eventTime`/`runId` —
  * the emitter adds no wall-clock or randomness, so re-exporting the
  * same parse is byte-identical (idempotent delivery).
  */
object OpenLineageExport {

  /** `_producer` URI stamped on every event/facet (spec-required). */
  val Producer = "urn:graft:lineage:v1"
  private val SchemaUrl =
    "https://openlineage.io/spec/1-0-5/OpenLineage.json"
  private val FacetUrl =
    "https://openlineage.io/spec/facets/1-0-1/ColumnLineageDatasetFacet.json"
  private val SchemaFacetUrl =
    "https://openlineage.io/spec/facets/1-0-0/SchemaDatasetFacet.json"

  import LineageService.jstr

  /** The columnLineage facet as ROWS — the relational projection the
    * JSON below is assembled from (and the oracle-checkable surface:
    * q282). One row per (output field, input field): statements with
    * no sink contribute nothing, literal-only edges (`from_name` "")
    * contribute nothing, and the output field name prefers the
    * sink-schema-resolved `col_name` over the parsed alias. */
  def fieldRows(results: Seq[LineageResult])
      : Seq[(Int, String, String, String, String, String)] =
    results.flatMap { r =>
      r.colLines
        .filter(c => c.tableName != LineageParser.NoSink &&
          c.fromName.nonEmpty)
        .flatMap { c =>
          val outField = c.colName match {
            case Some(qualified) => qualified.split('.').last
            case None => c.toName
          }
          val kind =
            if (c.conditionSet.exists(_.startsWith("CTRL:"))) "INDIRECT"
            else "DIRECT"
          c.fromName.split("[,&]").toSeq.filter(_.nonEmpty).map { src =>
            val parts = src.split('.')
            val (inDs, inField) =
              (parts.dropRight(1).mkString("."), parts.last)
            (r.statementIndex, c.tableName, outField, inDs, inField, kind)
          }
        }
    }.distinct.sorted

  /** One OpenLineage RunEvent per statement, JSON-encoded. */
  def runEvents(results: Seq[LineageResult], namespace: String,
                jobName: String, runId: String, eventTime: String,
                schemaOf: String => Seq[String] = _ => Nil): Seq[String] =
    results.map(r =>
      runEvent(r, namespace, jobName, runId, eventTime, schemaOf))

  /** The OpenLineage `schema` dataset facet body from the supplied
    * catalog lookup — empty when the table is unknown (a facet of
    * guesses is worse than no facet). */
  private def schemaFacetJson(schemaOf: String => Seq[String],
                              table: String): String =
    schemaOf(table) match {
      case Nil => ""
      case cols =>
        val fs = cols.map(c => s"""{"name":${jstr(c)}}""")
          .mkString("[", ",", "]")
        s""""schema":{"_producer":${jstr(Producer)},""" +
          s""""_schemaURL":${jstr(SchemaFacetUrl)},"fields":$fs}"""
    }

  def runEvent(r: LineageResult, namespace: String, jobName: String,
               runId: String, eventTime: String,
               schemaOf: String => Seq[String] = _ => Nil): String = {
    val rows = fieldRows(Seq(r))
    // inputs carry the schema facet too (r18): a catalog rendering
    // the event can then show SOURCE schemas, not just sink schemas
    val inputs = r.inputTables.toSeq.sorted.map { t =>
      val facet = schemaFacetJson(schemaOf, t) match {
        case "" => ""
        case f => s""","facets":{$f}"""
      }
      s"""{"namespace":${jstr(namespace)},"name":${jstr(t)}$facet}"""
    }
    // DDL records outputs as "<name>\t<OP>" (reference
    // LineParser.java:435-440) — the dataset name is the part before
    // the tab; `<EOF>` (no sink) exports no output dataset at all.
    val outNames = r.outputTables.toSeq
      .map(_.split('\t').head)
      .filter(_ != LineageParser.NoSink).distinct.sorted
    val outputs = outNames.map { t =>
      val byField = rows.filter(_._2 == t)
        .groupBy(_._3).toSeq.sortBy(_._1)
      val schemaFacet = schemaFacetJson(schemaOf, t) match {
        case "" => ""
        case f => f + ","
      }
      val facet =
        if (byField.isEmpty && schemaFacet.isEmpty) ""
        else if (byField.isEmpty)
          s""","facets":{${schemaFacet.stripSuffix(",")}}"""
        else {
          val fields = byField.map { case (f, rs) =>
            val ins = rs.sortBy(x => (x._4, x._5)).map { x =>
              s"""{"namespace":${jstr(namespace)},"name":${jstr(x._4)},""" +
                s""""field":${jstr(x._5)},""" +
                s""""transformations":[{"type":${jstr(x._6)}}]}"""
            }.mkString("[", ",", "]")
            s"""${jstr(f)}:{"inputFields":$ins}"""
          }.mkString(",")
          s""","facets":{$schemaFacet"columnLineage":{"_producer":${
            jstr(Producer)},""" +
            s""""_schemaURL":${jstr(FacetUrl)},"fields":{$fields}}}"""
        }
      s"""{"namespace":${jstr(namespace)},"name":${jstr(t)}$facet}"""
    }
    s"""{"eventType":"COMPLETE","eventTime":${jstr(eventTime)},""" +
      s""""run":{"runId":${jstr(runId)}},""" +
      s""""job":{"namespace":${jstr(namespace)},"name":${jstr(jobName)}},""" +
      s""""inputs":[${inputs.mkString(",")}],""" +
      s""""outputs":[${outputs.mkString(",")}],""" +
      s""""producer":${jstr(Producer)},""" +
      s""""schemaURL":${jstr(SchemaUrl)}}"""
  }

  /** The facet rows over a parsed corpus as a DataFrame (q282). */
  def toDataFrame(spark: SparkSession,
                  results: Seq[LineageResult]): DataFrame =
    spark.createDataFrame(fieldRows(results))
      .toDF("stmt", "dataset", "field", "input_dataset", "input_field",
        "transformation")
}
