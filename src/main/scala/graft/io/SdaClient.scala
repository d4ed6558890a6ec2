package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.Row

/** S5 — the Soil Data Access tabular REST source
  * (GetNatMusym.py:241-430, SSURGO_CheckgSSURGO.py:372-448 QuerySDA).
  *
  * The reference POSTs {"query": sql, "format": "JSON+COLUMNNAME"} to
  * post.rest and reads a {"Table": [[col names], [metadata?], rows...]}
  * payload, where the first row is column names (and with +METADATA the
  * second row is column metadata). This module implements that contract
  * as pure functions — request payload building and response-table
  * parsing into a DataFrame — with the HTTP transport pluggable
  * (injected as a function), because this environment is zero-egress
  * and, per SURVEY §3, SDA serves as validation oracle rather than the
  * engine's data path.
  */
object SdaClient {

  val endpoint =
    "https://sdmdataaccess.sc.egov.usda.gov/Tabular/SDMTabularService/post.rest"

  /** Build the POST payload (format per GetNatMusym.py:303-316). */
  def requestPayload(sql: String, withMetadata: Boolean = true): String = {
    val fmt = if (withMetadata) "JSON+COLUMNNAME+METADATA" else "JSON+COLUMNNAME"
    val q = sql.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => " "
      case c => c.toString
    }
    s"""{"format":"$fmt","query":"$q"}"""
  }

  /** Parse the SDA "Table" payload: row 0 = column names, row 1 =
    * metadata when present (GetNatMusym.py:330-333), rest = data (all
    * strings — SSURGO keys are TEXT). */
  def parseTable(rows: Seq[Seq[String]], withMetadata: Boolean = true): (StructType, Seq[Seq[String]]) = {
    require(rows.nonEmpty, "empty SDA response")
    val names = rows.head
    val schema = StructType(names.map(n => StructField(n, StringType)))
    val data = rows.drop(if (withMetadata && rows.length > 1) 2 else 1)
    (schema, data)
  }

  /** Run a query through an injected transport (sql → table rows) and
    * return a DataFrame. The production transport POSTs
    * requestPayload(sql) to `endpoint`; tests inject a canned payload. */
  def query(spark: SparkSession, sql: String,
      transport: String => Seq[Seq[String]],
      withMetadata: Boolean = true): DataFrame = {
    val (schema, data) = parseTable(transport(sql), withMetadata)
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(Row(_: _*)), 1), schema)
  }

  /** SDA batching: at most 4 areasymbols per request
    * (SSURGO_CheckgSSURGO.py:466-476). */
  def batchAreasymbols(areas: Seq[String], batchSize: Int = 4): Seq[Seq[String]] =
    areas.grouped(batchSize).toSeq
}
