package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.analog.Analog._
import graft.analog.OracleSql
import graft.core.Exprs
import graft.io.PipeCsv
import graft.report.Reports
import graft.sdv.SdvAgg

/** Sources/sinks (S1, S6, S7, S8, S10) and reports (R1, R2/R3) from
  * SURVEY.md §2.1 / §2.6. */
object MiscQueries extends QuerySet {

  val all: Seq[Q] = Seq(

    // S1 — pipe-delimited SSURGO text roundtrip
    // (SSURGO_Convert_to_Geodatabase.py:1135-1590): write the region dim
    // as |-delimited text, read it back through the schema-registry
    // reader (explicit schema, blank→NULL).
    Q("s01_pipe_csv_roundtrip",
      (s, dir) => {
        val region = Tables.load(s, dir, "region")
        val tmp = "/tmp/graft_s01_" + dir.replaceAll("[^A-Za-z0-9]", "_")
        PipeCsv.write(region, tmp)
        PipeCsv.read(s, tmp, region.schema)
      },
      Some("SELECT r_regionkey, r_name FROM region")),

    // S6/S10 — multi-survey union + by-key dedup
    // (SSURGO_MergeDatabases.py:395-845).
    Q("s06_union_merge_dedup",
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
        PipeCsv.mergeDedup(Seq(sup, sup), Seq("s_suppkey"))
      },
      Some("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier")),

    // S7 — mukey→int rasterization lookup (SSURGO_ExportMuRaster.py:
    // 1252-1357): dense ids over the key domain into CELLVALUE ints,
    // via range-partitioned sorted zipWithIndex (graft.core.DenseId) —
    // no global-order window, no single-partition exchange.
    Q("s07_mukey_lookup",
      (s, dir) => {
        val keys = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("mukey"))
        keys.join(graft.core.DenseId.lookup(keys, "mukey"), Seq("mukey"))
      },
      Some("""SELECT o_orderkey AS mukey,
             |       CAST(dense_rank() OVER (ORDER BY o_orderkey) AS BIGINT) AS cellvalue
             |FROM orders""".stripMargin)),

    // S8 — rating-raster export join (gSSURGO_ExportRasters.py:720-1746):
    // cell → mukey → rating via a broadcast of the rating table.
    Q("s08_rating_raster_join",
      (s, dir) => {
        val cells = comp(s, dir).select(col("cokey").as("cellvalue"), col("mukey"))
        val rating = SdvAgg.weightedAverage(compNumeric(s, dir))
          .select(col("mukey"), col("rating"))
        cells.join(broadcast(rating), Seq("mukey")).select("cellvalue", "rating")
      },
      Some(withCtes(
        """SELECT c.cokey AS cellvalue, w.rating
          |FROM comp c JOIN (SELECT mukey, floor((sum(comppct*rating)/sum(comppct))*1e4 + 0.5)/1e4 AS rating,
          |                         sum(comppct) AS comppct
          |                  FROM comp GROUP BY mukey) w ON c.mukey = w.mukey""".stripMargin,
        compCte))),

    // R1 — GetDominantComponent.py:89-117 (ORDER BY comppct DESC,
    // cokey DESC, first wins).
    Q("r01_dominant_component_key",
      (s, dir) => Reports.dominantComponentKey(comp(s, dir)),
      Some(withCtes(
        """SELECT mukey, cokey FROM (
          |  SELECT mukey, cokey, row_number() OVER (PARTITION BY mukey
          |    ORDER BY comppct DESC, cokey DESC) AS rn
          |  FROM comp) t WHERE rn = 1""".stripMargin, compCte))),

    // R2/R3 — acreage report (gSSURGO_AcreageReport.py:186-327): Σ area
    // per rating class with domain display order.
    Q("r02_acreage_report",
      (s, dir) => {
        val rating = SdvAgg.dominantComponent(compChoice(s, dir))
          .select(col("mukey"), col("rating"))
        val areas = Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("mukey"),
            Exprs.cents(col("o_totalprice")).as("area"))
        Reports.acreage(rating, areas, 0.000247105, flagDomain)
      },
      Some(withCtes(
        """SELECT coalesce(d.rating, 'Not rated') AS rating,
          |       floor((sum(a.area)*0.000247105/100)*1e2 + 0.5)/1e2 AS acres,
          |       CASE coalesce(d.rating, 'Not rated')
          |         WHEN 'A' THEN 1.0 WHEN 'N' THEN 2.0 WHEN 'R' THEN 3.0
          |         ELSE 4.0 END AS rank
          |FROM dcp d
          |JOIN (SELECT o_orderkey AS mukey, round(o_totalprice*100) AS area
          |      FROM orders) a ON d.mukey = a.mukey
          |GROUP BY coalesce(d.rating, 'Not rated')""".stripMargin,
        compCte,
        "compc AS (SELECT mukey, cokey, comppct, crating AS rating, cord AS ord FROM comp)",
        s"dcp AS (${OracleSql.dcp("compc")})"))))
}
