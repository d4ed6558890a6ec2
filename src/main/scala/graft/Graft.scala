package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{Lake, PipeCsv, WssLayout}
import graft.schema.{SdvAttribute, SsurgoSchema}
import graft.sdv.SdvPlanner
import graft.sdv.SdvPlanner.SdvRequest

/** The user-facing facade — the reference suite's workflows as a
  * library (SURVEY §3 entry points):
  *
  *  1. acquisition/ingest: landed WSS text → schema'd DataFrames →
  *     partitioned lake (SSURGO_Convert_to_Geodatabase /
  *     MergeDatabases);
  *  2. CreateSoilMap: sdvattribute catalog row + runtime params →
  *     rating table (gSSURGO_CreateSoilMap);
  *  3. batch soil maps merged wide
  *     (gSSURGO_CreateSoilMaps + gSSURGO_MergeRatingTables).
  */
object Graft {

  /** Read one survey area's tabular drop through the schema registry
    * (explicit StructTypes — keys stay TEXT). Tables absent from the
    * drop are skipped (partial drops are normal: not every survey ships
    * every satellite table). */
  def loadSurvey(spark: SparkSession, root: String, areasymbol: String): Map[String, DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    SsurgoSchema.all.flatMap { case (table, schema) =>
      val path = new org.apache.hadoop.fs.Path(
        WssLayout.tabularPath(root, areasymbol, table))
      if (path.getFileSystem(conf).exists(path))
        Some(table -> PipeCsv.read(spark, path.toString, schema))
      else None
    }
  }

  /** S2 — import the metadata (mdstat*) tables from a survey's tabular
    * folder: WSS short filenames (msrsdet, msdomdet, …) map to their
    * physical table names through WssLayout.metadataFiles
    * (ImportMDTabular, SSURGO_Convert_to_Geodatabase.py:827-952); the
    * same pipe-CSV reader and schema registry as loadSurvey. Files
    * without a registered schema are skipped. */
  def loadMetadata(spark: SparkSession, root: String, areasymbol: String): Map[String, DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    WssLayout.metadataFiles.flatMap { case (short, table) =>
      SsurgoSchema.all.get(table).flatMap { schema =>
        val path = new org.apache.hadoop.fs.Path(
          WssLayout.tabularPath(root, areasymbol, short))
        if (path.getFileSystem(conf).exists(path))
          Some(table -> PipeCsv.read(spark, path.toString, schema))
        else None
      }
    }
  }

  /** Union per-survey tables and land them in the areasymbol-partitioned
    * lake (the gSSURGO bulk build). */
  def landSurveys(surveys: Seq[Map[String, DataFrame]], lakeRoot: String): Unit =
    surveys.flatten.groupBy(_._1).foreach { case (table, dfs) =>
      Lake.write(dfs.map(_._2).reduce(_.unionByName(_)), lakeRoot, table,
        partitionBy = Seq.empty)
    }

  /** One SDV soil-map query (CreateSoilMap). Catalog fixups
    * (floodBandaid etc.) apply at entry, as in GetSDVAtts. */
  def soilMap(tables: Map[String, DataFrame],
      domains: Map[String, Seq[String]] = Map.empty)(
      att: SdvAttribute, req: SdvRequest = SdvRequest()): DataFrame =
    new SdvPlanner(tables, domains).plan(graft.schema.SdvCatalog.normalize(att), req)

  /** Batch soil maps merged wide on the mapunit universe
    * (CreateSoilMaps loop + MergeRatingTables fold — each rating table
    * contributes its resultcolumnname column). */
  def soilMaps(tables: Map[String, DataFrame],
      domains: Map[String, Seq[String]] = Map.empty)(
      queries: Seq[(SdvAttribute, SdvRequest)]): DataFrame = {
    // shareBase: one materialization of the mapunit⟕component join
    // serves every catalog row (the planner's batch-loop optimization —
    // see SdvPlanner.baseMemo)
    val planner = new SdvPlanner(tables, domains, shareBase = true)
    val base = tables("mapunit").select(org.apache.spark.sql.functions.col("mukey"))
    queries.foldLeft(base) { case (acc, (att, req)) =>
      val rating = planner.plan(graft.schema.SdvCatalog.normalize(att), req)
        .select("mukey", att.resultcolumnname)
      acc.join(rating, Seq("mukey"), "left")
    }
  }
}
