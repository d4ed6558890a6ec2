package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Exprs, Ranked}

/** Report operators (SURVEY.md §2.6). */
object Reports {

  /** R1 — GetDominantComponent.py:89-117: per mapunit the first cokey
    * under ORDER BY comppct DESC, cokey DESC. */
  def dominantComponentKey(comp: DataFrame): DataFrame =
    Ranked.argmax(comp, Seq("mukey"),
      Seq(col("comppct"), col("cokey")),
      Seq("cokey" -> col("cokey")))

  /** R2/R3 — CalculateAcres (gSSURGO_AcreageReport.py:186-327): Σ area
    * per rating class (null → 'Not rated'), scaled by the acre
    * conversion, with the domain ordinal for display order. */
  def acreage(rating: DataFrame, areas: DataFrame, conv: Double,
      domain: Seq[String], scale: Int = 2): DataFrame =
    rating.join(areas, "mukey")
      .groupBy(coalesce(col("rating"), lit("Not rated")).as("rating"))
      .agg(Exprs.roundHalfUp(sum(col("area")) * lit(conv) / lit(100), scale).as("acres"))
      .withColumn("rank", Exprs.domainRank(col("rating"), domain))
}
