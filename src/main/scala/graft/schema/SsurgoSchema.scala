package graft.schema

import org.apache.spark.sql.types._

/** Fixed SSURGO schema registry — the Spark stand-in for the reference's
  * metadata tables mdstattabs/mdstattabcols
  * (SSURGO_Convert_to_Geodatabase.py:744, 827-952). Schemas are always
  * explicit: keys are TEXT in SSURGO (gSSURGO_CreateSoilMap.py:9817-9823)
  * and inference would silently turn them into longs.
  *
  * Only the analytic-surface columns are registered (the minimum field
  * sets the reference reads, gSSURGO_CreateSoilMap.py:9753-9758 +
  * FIXTURES.md); the physical SSURGO tables carry more.
  */
object SsurgoSchema {

  private def s(n: String) = StructField(n, StringType)
  private def i(n: String) = StructField(n, IntegerType)
  private def d(n: String) = StructField(n, DoubleType)

  val legend: StructType = StructType(Seq(s("lkey"), s("areasymbol")))

  val mapunit: StructType = StructType(Seq(
    s("mukey"), s("musym"), s("muname"), s("lkey")))

  val component: StructType = StructType(Seq(
    s("cokey"), s("mukey"), i("comppct_r"), s("compname"), s("compkind"),
    s("majcompflag"), s("taxorder"), s("taxsubgrp"), s("localphase"),
    s("otherph"), s("hydricrating"), s("drainagecl")))

  val chorizon: StructType = StructType(Seq(
    s("chkey"), s("cokey"), s("hzname"), s("desgnmaster"),
    i("hzdept_r"), i("hzdepb_r"),
    d("sandtotal_r"), d("silttotal_r"), d("claytotal_r"),
    d("om_r"), d("dbthirdbar_r"), d("ec_r"), d("ph1to1h2o_r"),
    d("awc_r"), s("kffact")))

  val chtexturegrp: StructType = StructType(Seq(
    s("chtgkey"), s("chkey"), s("texture"), s("rvindicator")))

  val chtexture: StructType = StructType(Seq(
    s("chtkey"), s("chtgkey"), s("lieutex")))

  val chfrags: StructType = StructType(Seq(s("chkey"), d("fragvol_r")))

  val corestrictions: StructType = StructType(Seq(
    s("cokey"), s("reskind"), s("reshard"), i("resdept_r")))

  val cointerp: StructType = StructType(Seq(
    s("cokey"), s("mrulekey"), s("mrulename"), s("rulekey"), s("rulename"),
    i("ruledepth"), d("interphr"), s("interphrc")))

  val comonth: StructType = StructType(Seq(
    s("comonthkey"), s("cokey"), i("monthseq")))

  val cosoilmoist: StructType = StructType(Seq(
    s("cosoilmoistkey"), s("comonthkey"), i("soimoistdept_r")))

  val muaggatt: StructType = StructType(Seq(
    s("mukey"), d("aws0100wta"), s("drclassdcd"), d("brockdepmin")))

  val distinterpmd: StructType = StructType(Seq(s("rulekey"), s("rulename")))

  /** mdstatrshipdet — the FK catalog the planner walks
    * (gSSURGO_CreateSoilMap.py:9997-10111). */
  val mdstatrshipdet: StructType = StructType(Seq(
    s("ltabphyname"), s("rtabphyname"), s("ltabcolphyname"), s("rtabcolphyname")))

  /** mdstatdomdet — ordered Choice domains (GetRatingDomain,
    * gSSURGO_CreateSoilMap.py:3865-3901). */
  val mdstatdomdet: StructType = StructType(Seq(
    s("domainname"), s("choice"), i("choicesequence"), s("choiceobsolete")))

  val all: Map[String, StructType] = Map(
    "legend" -> legend, "mapunit" -> mapunit, "component" -> component,
    "chorizon" -> chorizon, "chtexturegrp" -> chtexturegrp,
    "chtexture" -> chtexture, "chfrags" -> chfrags,
    "corestrictions" -> corestrictions, "cointerp" -> cointerp,
    "comonth" -> comonth, "cosoilmoist" -> cosoilmoist,
    "muaggatt" -> muaggatt, "distinterpmd" -> distinterpmd,
    "mdstatrshipdet" -> mdstatrshipdet, "mdstatdomdet" -> mdstatdomdet)
}

/** Catalog-row fixups applied at load time (the planner consumes
  * corrected rows; the quirks stay out of the planner itself). */
object SdvCatalog {

  private val ecoParens =
    "(coecoclass.ecoclasstypename = 'NRCS Rangeland Site' or coecoclass.ecoclasstypename = 'NRCS Forestland Site')"
  private val reskindIn =
    "corestrictions.reskind IN ('Densic bedrock', 'Paralithic bedrock', 'Lithic bedrock')"

  /** R8 — floodBandaid (gSSURGO_CreateSoilMap.py:166-203), faithful:
    * 1. flooding-frequency rows with a NULL tiebreakdomainname get
    *    'flooding_frequency_class' (the reference keys on
    *    attributekey=12; we key on the attribute name);
    * 2. the two parenthesized whereclauses that break the reference's
    *    SQL layer are rewritten to their paren-free forms. */
  def floodBandaid(att: SdvAttribute): SdvAttribute = {
    val a =
      if (att.attributename.toLowerCase.contains("flooding frequency") &&
        att.tiebreakdomainname.isEmpty)
        att.copy(tiebreakdomainname = Some("flooding_frequency_class"))
      else att
    a.sqlwhereclause.map(_.trim) match {
      case Some(`ecoParens`) => a.copy(sqlwhereclause = Some(
        "coecoclass.ecoclasstypename = 'NRCS Rangeland Site' or coecoclass.ecoclasstypename = 'NRCS Forestland Site'"))
      case Some(`reskindIn`) => a.copy(sqlwhereclause = Some(
        "corestrictions.reskind = 'Densic bedrock' OR corestrictions.reskind = 'Paralithic bedrock' OR corestrictions.reskind = 'Lithic bedrock'"))
      case _ => a
    }
  }

  /** GetRatingDomain (gSSURGO_CreateSoilMap.py:3865-3901): ordered
    * non-obsolete choices per domain from mdstatdomdet, deduplicated
    * preserving sequence order — a bounded metadata collect (the
    * reference holds the same per-domain list in memory). */
  def domainsFrom(mdstatdomdet: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] = {
    val c = org.apache.spark.sql.functions.col _
    mdstatdomdet
      // a blank choicesequence has no position in the ordered domain —
      // drop the row rather than NPE the whole import (the reference's
      // ORDER BY would sort SQL NULLs arbitrarily to one end)
      .filter(c("choiceobsolete") === "No" && c("choicesequence").isNotNull &&
        c("choice").isNotNull)
      .select("domainname", "choice", "choicesequence")
      .collect()
      .groupBy(_.getString(0))
      .map { case (d, rows) =>
        d -> rows.sortBy(_.getInt(2)).map(_.getString(1)).distinct.toSeq
      }
  }

  private val SimpleEq = """^\s*([\w.]+)\s*=\s*('(?:[^']|'')*')\s*$""".r

  /** GetSDVAtts whereclause normalization
    * (gSSURGO_CreateSoilMap.py:3741-3764): the reference rewrites
    * `col = 'val'` to `UPPER("col") = 'VAL'`, making the VALUE
    * comparison case-insensitive (identifier resolution already is in
    * Spark). Emitted in Spark-expr flavor: `upper(col) = 'VAL'`. */
  def normalize(att: SdvAttribute): SdvAttribute = {
    val fixed = floodBandaid(att)
    val wc = fixed.sqlwhereclause.map(_.trim).filter(_.nonEmpty).map {
      case SimpleEq(lhs, lit) => s"upper($lhs) = ${lit.toUpperCase}"
      case other => other
    }
    fixed.copy(sqlwhereclause = wc)
  }
}

/** One row of the sdvattribute catalog — the *query spec* driving the
  * SDV planner (GetSDVAtts, gSSURGO_CreateSoilMap.py:3689-3819;
  * FIXTURES.md lists the full physical column set). */
case class SdvAttribute(
    attributename: String,
    attributetablename: String,
    attributecolumnname: String,
    resultcolumnname: String,
    attributelogicaldatatype: String, // String|Choice|Integer|Float|VText
    algorithmname: String, // dAgg key, gSSURGO_CreateSoilMap.py:9654-9662
    ruledesign: Option[Int] = None, // 1 limitation / 2 suitability / 3 class
    nasisrulename: Option[String] = None,
    mapunitlevelattribflag: Int = 0,
    complevelattribflag: Int = 0,
    cmonthlevelattribflag: Int = 0,
    horzlevelattribflag: Int = 0,
    horzaggmeth: Option[String] = None, // Weighted Average | Weighted Sum
    tiebreakrule: Int = -1, // -1 low / 1 high
    tiebreakdomainname: Option[String] = None,
    notratedphrase: Option[String] = None,
    nullratingreplacementvalue: Option[Double] = None,
    interpnullsaszeroflag: Boolean = false,
    sqlwhereclause: Option[String] = None,
    attributeprecision: Option[Int] = None) // fldPrecision (:4765, max(0, ·))
