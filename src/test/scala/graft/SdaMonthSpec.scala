package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.io.SdaClient
import graft.schema.{SdvAttribute, SsurgoSchema}
import graft.sdv.SdvPlanner

/** SDA client contract tests (canned transport) + the planner's
  * month-level (comonth/cosoilmoist) path with the DTWT sentinel. */
class SdaMonthSpec extends AnyFunSuite {
  import TestSpark._

  test("SDA request payload matches the reference POST contract") {
    val p = SdaClient.requestPayload("SELECT mukey FROM mapunit WHERE areasymbol = 'NE109'")
    assert(p === """{"format":"JSON+COLUMNNAME+METADATA","query":"SELECT mukey FROM mapunit WHERE areasymbol = 'NE109'"}""")
    assert(SdaClient.batchAreasymbols((1 to 9).map(i => s"A$i")).map(_.size) === Seq(4, 4, 1))
  }

  test("SDA response parse: header + metadata rows stripped, TEXT schema") {
    val canned = Seq(
      Seq("mukey", "natmusym"),
      Seq("ColumnOrdinal=0...", "ColumnOrdinal=1..."),
      Seq("100001", "abcd"), Seq("100002", "efgh"))
    val got = SdaClient.query(spark, "ignored", _ => canned)
    assert(got.columns.toSeq === Seq("mukey", "natmusym"))
    assert(rowsOf(got) === Seq(Seq("100001", "abcd"), Seq("100002", "efgh")))
  }

  test("month-level Choice Min/Max ranks by domain, not lexically (A13 regression guard)") {
    import org.apache.spark.sql.types._
    val mapunit = df(SsurgoSchema.mapunit, Seq(Row("100001", "AaB", "Alpha", "L1")))
    val component = df(SsurgoSchema.component, Seq(
      Row("c1", "100001", 60, "Alpha", "Series", "Yes", null, null, null, null, null, null),
      Row("c2", "100001", 40, "Beta", "Series", "No", null, null, null, null, null, null)))
    val comonthS = StructType(SsurgoSchema.comonth.fields :+
      StructField("flodfreqcl", StringType))
    val comonth = df(comonthS, Seq(
      Row("cm1", "c1", 4, "None"), Row("cm2", "c1", 5, "Frequent"),
      Row("cm3", "c2", 4, "Rare")))
    val p = new SdvPlanner(
      Map("mapunit" -> mapunit, "component" -> component, "comonth" -> comonth),
      domains = Map("flood" -> Seq("None", "Rare", "Occasional", "Frequent")))
    val att = SdvAttribute("Flooding Frequency", "comonth", "flodfreqcl",
      "rating", "Choice", "Minimum or Maximum", cmonthlevelattribflag = 1,
      tiebreakrule = 1, tiebreakdomainname = Some("flood"))
    // worst month per comp by DOMAIN rank: c1 → Frequent (lexical max
    // would wrongly give 'Rare' the win via 'R' > 'F'); class pct 60.
    assert(rowsOf(p.plan(att)) === Seq(Seq("100001", "Frequent", 60.0)))
  }

  test("planner month path: comonth→cosoilmoist FK walk with DTWT sentinel") {
    val mapunit = df(SsurgoSchema.mapunit, Seq(Row("100001", "AaB", "Alpha", "L1")))
    val component = df(SsurgoSchema.component, Seq(
      Row("c1", "100001", 60, "Alpha", "Series", "Yes", null, null, null, null, null, null),
      Row("c2", "100001", 40, "Beta", "Series", "No", null, null, null, null, null, null)))
    val comonth = df(SsurgoSchema.comonth, Seq(
      Row("cm1", "c1", 4), Row("cm2", "c1", 5), Row("cm3", "c2", 4)))
    val cosoilmoist = df(SsurgoSchema.cosoilmoist, Seq(
      Row("sm1", "cm1", 50), Row("sm2", "cm2", null), // null → 201 sentinel
      Row("sm3", "cm3", 30)))
    val p = new SdvPlanner(Map("mapunit" -> mapunit, "component" -> component,
      "comonth" -> comonth, "cosoilmoist" -> cosoilmoist))
    val att = SdvAttribute("Depth to Water Table", "cosoilmoist",
      "soimoistdept_r", "dtwt", "Integer", "Dominant Component",
      cmonthlevelattribflag = 1,
      nullratingreplacementvalue = Some(201.0))
    // tiebreakrule default -1 → tieLow → monthly MIN per component:
    // c1: min(50, 201) = 50; c2: 30. DCP → c1 (60%) → 50.
    val got = rowsOf(p.plan(att))
    assert(got === Seq(Seq("100001", 50.0, 60.0)))
    // month-range filter keeps only monthseq 5 → c1's null month → 201
    val got2 = rowsOf(p.plan(att,
      SdvPlanner.SdvRequest(begMonth = Some(5), endMonth = Some(5))))
    assert(got2 === Seq(Seq("100001", 201.0, 60.0)))
  }
}
