package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Names
import graft.schema.{SdvAttribute, SdvCatalog}

class NamesCatalogSpec extends AnyFunSuite {

  test("validateName drops invalid chars (reference behavior), squeezes, guards leading digit") {
    // parens/commas/percent DROP (not substitute); spaces -> underscore
    assert(Names.validateName("AWS, 0-100 cm (weighted avg)") === "AWS_0100_cm_weighted_avg")
    assert(Names.validateName("pH 1:1 water") === "pH_11_water")
    assert(Names.validateName("  2% slope!! ") === "z2_slope")
    assert(Names.validateName("café") === "caf") // non-ASCII dropped
    // truncation cannot leave a trailing underscore
    assert(!Names.validateName(("a" * 59) + "_b").endsWith("_"))
    assert(Names.validateName("a" * 100).length === 60)
  }

  test("inList quotes, escapes, and rejects the empty selection") {
    assert(Names.inList(Seq("a", "o'b")) === "('a', 'o''b')")
    assertThrows[IllegalArgumentException](Names.inList(Seq.empty))
  }

  test("legendJson renders class breaks, caps the blob, and nulls non-finite bounds") {
    val j = Names.legendJson("AWS", Seq(("Low", 0.0, 5.0), ("High", 5.0, 10.0)))
    assert(j === """{"title":"AWS","classes":[{"label":"Low","min":0.0,"max":5.0},{"label":"High","min":5.0,"max":10.0}]}""")
    val nan = Names.legendJson("t", Seq(("x", Double.NaN, Double.PositiveInfinity)))
    assert(nan.contains(""""min":null,"max":null"""))
    val big = Seq.fill(2000)(("x" * 10, 0.0, 1.0))
    assertThrows[IllegalArgumentException](Names.legendJson("t", big))
  }

  test("floodBandaid restores NULL tiebreakdomainname for flooding frequency (R8)") {
    val att = SdvAttribute("Flooding Frequency Class", "comonth", "flodfreqcl",
      "rating", "Choice", "Dominant Condition")
    assert(SdvCatalog.floodBandaid(att).tiebreakdomainname
      === Some("flooding_frequency_class"))
    // already-populated domains are left alone
    val set = att.copy(tiebreakdomainname = Some("custom"))
    assert(SdvCatalog.floodBandaid(set).tiebreakdomainname === Some("custom"))
    // unrelated attributes untouched
    val other = SdvAttribute("AWS", "chorizon", "awc_r", "r", "Float", "Weighted Average")
    assert(SdvCatalog.floodBandaid(other).tiebreakdomainname === None)
  }

  test("floodBandaid de-parenthesizes the two broken whereclauses") {
    val att = SdvAttribute("EcoSiteNm", "coecoclass", "ecoclassname", "r",
      "String", "Dominant Component", sqlwhereclause = Some(
        "(coecoclass.ecoclasstypename = 'NRCS Rangeland Site' or coecoclass.ecoclasstypename = 'NRCS Forestland Site')"))
    assert(!SdvCatalog.floodBandaid(att).sqlwhereclause.get.contains("("))
    val dep = att.copy(sqlwhereclause = Some(
      "corestrictions.reskind IN ('Densic bedrock', 'Paralithic bedrock', 'Lithic bedrock')"))
    val got = SdvCatalog.floodBandaid(dep).sqlwhereclause.get
    assert(got.contains("= 'Densic bedrock' OR") && !got.contains("IN ("))
  }

  test("normalize uppercases the literal side of simple equality whereclauses (GetSDVAtts :3741-3764)") {
    val att = SdvAttribute("Hydric", "component", "comppct_r", "r",
      "Integer", "Percent Present",
      sqlwhereclause = Some("hydricrating = 'Yes'"))
    assert(SdvCatalog.normalize(att).sqlwhereclause
      === Some("upper(hydricrating) = 'YES'"))
    // non-simple clauses pass through
    val multi = att.copy(sqlwhereclause = Some("a = 'x' AND b = 'y'"))
    assert(SdvCatalog.normalize(multi).sqlwhereclause === Some("a = 'x' AND b = 'y'"))
    // blank clauses drop
    assert(SdvCatalog.normalize(att.copy(sqlwhereclause = Some("  ")))
      .sqlwhereclause === None)
  }
}
