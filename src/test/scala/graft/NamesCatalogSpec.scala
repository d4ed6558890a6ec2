package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Names
import graft.schema.{SdvAttribute, SdvCatalog}

class NamesCatalogSpec extends AnyFunSuite {

  test("validateName sanitizes, squeezes underscores, guards leading digit") {
    assert(Names.validateName("AWS, 0-100 cm (weighted avg)") === "AWS_0_100_cm_weighted_avg")
    assert(Names.validateName("  2% slope!! ") === "z2_slope")
    assert(Names.validateName("a" * 100).length === 60)
  }

  test("inList quotes and escapes") {
    assert(Names.inList(Seq("a", "o'b")) === "('a', 'o''b')")
  }

  test("legendJson renders ordered class breaks and caps the blob") {
    val j = Names.legendJson("AWS", Seq(("Low", 0.0, 5.0), ("High", 5.0, 10.0)))
    assert(j === """{"title":"AWS","classes":[{"label":"Low","min":0.0,"max":5.0},{"label":"High","min":5.0,"max":10.0}]}""")
    val big = Seq.fill(2000)(("x" * 10, 0.0, 1.0))
    assertThrows[IllegalArgumentException](Names.legendJson("t", big))
  }

  test("floodBandaid restores the month flag on flooding/ponding (R8)") {
    val att = SdvAttribute("Flooding Frequency Class", "comonth", "flodfreqcl",
      "rating", "Choice", "Dominant Condition")
    assert(att.cmonthlevelattribflag === 0)
    assert(SdvCatalog.normalize(att).cmonthlevelattribflag === 1)
    val other = SdvAttribute("AWS", "chorizon", "awc_r", "r", "Float", "Weighted Average")
    assert(SdvCatalog.normalize(other).cmonthlevelattribflag === 0)
  }
}
