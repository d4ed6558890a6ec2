package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.valu.ValuTable

/** buildFused is a plan refactor, not a semantics change: on the full
  * analog inputs (the v14/st04 data path) it must produce exactly the
  * rows build() produces — same columns, same values, same nulls. */
class ValuFusedSpec extends AnyFunSuite {
  import TestSpark._

  test("buildFused == build on the sf0.001 analog (full-row equality)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val nccpiRules = Seq("corn" -> "nccpi_corn", "soy" -> "nccpi_soy",
      "cotton" -> "nccpi_cotton")
    val h = graft.analog.Analog.hz(s, dir).select(col("mukey"), col("cokey"),
      col("comppct"), col("hzdept"), col("hzdepb"), col("rating"), col("crating"),
      col("rating").as("om"), (col("cokey") % 5 + 10).cast("double").as("db3i"),
      col("comppct").as("fragvol"))
    val base = Tables.load(s, dir, "customer").select(col("c_custkey").as("mukey"))
    val cmp = h.groupBy(col("mukey"), col("cokey"), col("comppct"))
      .agg(max(col("crating")).as("crating"))
    val interp = h.filter(col("crating") =!= "N")
      .select(col("mukey"), col("cokey"), col("comppct"),
        when(col("hzdept") === 0, "corn").when(col("hzdept") === 30, "soy")
          .otherwise("cotton").as("rule"),
        (col("rating") * 1000).as("fuzzy"))
    def run(f: ValuTable.type => (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, org.apache.spark.sql.Column,
        org.apache.spark.sql.DataFrame, Seq[(String, String)],
        Seq[(Int, Int)]) => org.apache.spark.sql.DataFrame) =
      f(ValuTable)(base, h, cmp,
        col("crating") =!= "N", col("comppct") >= 10, col("crating") === "A",
        col("rating") >= 8, col("crating") === "N", col("comppct") >= 40,
        interp, nccpiRules, graft.valu.Valu.valu1Slices)
    val a = run(_.build)
    val b = run(_.buildFused)
    assert(a.columns.sorted.toSeq === b.columns.sorted.toSeq)
    val bb = b.select(a.columns.map(col): _*)
    assert(a.count() === bb.count())
    assert(a.exceptAll(bb).count() === 0)
    assert(bb.exceptAll(a).count() === 0)
  }
}
