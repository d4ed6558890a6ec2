package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.valu.Valu

/** Fixtures pinning the Valu1 pipeline predicates and rollups
  * (gSSURGO_ValuTable.py; FIXTURES.md scenarios). */
class ValuSpec extends AnyFunSuite {
  import TestSpark._

  private val hzTax = StructType(Seq(
    StructField("taxorder", StringType), StructField("taxsubgrp", StringType),
    StructField("desgnmaster", StringType), StructField("texture", StringType),
    StructField("lieutex", StringType)))

  test("V4 organic: O-horizon organic, Histosol/histic exempted (gSSURGO_ValuTable.py:741-818)") {
    val d = df(hzTax, Seq(
      Row("Alfisols", "Typic Hapludalfs", "O", "SL", null), // O → organic
      Row("Histosols", "Typic Haplosaprists", "O", "MUCK", null), // Histosol → mineral
      Row("Alfisols", "Histic Humaquepts", "O", "PEAT", null), // histic → mineral
      Row("Alfisols", "Typic Hapludalfs", "B", "MUCK", null), // muck texture → organic
      Row("Alfisols", "Typic Hapludalfs", "B", "SL", "Peat"), // lieutex → organic
      Row("Alfisols", "Typic Hapludalfs", "B", "SL", null))) // mineral
    val got = d.select(Valu.isOrganic(col("taxorder"), col("taxsubgrp"),
      col("desgnmaster"), col("texture"), col("lieutex")).as("o"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(true, false, false, true, true, false))
  }

  test("V5 dense layer: bd 1.8 at sand/silt/clay 40/40/20 is dense; bd 1.2 is not (:869-871)") {
    val s = StructType(Seq(StructField("sand", DoubleType), StructField("silt", DoubleType),
      StructField("clay", DoubleType), StructField("bd", DoubleType)))
    val d = df(s, Seq(Row(40.0, 40.0, 20.0, 1.8), Row(40.0, 40.0, 20.0, 1.2)))
    val got = d.select(Valu.isDense(col("sand"), col("silt"), col("clay"), col("bd")))
      .collect().map(_.getBoolean(0)).toSeq
    // threshold at 40/40/20: (1.65*40+1.30*40+1.25*20)/100 = 1.43;
    // rhs = 0.002081*40+0.003912*40+0.0024351*20 = 0.2884902
    // dense iff bd > 1.7184902
    assert(got === Seq(true, false))
  }

  test("V5 dense layer: missing clay filled to 100 (:820-868)") {
    val s = StructType(Seq(StructField("sand", DoubleType), StructField("silt", DoubleType),
      StructField("clay", DoubleType), StructField("bd", DoubleType)))
    val d = df(s, Seq(Row(40.0, 40.0, null, 1.8)))
    // clay filled to 20 → same as previous dense case
    assert(d.select(Valu.isDense(col("sand"), col("silt"), col("clay"), col("bd")))
      .collect()(0).getBoolean(0))
  }

  private val hzNum = StructType(Seq(
    StructField("mukey", StringType), StructField("cokey", LongType),
    StructField("comppct", DoubleType), StructField("hzdept", DoubleType),
    StructField("hzdepb", DoubleType), StructField("rating", DoubleType),
    StructField("organic", BooleanType)))

  test("V6 rz depth: first restricted horizon caps the root zone at its top (:895-1103)") {
    val d = df(hzNum, Seq(
      Row("m1", 1L, 100.0, 0.0, 50.0, 1.0, false),
      Row("m1", 1L, 100.0, 50.0, 100.0, 9.0, false), // restricted
      Row("m1", 2L, 100.0, 0.0, 200.0, 1.0, false))) // none → default 150
    val got = rowsOf(Valu.rzDepth(d, restricted = col("rating") >= 8)
      .select(col("cokey"), col("rzdepth")))
    assert(got === Seq(Seq(1L, 50.0), Seq(2L, 150.0)))
  }

  test("V8 RZAWS: surface organic skipped, buried organic counts (:1150-1479)") {
    // comp 1: organic 0-20 (skipped), mineral 20-100 awc .10,
    //         organic 100-120 (buried → counts) awc .20
    val d = df(hzNum, Seq(
      Row("m1", 1L, 100.0, 0.0, 20.0, 0.30, true),
      Row("m1", 1L, 100.0, 20.0, 100.0, 0.10, false),
      Row("m1", 1L, 100.0, 100.0, 120.0, 0.20, true)))
    val rz = Valu.rzDepth(d, restricted = lit(false)) // no restriction → 150
    val pct = d.select(col("mukey"), col("cokey"), col("comppct")).distinct()
      .groupBy(col("mukey")).agg(sum(col("comppct")).as("pctearthmc"))
    val out = Valu.rzAws(d, organic = col("organic"), rz = rz, pct = pct)
    val got = out.collect()(0)
    def at(name: String) = got.get(out.columns.indexOf(name))
    // aws = (80*.10 + 20*.20)*10/10 ... rzAws: sum(t*rating)/pct-weight/10
    // = (80*0.1 + 20*0.2) = 12 → /10? formula: Σ(pct*awsum)/Σpct/10
    // = (100*12)/100/10 = 1.2
    assert(at("rootznaws") === 1.2)
    assert(at("droughty") === true) // droughty: 1.2 <= 152
    // usable thickness: 0 (surface organic) + 80 + 20 (buried organic)
    assert(at("rootznemc") === 100.0)
    assert(at("pctearthmc") === 100.0)
  }

  test("V8 RZAWS divisor: a major-earthy component with ZERO horizon rows dilutes the mean (:1350/:1367)") {
    // comp 1 (pct 100) has horizons; comp 2 (pct 100) is major-earthy in
    // the COMPONENT table but has no horizon rows — the reference's
    // GetSumPct divisor (200) must halve every mapunit value vs a
    // horizon-present divisor (100)
    val d = df(hzNum, Seq(
      Row("m1", 1L, 100.0, 0.0, 100.0, 0.10, false)))
    val rz = Valu.rzDepth(d, restricted = lit(false))
    val pct = df(
      StructType(Seq(StructField("mukey", StringType),
        StructField("pctearthmc", DoubleType))),
      Seq(Row("m1", 200.0)))
    val out = Valu.rzAws(d, organic = col("organic"), rz = rz, pct = pct)
    val got = out.collect()(0)
    def at(name: String) = got.get(out.columns.indexOf(name))
    // wsum = 100·(100·0.1) = 1000 → /200/10 = 0.5 ; hzT: 100·100/200 = 50
    assert(at("rootznaws") === 0.5)
    assert(at("rootznemc") === 50.0)
    assert(at("pctearthmc") === 200.0)
  }

  test("V9 fragvol: negatives clamped, sum capped at 100 (:1910-1951)") {
    val s = StructType(Seq(StructField("chkey", StringType), StructField("fragvol", DoubleType)))
    val d = df(s, Seq(Row("h1", 60.0), Row("h1", 70.0), Row("h2", -5.0), Row("h2", 30.0)))
    val got = rowsOf(Valu.fragVol(d))
    assert(got === Seq(Seq("h1", 100.0), Seq("h2", 30.0)))
  }

  test("V13 PWSL: a single water comp >= 80% flags 999; lesser water comps count toward the sum (:2537-2557)") {
    val s = StructType(Seq(StructField("mukey", StringType), StructField("cokey", LongType),
      StructField("comppct", DoubleType), StructField("water", BooleanType),
      StructField("hydric", BooleanType)))
    val d = df(s, Seq(
      Row("m1", 1L, 85.0, true, false), Row("m1", 2L, 15.0, false, true),
      // two water comps 50+40: no single one >= 80 → NOT 999; both count
      Row("m2", 3L, 30.0, true, false), Row("m2", 4L, 40.0, false, true),
      Row("m3", 5L, 50.0, true, false), Row("m3", 6L, 40.0, true, false)))
    val got = rowsOf(Valu.pwsl(d, water = col("water"), hydric = col("hydric")))
    assert(got === Seq(Seq("m1", 999.0), Seq("m2", 70.0), Seq("m3", 90.0)))
  }

  test("V10 SOC: restriction depth caps the counted thickness (:1765-1776)") {
    val s = StructType(Seq(StructField("mukey", StringType), StructField("cokey", StringType),
      StructField("comppct", DoubleType), StructField("hzdept", DoubleType),
      StructField("hzdepb", DoubleType), StructField("om", DoubleType),
      StructField("db3i", DoubleType), StructField("fragvol", DoubleType)))
    val hz = df(s, Seq(Row("m1", "c1", 100.0, 0.0, 100.0, 2.0, 13.0, 0.0)))
    val rzS = StructType(Seq(StructField("cokey", StringType), StructField("rzdepth", DoubleType)))
    val rz = df(rzS, Seq(Row("c1", 50.0)))
    val free = Valu.calcSoc(hz, Seq((0, 100))).collect()(0).getDouble(1)
    val capped = Valu.calcSoc(hz, Seq((0, 100)), rz = Some(rz)).collect()(0).getDouble(1)
    // capping at 50cm halves the counted thickness (tolerance for the
    // scale-4 output rounding)
    assert(math.abs(capped - free / 2) < 0.001, s"capped=$capped free=$free")
  }

  test("V1 sum pct: four conditional sums (:1953-2013)") {
    val s = StructType(Seq(StructField("mukey", StringType), StructField("comppct", DoubleType),
      StructField("major", BooleanType), StructField("earthy", BooleanType)))
    val d = df(s, Seq(Row("m1", 50.0, true, true), Row("m1", 30.0, true, false),
      Row("m1", 20.0, false, true)))
    val got = Valu.sumPct(d, col("major"), col("earthy")).collect()(0)
    assert(got.getDouble(1) === 100.0) // all
    assert(got.getDouble(2) === 80.0)  // major
    assert(got.getDouble(3) === 70.0)  // earthy
    assert(got.getDouble(4) === 50.0)  // major & earthy
  }

  test("V12 NCCPI version sniff prefers Ver 3.0, else 2.0 (gSSURGO_ValuTable.py:3040-3050)") {
    val v3 = Seq("NCCPI - National Commodity Crop Productivity Index (Ver 3.0)",
      "NCCPI - NCCPI Corn Submodel (I)")
    val v2 = Seq("NCCPI - National Commodity Crop Productivity Index (Ver 2.0)")
    assert(Valu.detectNccpiRules(v3) === Valu.nccpi3Rules)
    assert(Valu.detectNccpiRules(v2) === Valu.nccpi2Rules)
    assert(Valu.detectNccpiRules(v2 ++ v3) === Valu.nccpi3Rules) // both present → v3
    // DataFrame overload: sniff from a metadata rule-name column
    val s = StructType(Seq(StructField("nasisrulename", StringType)))
    val meta = df(s, (v2 ++ v3).map(Row(_)))
    assert(Valu.detectNccpiRules(meta, "nasisrulename") === Valu.nccpi3Rules)
  }
}
