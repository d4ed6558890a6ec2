package graft.valu

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** V14 — CreateValuTable (gSSURGO_ValuTable.py:2992-3271): the Valu1
  * assembly DAG. Each Calc* stage is an independent aggregation over the
  * shared horizon query table; results join wide on mukey. The reference
  * re-scans its materialized QueryTable_HZ per stage with its own
  * cursor sort (:3083-3160); here the stages are lazy plans over one
  * cached DataFrame and Catalyst/AQE handle the rest. */
object ValuTable {

  /** Assemble the wide Valu1 table from the stage outputs. `base` is the
    * mapunit key universe; every stage joins left so mapunits missing a
    * stage keep nulls (the reference's pre-created output table rows). */
  def assemble(base: DataFrame, stages: Seq[DataFrame]): DataFrame =
    stages.foldLeft(base)((acc, s) => acc.join(s, Seq("mukey"), "left"))

  /** The full pipeline over a standardized horizon table (columns:
    * mukey, cokey, comppct, hzdept, hzdepb, rating=awc, om, db3i,
    * fragvol) + component table (mukey, cokey, comppct + flag columns).
    * Mirrors the stage order of the reference main (:3083-3160). */
  def build(
      base: DataFrame,
      hz: DataFrame,
      comp: DataFrame,
      major: Column, earthy: Column, organic: Column,
      restricted: Column,
      water: Column, hydric: Column,
      interp: DataFrame, nccpiRules: Seq[(String, String)],
      socSlices: Seq[(Int, Int)] = Seq((0, 30), (0, 100), (0, 999))): DataFrame = {

    val cached = hz.cache()
    val sumpct = Valu.sumPct(comp, major, earthy)
    val aws = Valu.calcAws(cached)
    val rz = Valu.rzDepth(cached, restricted)
    val rzaws = Valu.rzAws(cached, organic, rz)
    val soc = Valu.calcSoc(cached, socSlices)
    // NCCPI divides by the major-earthy pct sum from GetSumPct
    // (gSSURGO_ValuTable.py:2434)
    val nccpi = Valu.nccpi(interp, nccpiRules,
      denom = Some(sumpct.select(col("mukey"), col("pctearthmc").as("sumpct"))))
    val pwsl = Valu.pwsl(comp, water, hydric)
    assemble(base, Seq(sumpct, aws, rzaws, soc, nccpi, pwsl))
  }
}
