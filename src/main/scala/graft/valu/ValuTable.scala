package graft.valu

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, least}

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
    * Mirrors the stage order of the reference main (:3083-3160).
    *
    * `major`/`earthy` must be evaluable on BOTH comp and hz (they gate
    * the sumPct tallies and the RZAWS component filter). `interp` must
    * already be restricted to major components (the NCCPI query table
    * J12 filters majcompflag='Yes', gSSURGO_ValuTable.py:2058-2069). */
  def build(
      base: DataFrame,
      hz: DataFrame,
      comp: DataFrame,
      major: Column, earthy: Column, organic: Column,
      restricted: Column,
      water: Column, hydric: Column,
      interp: DataFrame, nccpiRules: Seq[(String, String)],
      socSlices: Seq[(Int, Int)] = Valu.valu1Slices): DataFrame = {

    val cached = hz.cache()
    val gsum = Valu.sumPct(comp, major, earthy)
    // GetSumPct supplies musumcpct (all components, the table-creation
    // fill :611-625) and pctearthmc; musumcpcta/musumcpcts are NOT
    // GetSumPct values — the AWS and SOC passes write back their own
    // contributing-component pct sums (:1652-1656, :1871-1891).
    val sumpct = gsum.select(col("mukey"), col("musumcpct"), col("pctearthmc"))
    val rz = Valu.rzDepth(cached, restricted)
    val awsPct = Valu.contributingPct(cached,
      col("rating").isNotNull && col("hzdepb") > col("hzdept"), "musumcpcta")
    val socPct = Valu.contributingPct(
      cached.join(rz.select(col("cokey"), col("rzdepth")), Seq("cokey"), "left"),
      col("om").isNotNull && col("db3i").isNotNull &&
        least(col("hzdepb"), coalesce(col("rzdepth"), col("hzdepb"))) > col("hzdept"),
      "musumcpcts")
    val aws = Valu.calcAws(cached)
    // RZAWS runs over major-earthy components only (:1224-1227), with
    // GetSumPct's component-table pctearthmc as the mapunit divisor
    // (:1350/:1367) — drop the stage-local copy of the divisor column
    // to avoid a duplicate with the sumPct stage.
    val rzaws = Valu.rzAws(cached.filter(major && earthy), organic, rz,
        pct = gsum.select(col("mukey"), col("pctearthmc")))
      .drop("pctearthmc")
    // SOC stops at the root-zone restriction (:1765-1776)
    val soc = Valu.calcSoc(cached, socSlices, rz = Some(rz))
    // NCCPI divides by the ALL-MAJOR pct sum — dPct[mukey][2] per
    // GetSumPct's tuple order (gSSURGO_ValuTable.py:1956-1959, :2434;
    // the reference's inline "major-earthy" comment there is wrong)
    val nccpi = Valu.nccpi(interp, nccpiRules,
      denom = Some(gsum.select(col("mukey"), col("musumcpcta").as("sumpct"))))
    val pwsl = Valu.pwsl(comp, water, hydric)
    assemble(base, Seq(sumpct, awsPct, socPct, aws, rzaws, soc, nccpi, pwsl))
  }
}
