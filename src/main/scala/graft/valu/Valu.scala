package graft.valu

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Exprs

/** The Valu1 derived-table pipeline operators (SURVEY.md §2.5, V1–V14;
  * reference gSSURGO_ValuTable.py). All are expression-tree / two-level
  * aggregation shapes — no UDFs, no windows over the fact table.
  *
  * Determinism convention: constant divisors are factored OUT of the
  * aggregates (sum exact integral terms, divide once at the end), so the
  * results are bit-reproducible regardless of partitioning / summation
  * order — required both for the DuckDB oracle gate and for stable
  * results across cluster re-runs at scale.
  */
object Valu {

  private val m = col("mukey")

  // -------------------------------------------------------------------
  // V1 — GetSumPct (gSSURGO_ValuTable.py:1953-2013): per mapunit, the 4
  // comppct sums the pipeline normalizes by: all / major / earthy /
  // major+earthy components.
  def sumPct(comp: DataFrame, major: Column, earthy: Column): DataFrame =
    comp.groupBy(m).agg(
      coalesce(sum(col("comppct")), lit(0.0)).as("musumcpct"),
      coalesce(sum(when(major, col("comppct"))), lit(0.0)).as("musumcpcta"),
      coalesce(sum(when(earthy, col("comppct"))), lit(0.0)).as("musumcpcts"),
      coalesce(sum(when(major && earthy, col("comppct"))), lit(0.0)).as("pctearthmc"))

  /** Per-mapunit Σ comppct of the components that actually contributed
    * rows to a rated pass — what CalcAWS/CalcSOC write back as
    * MUSUMCPCTA / MUSUMCPCTS (gSSURGO_ValuTable.py:1652-1656 /
    * :1871-1891: dMu accumulates compPct once per contributing
    * component; the column keeps the LAST depth pass, 0-999 cm ≡ "has
    * any data"). Distinct (mukey, cokey) first so a component counts
    * once regardless of horizon count. */
  def contributingPct(hz: DataFrame, contributes: Column, as: String): DataFrame =
    hz.filter(contributes)
      .select(m, col("cokey"), col("comppct")).distinct()
      .groupBy(m).agg(sum(col("comppct")).as(as))

  // -------------------------------------------------------------------
  // V2+V3 — CalcAWS over the fixed depth-slice list
  // (gSSURGO_ValuTable.py:1481-1673, formula :1556; slice list :3092).
  // One pass, 2 columns per slice:
  //   aws{t}_{b}  = Σ comppct·overlap·awc / 10      (≡ Σ (pct/100)·ov·awc·10)
  //   tk{t}_{b}a  = Σ comppct·overlap / 100
  val valu1Slices: Seq[(Int, Int)] = Seq((0, 5), (5, 20), (20, 50), (50, 100),
    (100, 150), (150, 999), (0, 20), (0, 30), (0, 100), (0, 150), (0, 999))

  def calcAws(hz: DataFrame, slices: Seq[(Int, Int)] = valu1Slices, scale: Int = 4): DataFrame = {
    val rated = col("rating").isNotNull
    val aggs = slices.flatMap { case (t, b) =>
      val ov = Exprs.depthOverlap(col("hzdept"), col("hzdepb"), t, b)
      Seq(
        round(sum(when(rated, col("comppct") * ov * col("rating"))) / 10.0, scale)
          .as(s"aws${t}_$b"),
        round(sum(when(rated, col("comppct") * ov)) / 100.0, scale)
          .as(s"tk${t}_${b}a"))
    }
    hz.groupBy(m).agg(aggs.head, aggs.tail: _*)
  }

  // -------------------------------------------------------------------
  // V4 — CheckTexture (gSSURGO_ValuTable.py:741-818): organic-horizon
  // predicate. Histosols / histic subgroups are exempted (treated as
  // mineral); otherwise O/L master horizons, organic textures, or
  // organic in-lieu textures mark the horizon organic.
  val organicTextures: Seq[String] = Seq("MUCK", "PEAT", "MPT", "UDOM", "PDOM", "HPM", "MPM", "SPM")
  val organicLieutex: Seq[String] = Seq("PEAT", "MUCK", "MUCKY PEAT", "PEATY MUCK",
    "COPROGENOUS EARTH", "DIATOMACEOUS EARTH", "UNDECOMPOSED ORGANIC MATTER",
    "PARTIALLY DECOMPOSED ORGANIC MATTER", "MODERATELY DECOMPOSED PLANT MATERIAL",
    "SLIGHTLY DECOMPOSED PLANT MATERIAL", "HIGHLY DECOMPOSED PLANT MATERIAL")

  def isOrganic(taxorder: Column, taxsubgrp: Column, desgnmaster: Column,
      texture: Column, lieutex: Column): Column = {
    val histic = upper(taxorder) === "HISTOSOLS" ||
      instr(lower(taxsubgrp), "histic") > 0
    val organic = upper(desgnmaster).isin("O", "L") ||
      upper(texture).isin(organicTextures: _*) ||
      upper(lieutex).isin(organicLieutex: _*)
    when(histic, lit(false)).otherwise(coalesce(organic, lit(false)))
  }

  // -------------------------------------------------------------------
  // V5 — CheckBulkDensity (gSSURGO_ValuTable.py:820-893, formula
  // :869-871): "dense layer" test. A missing one of sand/silt/clay is
  // filled so the three sum to 100.
  def isDense(sand: Column, silt: Column, clay: Column, bd: Column): Column = {
    val s = coalesce(sand, lit(100.0) - silt - clay)
    val si = coalesce(silt, lit(100.0) - sand - clay)
    val cl = coalesce(clay, lit(100.0) - sand - silt)
    (bd - (lit(1.65) * s + lit(1.30) * si + lit(1.25) * cl) / 100.0) >
      (lit(0.002081) * s + lit(0.003912) * si + lit(0.0024351) * cl)
  }

  // -------------------------------------------------------------------
  // V6 — CalcRZDepth (gSSURGO_ValuTable.py:895-1103): per component, the
  // depth of the first (shallowest) restrictive horizon within maxD cm,
  // defaulting to maxD. The `restricted` predicate must encode the
  // reference's guards (:1006-1037): organic horizons skip every
  // horizon-property check; pH ≤ 3.5 only for non-Histosol/non-histic;
  // EC ≥ 16; dense layer per isDense. The top-down walk-stop equals
  // min-over-flagged because the first restriction hit is the
  // shallowest.
  def rzDepth(hz: DataFrame, restricted: Column, maxD: Int = 150): DataFrame =
    hz.groupBy(m, col("cokey"), col("comppct"))
      .agg(coalesce(min(when(restricted && col("hzdept") < maxD, col("hzdept"))),
        lit(maxD.toDouble)).as("rzdepth"))

  // -------------------------------------------------------------------
  // V7 — GetCoRestrictions (gSSURGO_ValuTable.py:1106-1148): shallowest
  // restriction depth per component for a reskind set.
  def coRestrictions(cr: DataFrame, kinds: Seq[String]): DataFrame =
    cr.filter(col("reskind").isin(kinds: _*))
      .groupBy(col("cokey")).agg(min(col("resdept")).as("resdept"))

  /** V6+V7 combined — the effective root-zone depth is the least of the
    * horizon-rule depth (rzDepth) and the tabulated corestriction depth
    * (the reference checks both within CalcRZDepth, :964-1060). */
  def rzDepthWithRestrictions(hz: DataFrame, restricted: Column,
      coRes: DataFrame, maxD: Int = 150): DataFrame =
    rzDepth(hz, restricted, maxD)
      .join(coRes, Seq("cokey"), "left")
      .select(col("mukey"), col("cokey"), col("comppct"),
        least(col("rzdepth"),
          coalesce(col("resdept"), lit(maxD.toDouble))).as("rzdepth"))

  // -------------------------------------------------------------------
  // V8 — CalcRZAWS (gSSURGO_ValuTable.py:1150-1479): root-zone AWS.
  // Surface organic horizons are skipped until the first mineral horizon
  // (buried organics below it count); each horizon contributes
  // thickness between greatest(hzdept, firstMineral) and
  // least(hzdepb, rzdepth) times awc; mapunit = pct-weighted rollup;
  // droughty = round(rootznaws, 0) <= 152 (:1433-1440 — the reference
  // rounds to an integer BEFORE comparing, so 152.0 < x < 152.5 is
  // still droughty).
  // `hz` should be pre-filtered to major-earthy components (:1246);
  // `rz` = (cokey, rzdepth) from rzDepth over the full horizon table.
  // Also emits, per mapunit (the Valu1 columns written alongside
  // rootznaws, :1386-1434):
  //   rootznemc  = pct-weighted mean usable root-zone thickness,
  //                capped at 150 then rounded to an integer (:1428-1434;
  //                thickness counts even where awc is null — the
  //                reference zero-fills awc but still adds hzT, :1263)
  //   pctearthmc = the major-earthy comppct sum used as the divisor —
  //                from the COMPONENT table (GetSumPct's dPct[mukey][1],
  //                :1350/:1367), NOT the components present in the
  //                horizon table: a major-earthy component with zero
  //                horizon rows dilutes the mapunit mean. `pct` =
  //                (mukey, pctearthmc), e.g. from [[sumPct]].
  //                pctearthmc = 0 leaves the RZAWS columns null
  //                (:1362 `if pctearthmc > 0`).
  def rzAws(hz: DataFrame, organic: Column, rz: DataFrame, pct: DataFrame,
      scale: Int = 4): DataFrame = {
    val fm = hz.groupBy(col("cokey"))
      .agg(coalesce(min(when(!organic, col("hzdept"))), lit(999.0)).as("fmdept"))
    val t = greatest(lit(0.0),
      least(col("hzdepb"), col("rzdepth")) - greatest(col("hzdept"), col("fmdept")))
    val perCo = hz.join(fm, "cokey").join(rz.select("cokey", "rzdepth"), "cokey")
      .groupBy(m, col("cokey"), col("comppct"))
      .agg(sum(when(col("rating").isNotNull, t * col("rating"))).as("awsum"),
        sum(t).as("hzt"))
    val pos = col("pctearthmc") > 0
    perCo.groupBy(m).agg(
        sum(col("comppct") * col("awsum")).as("wsum"),
        sum(col("comppct") * col("hzt")).as("hsum"))
      .join(pct.select(m, col("pctearthmc")), Seq("mukey"), "left")
      .select(m,
        when(pos, Exprs.roundHalfUp(col("wsum") / col("pctearthmc") / 10.0, scale))
          .as("rootznaws"),
        when(pos, Exprs.roundHalfUp(
          least(col("hsum") / col("pctearthmc"), lit(150.0)), 0)).as("rootznemc"),
        col("pctearthmc"))
      .withColumn("droughty", Exprs.roundHalfUp(col("rootznaws"), 0) <= 152)
  }

  // -------------------------------------------------------------------
  // V9 — GetFragVol (gSSURGO_ValuTable.py:1910-1951): per horizon, Σ
  // fragment volume clamped to [0,100].
  def fragVol(frags: DataFrame): DataFrame =
    frags.groupBy(col("chkey"))
      .agg(least(sum(greatest(col("fragvol"), lit(0.0))), lit(100.0)).as("fragvol"))

  // -------------------------------------------------------------------
  // V10 — CalcSOC (gSSURGO_ValuTable.py:1675-1908, formula :1793):
  // soc = hzT·(om/1.724·db3)/100·((100−fragvol)/100)·(comppct·100),
  // summed component→mapunit per slice. SOC is never counted below the
  // component's root-zone restriction: each horizon's effective bottom
  // is min(hzdepb, restriction depth) (:1765-1776 `cBot = min(rz,
  // bot)`). Pass `rz` = (cokey, rzdepth) to engage the cap. db3i =
  // bulk density in decigrams (10·db3) keeps every term integral; the
  // single constant divisor 1.724·10·100·100/100 = 1724 is applied
  // after the sum.
  // Each slice also emits tk{t}_{b}s — the comppct-weighted counted
  // thickness Σ(hzT·comppct)/100 (:1855-1857 `hzT·compPct/100`, mapunit
  // sum :1871-1891) — under the same om AND db3 non-null gate as the
  // SOC term itself (:1752).
  def calcSoc(hz: DataFrame, slices: Seq[(Int, Int)] = valu1Slices,
      rz: Option[DataFrame] = None, scale: Int = 4): DataFrame = {
    val capped = rz match {
      case Some(r) => hz.join(r.select(col("cokey"), col("rzdepth")), Seq("cokey"), "left")
        .withColumn("hzdepb", least(col("hzdepb"),
          coalesce(col("rzdepth"), col("hzdepb"))))
      case None => hz
    }
    val rated = col("om").isNotNull && col("db3i").isNotNull
    val aggs = slices.flatMap { case (t, b) =>
      val ov = Exprs.depthOverlap(col("hzdept"), col("hzdepb"), t, b)
      val term = ov * col("om") * col("db3i") * (lit(100.0) - col("fragvol")) * col("comppct")
      Seq(
        Exprs.roundHalfUp(sum(when(rated, term)) / 1724.0, scale).as(s"soc${t}_$b"),
        round(sum(when(rated, ov * col("comppct"))) / 100.0, scale).as(s"tk${t}_${b}s"))
    }
    capped.groupBy(m).agg(aggs.head, aggs.tail: _*)
  }

  // -------------------------------------------------------------------
  // V12 — CalcNCCPI2/3 (gSSURGO_ValuTable.py:2097-2477): per mapunit,
  // Σ(fuzzy·comppct) per rule ÷ the ALL-MAJOR pct sum (divide :2434:
  // `sumPct = dPct[mukey][2]`, which per GetSumPct's tuple order
  // :1956-1959 is the all-major sum — musumcpcta here; the reference's
  // own inline "major-earthy" comment at :2434 is wrong). Pivoted to
  // one fixed column per submodel rule (accum :2347-2399). Pass
  // `denom` = (mukey, sumpct) for the faithful divisor; the default
  // falls back to the pct sum of the distinct components present in
  // the interp table (equal whenever every major component has interp
  // rows). `fuzzy` is in exact 1e-4 units (cents of a percent); the
  // /10000 rescale happens after the division.
  /** The rule→column sets of the two published NCCPI model versions.
    * V2 (CalcNCCPI2, gSSURGO_ValuTable.py:2097-2280): corn+soybeans
    * combined (cs), small grains (sg), cotton (co), overall (the
    * ruledepth-0 main rule row → all). V3 (CalcNCCPI3, :2282-2477):
    * corn / soy / cotton / small grains / overall. */
  val nccpi2Rules: Seq[(String, String)] = Seq(
    "NCCPI - NCCPI Corn and Soybeans Submodel (II)" -> "nccpi2cs",
    "NCCPI - NCCPI Small Grains Submodel (II)" -> "nccpi2sg",
    "NCCPI - NCCPI Cotton Submodel (II)" -> "nccpi2co",
    "NCCPI - National Commodity Crop Productivity Index (Ver 2.0)" -> "nccpi2all")
  val nccpi3Rules: Seq[(String, String)] = Seq(
    "NCCPI - NCCPI Corn Submodel (I)" -> "nccpi3corn",
    "NCCPI - NCCPI Soybeans Submodel (I)" -> "nccpi3soy",
    "NCCPI - NCCPI Cotton Submodel (II)" -> "nccpi3cot",
    "NCCPI - NCCPI Small Grains Submodel (II)" -> "nccpi3sg",
    "NCCPI - National Commodity Crop Productivity Index (Ver 3.0)" -> "nccpi3all")

  /** NCCPI version sniff (gSSURGO_ValuTable.py:3040-3050): among the
    * distinct NCCPI main-rule names present in the interp metadata,
    * prefer Ver 3.0, else fall back to Ver 2.0. */
  def detectNccpiRules(ruleNames: Seq[String]): Seq[(String, String)] =
    if (ruleNames.exists(_.contains("(Ver 3.0)"))) nccpi3Rules else nccpi2Rules

  /** DataFrame overload: sniff from a rule-name column (distinterpmd /
    * sdvattribute.nasisrulename). A driver-side metadata lookup — the
    * same tiny dict the reference materializes (:3030-3050). */
  def detectNccpiRules(meta: DataFrame, ruleCol: String): Seq[(String, String)] =
    detectNccpiRules(
      meta.select(col(ruleCol)).distinct().collect().map(_.getString(0)).toSeq
        .filter(_ != null))

  def nccpi(interp: DataFrame, rules: Seq[(String, String)],
      denom: Option[DataFrame] = None, scale: Int = 6): DataFrame = {
    val den = denom.getOrElse(
      interp.select(m, col("cokey"), col("comppct")).distinct()
        .groupBy(m).agg(sum(col("comppct")).as("sumpct")))
    val numAggs = rules.map { case (r, c) =>
      sum(when(col("rule") === r, col("fuzzy") * col("comppct"))).as(s"num_$c")
    }
    val num = interp.groupBy(m).agg(numAggs.head, numAggs.tail: _*)
    // zero divisor pct → null rating (the reference skips the row,
    // :2456 "Miscellaneous map unit encountered"). Rounding is
    // floor(x·10^s + 0.5)/10^s rather than round(): the ratio of exact
    // integer sums is bit-identical in any engine, but engines round
    // the SAME double differently at a decimal .5 boundary (Spark goes
    // through BigDecimal's exact decimal expansion, DuckDB through
    // scaled-double math — observed one flipped 6th decimal at sf0.1);
    // the floor form is plain double arithmetic and matches anywhere.
    val p = math.pow(10, scale)
    num.join(den, "mukey").select(
      m +: rules.map { case (_, c) =>
        (floor(when(col("sumpct") > 0, col(s"num_$c") / col("sumpct") / 10000.0) * p + 0.5) / p).as(c)
      }: _*)
  }

  // -------------------------------------------------------------------
  // V13 — CalcPWSL (gSSURGO_ValuTable.py:2479-2664): potential wet soil
  // landscape. A SINGLE water-named component with comppct >= 80 flags
  // the mapunit 999 (:2537-2545); otherwise the rating is Σ comppct of
  // water components (any pct, :2552-2557) plus hydric-criteria
  // components (hydricrating/drainage/phase rules, :2559-2620 —
  // `hydric` must encode them, including the hydricrating='No'
  // exclusion).
  def pwsl(comp: DataFrame, water: Column, hydric: Column): DataFrame =
    comp.groupBy(m).agg(
      max(when(water && col("comppct") >= 80, lit(1)).otherwise(lit(0))).as("iswater"),
      sum(when(water || hydric, col("comppct"))).as("critpct"))
      .select(m,
        when(col("iswater") === 1, lit(999.0))
          .otherwise(coalesce(col("critpct"), lit(0.0))).as("pwsl1pomu"))
}
