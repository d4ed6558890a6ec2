package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.analog.Analog._
import graft.analog.OracleSql
import graft.core.Exprs
import graft.valu.Valu

/** The Valu1 derived-table pipeline operators (SURVEY.md §2.5, V1–V13)
  * over the analog tables. The real-SSURGO column semantics are pinned
  * by the ScalaTest fixtures; here the same library code runs against
  * analog-mapped inputs with a DuckDB oracle. */
object ValuQueries extends QuerySet {

  private val socSlices = Seq((0, 5), (0, 30), (0, 100), (0, 999))

  val all: Seq[Q] = Seq(

    // V1 — GetSumPct (gSSURGO_ValuTable.py:1953-2013).
    Q("v01_sum_pct",
      (s, dir) => Valu.sumPct(comp(s, dir),
        major = col("crating") =!= "N", earthy = col("comppct") >= 10),
      Some(withCtes(
        """SELECT mukey,
          |  coalesce(sum(comppct), 0.0) AS musumcpct,
          |  coalesce(sum(CASE WHEN crating <> 'N' THEN comppct END), 0.0) AS musumcpcta,
          |  coalesce(sum(CASE WHEN comppct >= 10 THEN comppct END), 0.0) AS musumcpcts,
          |  coalesce(sum(CASE WHEN crating <> 'N' AND comppct >= 10 THEN comppct END), 0.0) AS pctearthmc
          |FROM comp GROUP BY mukey""".stripMargin, compCte))),

    // V2+V3 — CalcAWS over the 11 fixed Valu1 depth slices
    // (gSSURGO_ValuTable.py:1481-1673, :3092): one pass, 22 columns.
    Q("v03_calc_aws", (s, dir) => Valu.calcAws(hzNumeric(s, dir)), {
      val cols = Valu.valu1Slices.flatMap { case (t, b) =>
        val ov = OracleSql.ovExpr(t, b)
        Seq(
          s"round(sum(CASE WHEN rating IS NOT NULL THEN comppct*$ov*rating END)/10.0, 4) AS aws${t}_$b",
          s"round(sum(CASE WHEN rating IS NOT NULL THEN comppct*$ov END)/100.0, 4) AS tk${t}_${b}a")
      }
      Some(withCtes(
        s"SELECT mukey,\n  ${cols.mkString(",\n  ")}\nFROM hz GROUP BY mukey", hzCte))
    }),

    // V15 — long-format presentation of the 11 AWS depth slices:
    // Dataset.unpivot (melt) of the V3 wide table — the inverse of the
    // a24 pivot, a per-row expression expansion with no extra shuffle
    // (nulls preserved on both sides; the oracle is the explicit
    // UNION ALL unpivot).
    Q("v15_valu_unpivot",
      (s, dir) => {
        val awsCols = Valu.valu1Slices.map { case (t, b) => s"aws${t}_$b" }
        Valu.calcAws(hzNumeric(s, dir))
          .select(("mukey" +: awsCols).map(col): _*)
          .unpivot(Array(col("mukey")), awsCols.map(col).toArray,
            "depth_slice", "aws")
      }, {
      val wideCols = Valu.valu1Slices.map { case (t, b) =>
        val ov = OracleSql.ovExpr(t, b)
        s"round(sum(CASE WHEN rating IS NOT NULL THEN comppct*$ov*rating END)/10.0, 4) AS aws${t}_$b"
      }
      val parts = Valu.valu1Slices.map { case (t, b) =>
        s"SELECT mukey, 'aws${t}_$b' AS depth_slice, aws${t}_$b AS aws FROM w"
      }
      Some(withCtes(parts.mkString("\nUNION ALL\n"), hzCte,
        s"w AS (SELECT mukey,\n  ${wideCols.mkString(",\n  ")}\nFROM hz GROUP BY mukey)"))
    }),

    // V4 — CheckTexture organic-horizon predicate
    // (gSSURGO_ValuTable.py:741-818), run through the real rule set with
    // analog-mapped taxonomy/texture columns.
    Q("v04_organic_flag",
      (s, dir) => hz(s, dir).select(col("cokey"), col("hzdept"),
        Valu.isOrganic(
          taxorder = when(col("crating") === "A", "Histosols").otherwise("Alfisols"),
          taxsubgrp = when(col("rating") >= 9, "Histic Humaquepts").otherwise("Typic Hapludolls"),
          desgnmaster = when(col("rating") >= 8, "O").otherwise("B"),
          texture = when(col("rating") === 7, "MUCK").otherwise("SL"),
          lieutex = when(col("rating") === 6, "Peat").otherwise("Silt loam")).as("organic")),
      Some(withCtes(
        """SELECT cokey, hzdept,
          |  CASE WHEN crating = 'A' OR rating >= 9 THEN false
          |       ELSE (rating >= 8 OR rating = 7 OR rating = 6) END AS organic
          |FROM hz""".stripMargin, hzCte))),

    // V5 — CheckBulkDensity dense-layer predicate
    // (gSSURGO_ValuTable.py:820-893, formula :869-871).
    Q("v05_dense_layer",
      (s, dir) => hz(s, dir).select(col("cokey"), col("hzdept"),
        Valu.isDense(
          sand = col("comppct"),
          silt = col("rating") * 5,
          clay = greatest(lit(0.0), lit(100.0) - col("comppct") - col("rating") * 5),
          bd = lit(1.0) + col("rating") / 10.0).as("dense")),
      Some(withCtes(
        """SELECT cokey, hzdept,
          |  ((1.0 + rating/10.0)
          |    - (1.65*comppct + 1.30*(rating*5) + 1.25*greatest(0.0, 100.0-comppct-rating*5))/100.0)
          |  > (0.002081*comppct + 0.003912*(rating*5)
          |     + 0.0024351*greatest(0.0, 100.0-comppct-rating*5)) AS dense
          |FROM hz""".stripMargin, hzCte))),

    // V6 — CalcRZDepth (gSSURGO_ValuTable.py:895-1103): first restrictive
    // depth per component, default/cap 150.
    Q("v06_rz_depth",
      (s, dir) => Valu.rzDepth(hzNumeric(s, dir), restricted = col("rating") >= 8)
        .select("mukey", "cokey", "rzdepth"),
      Some(withCtes(
        """SELECT mukey, cokey,
          |  coalesce(min(CASE WHEN rating >= 8 AND hzdept < 150 THEN hzdept END), 150.0) AS rzdepth
          |FROM hz GROUP BY mukey, cokey""".stripMargin, hzCte))),

    // V7 — GetCoRestrictions (gSSURGO_ValuTable.py:1106-1148).
    Q("v07_co_restrictions",
      (s, dir) => Valu.coRestrictions(
        comp(s, dir).filter(col("crating") === "R").select(col("cokey"),
          when(col("comppct") >= 50, "Lithic bedrock")
            .when(col("comppct") >= 25, "Fragipan")
            .otherwise("Other").as("reskind"),
          col("comppct").as("resdept")),
        kinds = Seq("Lithic bedrock", "Fragipan")),
      Some(withCtes(
        """SELECT cokey, min(resdept) AS resdept FROM (
          |  SELECT cokey,
          |         CASE WHEN comppct >= 50 THEN 'Lithic bedrock'
          |              WHEN comppct >= 25 THEN 'Fragipan'
          |              ELSE 'Other' END AS reskind,
          |         comppct AS resdept
          |  FROM comp WHERE crating = 'R') r
          |WHERE reskind IN ('Lithic bedrock', 'Fragipan') GROUP BY cokey""".stripMargin,
        compCte))),

    // V8 — CalcRZAWS (gSSURGO_ValuTable.py:1150-1479): organic-surface
    // skip, restriction-limited bottom, major-earthy weighting, droughty.
    // The mapunit divisor is the COMPONENT-table pctearthmc (GetSumPct,
    // :1350/:1367), not the horizon-present comppct sum — in this analog
    // ~half the components ('N'-only orders) have zero horizon rows
    // after the filter yet still dilute their mapunit's mean, so a
    // horizon-side divisor fails the gate on most mapunits.
    Q("v08_rz_aws",
      (s, dir) => {
        val full = hzNumeric(s, dir)
        val rz = Valu.rzDepth(full, restricted = col("rating") >= 8)
        val pct = Tables.load(s, dir, "orders")
          .select(col("o_custkey").as("mukey"),
            (col("o_orderkey") % 97 + 1).cast("double").as("comppct"))
          .groupBy(col("mukey")).agg(sum(col("comppct")).as("pctearthmc"))
        Valu.rzAws(full.filter(col("crating") =!= "N"),
          organic = col("crating") === "A", rz = rz, pct = pct)
      },
      Some(withCtes(
        """SELECT a.mukey,
          |  floor((a.wsum/p.pctearthmc/10.0)*1e4 + 0.5)/1e4 AS rootznaws,
          |  floor(least(a.hsum/p.pctearthmc, 150.0) + 0.5) AS rootznemc,
          |  p.pctearthmc,
          |  floor(floor((a.wsum/p.pctearthmc/10.0)*1e4 + 0.5)/1e4 + 0.5) <= 152 AS droughty
          |FROM (SELECT mukey, sum(comppct*awsum) AS wsum, sum(comppct*hzt) AS hsum
          |      FROM pc GROUP BY mukey) a
          |JOIN (SELECT o_custkey AS mukey,
          |        sum(CAST(o_orderkey % 97 + 1 AS DOUBLE)) AS pctearthmc
          |      FROM orders GROUP BY 1) p ON a.mukey = p.mukey""".stripMargin,
        hzCte,
        "hzme AS (SELECT * FROM hz WHERE crating <> 'N')",
        """rz AS (SELECT cokey,
          |  coalesce(min(CASE WHEN rating >= 8 AND hzdept < 150 THEN hzdept END), 150.0) AS rzdepth
          |FROM hz GROUP BY cokey)""".stripMargin,
        """fm AS (SELECT cokey,
          |  coalesce(min(CASE WHEN NOT (crating = 'A') THEN hzdept END), 999.0) AS fmdept
          |FROM hzme GROUP BY cokey)""".stripMargin,
        """pc AS (SELECT h.mukey, h.cokey, h.comppct,
          |  sum(CASE WHEN h.rating IS NOT NULL
          |        THEN greatest(0.0, least(h.hzdepb, r.rzdepth) - greatest(h.hzdept, f.fmdept)) * h.rating
          |      END) AS awsum,
          |  sum(greatest(0.0, least(h.hzdepb, r.rzdepth) - greatest(h.hzdept, f.fmdept))) AS hzt
          |FROM hzme h JOIN rz r ON h.cokey = r.cokey JOIN fm f ON h.cokey = f.cokey
          |GROUP BY h.mukey, h.cokey, h.comppct)""".stripMargin))),

    // V9 — GetFragVol (gSSURGO_ValuTable.py:1910-1951).
    Q("v09_frag_vol",
      (s, dir) => Valu.fragVol(Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("chkey"), col("l_quantity").as("fragvol"))),
      Some("""SELECT l_orderkey AS chkey,
             |       least(sum(greatest(l_quantity, 0.0)), 100.0) AS fragvol
             |FROM lineitem GROUP BY l_orderkey""".stripMargin)),

    // V10 — CalcSOC (gSSURGO_ValuTable.py:1675-1908, formula :1793).
    Q("v10_calc_soc", (s, dir) => Valu.calcSoc(
      hz(s, dir).select(col("mukey"), col("hzdept"), col("hzdepb"), col("comppct"),
        col("rating").as("om"), (col("cokey") % 5 + 10).cast("double").as("db3i"),
        col("comppct").as("fragvol")),
      socSlices), {
      val cols = socSlices.flatMap { case (t, b) =>
        val ov = OracleSql.ovExpr(t, b)
        val gate = "om IS NOT NULL AND db3i IS NOT NULL"
        Seq(
          s"floor((sum(CASE WHEN $gate THEN $ov*om*db3i*(100.0-fragvol)*comppct END)/1724.0)*1e4 + 0.5)/1e4 AS soc${t}_$b",
          s"round(sum(CASE WHEN $gate THEN $ov*comppct END)/100.0, 4) AS tk${t}_${b}s")
      }
      Some(withCtes(
        s"""SELECT mukey,\n  ${cols.mkString(",\n  ")}
           |FROM (SELECT mukey, hzdept, hzdepb, comppct, rating AS om,
           |             CAST(cokey % 5 + 10 AS DOUBLE) AS db3i, comppct AS fragvol
           |      FROM hz) h GROUP BY mukey""".stripMargin, hzCte))
    }),

    // V11/J12 — MakeNCCPIQueryTable (gSSURGO_ValuTable.py:2015-2096):
    // component ⋈ cointerp with the rule filter pushed down.
    Q("v11_nccpi_query_table",
      (s, dir) => Tables.events(s, dir)
        .filter(col("event_type").isin("click", "view", "purchase", "signup"))
        .select((col("user_id") % 50).as("mukey"), col("user_id").as("cokey"),
          (col("user_id") % 97 + 1).cast("double").as("comppct"),
          col("event_type").as("rule"), Exprs.cents(col("value")).as("fuzzy")),
      Some("""SELECT user_id % 50 AS mukey, user_id AS cokey,
             |       CAST(user_id % 97 + 1 AS DOUBLE) AS comppct,
             |       event_type AS rule, floor(value*100 + 0.5) AS fuzzy
             |FROM events
             |WHERE event_type IN ('click','view','purchase','signup')""".stripMargin)),

    // V12 — CalcNCCPI (gSSURGO_ValuTable.py:2097-2477): per-rule
    // pct-weighted fuzzy means pivoted to fixed columns.
    Q("v12_calc_nccpi",
      (s, dir) => Valu.nccpi(
        Tables.events(s, dir)
          .filter(col("event_type").isin("click", "view", "purchase", "signup"))
          .select((col("user_id") % 50).as("mukey"), col("user_id").as("cokey"),
            (col("user_id") % 97 + 1).cast("double").as("comppct"),
            col("event_type").as("rule"), Exprs.cents(col("value")).as("fuzzy")),
        rules = Seq("click" -> "nccpi_click", "view" -> "nccpi_view",
          "purchase" -> "nccpi_purchase", "signup" -> "nccpi_signup")),
      Some("""WITH interp AS (
             |  SELECT user_id % 50 AS mukey, user_id AS cokey,
             |         CAST(user_id % 97 + 1 AS DOUBLE) AS comppct,
             |         event_type AS rule, floor(value*100 + 0.5) AS fuzzy
             |  FROM events
             |  WHERE event_type IN ('click','view','purchase','signup')),
             |den AS (SELECT mukey, sum(comppct) AS sumpct
             |        FROM (SELECT DISTINCT mukey, cokey, comppct FROM interp) c
             |        GROUP BY mukey),
             |num AS (SELECT mukey,
             |  sum(CASE WHEN rule='click' THEN fuzzy*comppct END) AS n1,
             |  sum(CASE WHEN rule='view' THEN fuzzy*comppct END) AS n2,
             |  sum(CASE WHEN rule='purchase' THEN fuzzy*comppct END) AS n3,
             |  sum(CASE WHEN rule='signup' THEN fuzzy*comppct END) AS n4
             |  FROM interp GROUP BY mukey)
             |SELECT n.mukey,
             |  floor(n1/d.sumpct/10000.0*1e6 + 0.5)/1e6 AS nccpi_click,
             |  floor(n2/d.sumpct/10000.0*1e6 + 0.5)/1e6 AS nccpi_view,
             |  floor(n3/d.sumpct/10000.0*1e6 + 0.5)/1e6 AS nccpi_purchase,
             |  floor(n4/d.sumpct/10000.0*1e6 + 0.5)/1e6 AS nccpi_signup
             |FROM num n JOIN den d ON n.mukey = d.mukey""".stripMargin)),

    // V13 — CalcPWSL (gSSURGO_ValuTable.py:2479-2664): water sentinel
    // 999 vs hydric-criteria pct sum.
    Q("v13_pwsl",
      (s, dir) => Valu.pwsl(comp(s, dir),
        water = col("crating") === "N",
        hydric = col("crating") === "A" || col("comppct") >= 40),
      Some(withCtes(
        """SELECT mukey,
          |  CASE WHEN max(CASE WHEN crating = 'N' AND comppct >= 80 THEN 1 ELSE 0 END) = 1
          |       THEN 999.0
          |       ELSE coalesce(sum(CASE WHEN crating = 'N' OR crating = 'A' OR comppct >= 40
          |                          THEN comppct END), 0.0)
          |  END AS pwsl1pomu
          |FROM comp GROUP BY mukey""".stripMargin, compCte))))
}
