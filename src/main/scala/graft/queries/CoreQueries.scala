package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.analog.Analog
import graft.analog.Analog.{withCtes, compCte, baseMuCte, hzCte}
import graft.core.Exprs
import graft.sdv.SdvAgg

/** Scan / filter / join operators (SURVEY.md §2.1-§2.3) exercised over
  * the driver test tables. */
object CoreQueries extends QuerySet {

  val all: Seq[Q] = Seq(

    // The flagship aggregation (TPC-H Q1 shape == the reference's
    // groupBy-mukey rollup writ small). Exact-cents so sums hash-match.
    Q("q1_agg",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(Exprs.cents(col("l_extendedprice"))) / 100, 2).as("sum_base"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       round(sum(floor(l_extendedprice*100 + 0.5))/100, 2) AS sum_base,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // F2 — component percent cutoff + NOTCOM-style exclusion
    // (gSSURGO_CreateSoilMap.py:10318-10330).
    Q("f02_comppct_cutoff",
      (s, dir) => Analog.comp(s, dir)
        .filter(col("comppct") >= 25 && col("crating") =!= "N")
        .select("mukey", "cokey", "comppct", "rating"),
      Some(withCtes(
        """SELECT mukey, cokey, comppct, rating FROM comp
          |WHERE comppct >= 25 AND crating <> 'N'""".stripMargin, compCte))),

    // F4 — horizon depth-slice overlap predicate + thickness
    // (gSSURGO_CreateSoilMap.py:10013-10022, 8398). Slice [0,100).
    Q("f04_depth_overlap",
      // written as overlap>0 so graft.plans.DepthOverlapRule rewrites it
      // into the pushable range conjunction (see PlansSpec)
      (s, dir) => Analog.hz(s, dir)
        .filter(Exprs.depthOverlap(col("hzdept"), col("hzdepb"), 0, 100) > 0)
        .select(col("mukey"), col("cokey"), col("hzdept"), col("hzdepb"),
          Exprs.depthOverlap(col("hzdept"), col("hzdepb"), 0, 100).as("hz_t")),
      Some(withCtes(
        """SELECT mukey, cokey, hzdept, hzdepb,
          |       greatest(0.0, least(hzdepb, 100.0) - greatest(hzdept, 0.0)) AS hz_t
          |FROM hz WHERE hzdepb > 0 AND hzdept < 100""".stripMargin, hzCte))),

    // F5 — month-range predicate (gSSURGO_CreateSoilMap.py:10243-10262).
    Q("f05_month_range",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          month(col("l_shipdate")).cast("double").as("mon"))
        .filter(col("mon").between(3, 6)),
      Some("""SELECT l_orderkey, l_linenumber, CAST(month(l_shipdate) AS DOUBLE) AS mon
             |FROM lineitem WHERE month(l_shipdate) BETWEEN 3 AND 6""".stripMargin)),

    // F6 — precomputed-rulekey broadcast semijoin
    // (GetRuleKey, gSSURGO_CreateSoilMap.py:3821-3863, applied
    // :10160-10183): a small key table replaces a LIKE filter.
    Q("f06_rulekey_semijoin",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val ruleKeys = ev.select("event_type").distinct()
          .filter(col("event_type").isin("click", "purchase"))
        ev.join(broadcast(ruleKeys), Seq("event_type"), "left_semi")
          .select("event_id", "user_id", "event_type")
      },
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE event_type IN ('click', 'purchase')""".stripMargin)),

    // F9 — sdvattribute free-text where-clause applied via expr()
    // (GetSDVAtts, gSSURGO_CreateSoilMap.py:3741-3764, :10139-10147).
    Q("f09_metadata_whereclause",
      (s, dir) => Analog.comp(s, dir)
        .filter(expr("comppct >= 30 AND crating = 'R'"))
        .select("mukey", "cokey", "rating"),
      Some(withCtes(
        """SELECT mukey, cokey, rating FROM comp
          |WHERE comppct >= 30 AND crating = 'R'""".stripMargin, compCte))),

    // J1 — mapunit ⟕ legend (CreateRatingTable1,
    // gSSURGO_CreateSoilMap.py:4094-4144).
    Q("j01_mapunit_legend",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"), "left")
          .select(col("o_orderkey").as("mukey"), col("o_orderstatus"),
            col("c_mktsegment"))
      },
      Some("""SELECT o_orderkey AS mukey, o_orderstatus, c_mktsegment
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // J5 — three-level null-padded initial table (CreateRatingTable3,
    // gSSURGO_CreateSoilMap.py:4196-4266): mapunit ⟕ component ⟕ horizon
    // with dMissing null rows materialized by the left joins.
    Q("j05_three_level_join",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
        val l = Tables.load(s, dir, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .join(l, o("o_orderkey") === l("l_orderkey"), "left")
          .select(col("c_custkey").as("mukey"), col("o_orderkey").as("cokey"),
            col("l_linenumber").cast("double").as("hzno"),
            col("l_quantity").as("qty"))
      },
      Some("""SELECT c_custkey AS mukey, o_orderkey AS cokey,
             |       CAST(l_linenumber AS DOUBLE) AS hzno, l_quantity AS qty
             |FROM customer
             |LEFT JOIN orders ON o_custkey = c_custkey
             |LEFT JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin)),

    // J13 — merged rating table: base mapunit list widened one column
    // per rating layer (gSSURGO_MergeRatingTables.py:78-446).
    Q("j13_merged_rating_tables",
      (s, dir) => {
        val base = Analog.baseMu(s, dir)
        val wta = SdvAgg.weightedAverage(Analog.compNumeric(s, dir))
          .select(col("mukey"), col("rating").as("wta_rating"))
        val pp = SdvAgg.percentPresent(Analog.compChoice(s, dir), base,
            col("rating") === "R")
          .select(col("mukey"), col("comppct").as("pp_pct"))
        base.join(wta, Seq("mukey"), "left").join(pp, Seq("mukey"), "left")
      },
      Some(withCtes(
        """SELECT b.mukey, w.wta_rating, coalesce(p.pp_pct, 0.0) AS pp_pct
          |FROM basemu b
          |LEFT JOIN (SELECT mukey, floor((sum(comppct*rating)/sum(comppct))*1e4 + 0.5)/1e4 AS wta_rating
          |           FROM comp GROUP BY mukey) w ON b.mukey = w.mukey
          |LEFT JOIN (SELECT mukey, sum(comppct) AS pp_pct
          |           FROM comp WHERE crating = 'R' GROUP BY mukey) p ON b.mukey = p.mukey""".stripMargin,
        compCte, baseMuCte))),

    // J16/§5 — anti-join: keys with no children (validation's "mapunits
    // with no component", gSSURGO_ValidateData.py:536-541). The child
    // side is restricted to a key slice so genuine orphans exist at
    // every SF — an unfiltered orders table leaves no customer
    // orderless and the anti-join would be vacuously 0 = 0.
    Q("j16_anti_no_children",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderkey % 3 = 0)""".stripMargin)))
}
