package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.analog.Analog
import graft.analog.Analog.{withCtes, compCte, compNrCte, baseMuCte}
import graft.sdv.SdvAgg

/** The component-level SDV aggregation algorithms (SURVEY.md §2.4
  * A1–A9) exercised over the analog rating tables. */
object SdvQueries extends QuerySet {

  // Shared oracle CTE fragments --------------------------------------

  /** DCP winner rows, numeric rating, tiebreak low. */
  private val dcpNumSql =
    """SELECT mukey, rating, comppct FROM (
      |  SELECT mukey, rating, comppct,
      |         row_number() OVER (PARTITION BY mukey
      |           ORDER BY comppct DESC, rating ASC, cokey DESC) AS rn
      |  FROM comp) t WHERE rn = 1""".stripMargin

  val all: Seq[Q] = Seq(

    // A1 — No Aggregation Necessary (Aggregate1,
    // gSSURGO_CreateSoilMap.py:4720-4808): mapunit-level passthrough.
    Q("a01_no_aggregation",
      (s, dir) => SdvAgg.noAggregation(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey").as("mukey"), col("o_totalprice").as("rating"))),
      Some("SELECT o_orderkey AS mukey, round(o_totalprice, 2) AS rating FROM orders")),

    // A2 — Dominant Component, numeric rating, tiebreak low
    // (AggregateCo_DCP, gSSURGO_CreateSoilMap.py:4810-4986).
    Q("a02_dominant_component",
      (s, dir) => SdvAgg.dominantComponent(Analog.compNumeric(s, dir), tieLow = true),
      Some(withCtes(dcpNumSql, compCte))),

    // A3 — Dominant Condition, numeric rating, 50%-trump
    // (AggregateCo_DCD, gSSURGO_CreateSoilMap.py:5564-5892, :5768-5787).
    Q("a03_dominant_condition",
      (s, dir) => SdvAgg.dominantCondition(Analog.compNumeric(s, dir), tieLow = true),
      Some(withCtes(
        graft.analog.OracleSql.dcd("compn"), compCte,
        "compn AS (SELECT mukey, cokey, comppct, rating, rating AS ord FROM comp)",
        graft.analog.OracleSql.dcdBr("compn")))),

    // A4 — Dominant Condition over a Choice domain, tiebreak HIGH
    // (AggregateCo_DCD_Domain, gSSURGO_CreateSoilMap.py:7339-7750).
    Q("a04_dominant_condition_domain",
      (s, dir) => SdvAgg.dominantCondition(Analog.compChoice(s, dir), tieLow = false),
      Some(withCtes(
        graft.analog.OracleSql.dcd("compc", tieLow = false), compCte,
        "compc AS (SELECT mukey, cokey, comppct, crating AS rating, cord AS ord FROM comp)",
        graft.analog.OracleSql.dcdBr("compc")))),

    // A5 — Dominant Component over a Choice domain
    // (AggregateCo_DCP_Domain, gSSURGO_CreateSoilMap.py:7752-7979).
    Q("a05_dominant_component_domain",
      (s, dir) => SdvAgg.dominantComponent(Analog.compChoice(s, dir), tieLow = true),
      Some(withCtes(
        """SELECT mukey, rating, comppct FROM (
          |  SELECT mukey, crating AS rating, comppct,
          |         row_number() OVER (PARTITION BY mukey
          |           ORDER BY comppct DESC, cord ASC, cokey DESC) AS rn
          |  FROM comp) t WHERE rn = 1""".stripMargin, compCte))),

    // A6 — component-percent Weighted Average (AggregateCo_WTA,
    // gSSURGO_CreateSoilMap.py:7981-8203).
    Q("a06_weighted_average",
      (s, dir) => SdvAgg.weightedAverage(Analog.compNumeric(s, dir)),
      Some(withCtes(
        """SELECT mukey, floor((sum(comppct*rating)/sum(comppct))*1e4 + 0.5)/1e4 AS rating,
          |       sum(comppct) AS comppct
          |FROM comp GROUP BY mukey""".stripMargin, compCte))),

    // A7 — Min/Max with 'Not rated' skipped unless alone
    // (AggregateCo_MaxMin, gSSURGO_CreateSoilMap.py:5230-5562,
    // :5415-5422). Domain is alphabetical so the oracle can use max().
    Q("a07_maxmin_not_rated",
      (s, dir) => SdvAgg.maxMin(Analog.compNotRated(s, dir), most = true,
        notRatedOrd = Some(Analog.notRatedOrd)),
      Some(withCtes(
        """SELECT mukey,
          |       coalesce(max(CASE WHEN ratingOrd <> 4.0 THEN rating END),
          |                'Not rated') AS rating
          |FROM compnr GROUP BY mukey""".stripMargin, compCte, compNrCte))),

    // A8 — Limiting with winning-class comppct (AggregateCo_Limiting,
    // gSSURGO_CreateSoilMap.py:4988-5228). Exercises the MAX-index
    // direction of the combinator (under the NASIS most-limiting-first
    // domain convention that is 'Least Limiting'; the planner maps the
    // directions — SdvPlannerSpec pins both).
    Q("a08_most_limiting",
      (s, dir) => SdvAgg.limiting(Analog.compNotRated(s, dir), most = true,
        notRatedOrd = Some(Analog.notRatedOrd)),
      Some(withCtes(
        """SELECT mukey, rating, comppct FROM (
          |  SELECT mukey, rating, comppct,
          |         row_number() OVER (PARTITION BY mukey
          |           ORDER BY (CASE WHEN ord <> 4.0 THEN 1 ELSE 0 END) DESC, ord DESC) AS rn
          |  FROM (SELECT mukey, rating, max(ratingOrd) AS ord, sum(comppct) AS comppct
          |        FROM compnr GROUP BY mukey, rating) b) t WHERE rn = 1""".stripMargin,
        compCte, compNrCte))),

    // A9 — Percent Present (AggregateCo_PP_SUM,
    // gSSURGO_CreateSoilMap.py:8205-8306): unmatched mapunits report 0.
    Q("a09_percent_present",
      (s, dir) => SdvAgg.percentPresent(Analog.compChoice(s, dir),
        Analog.baseMu(s, dir), col("rating") === "R"),
      Some(withCtes(
        """SELECT b.mukey, coalesce(s.matchpct, 0.0) AS comppct
          |FROM basemu b LEFT JOIN
          |  (SELECT mukey, sum(comppct) AS matchpct FROM comp
          |   WHERE crating = 'R' GROUP BY mukey) s ON b.mukey = s.mukey""".stripMargin,
        compCte, baseMuCte))))
}
