package graft.queries

import graft.analog.Analog._
import graft.analog.OracleSql
import graft.sdv.SdvAgg

/** Month-level (A10–A17) and horizon-level (A18–A23) SDV aggregation
  * algorithms (SURVEY.md §2.4) over the mo/hz analog rating tables. */
object HzMoQueries extends QuerySet {

  /** DTWT null-month sentinel (201 cm in the reference,
    * gSSURGO_CreateSoilMap.py:9725-9745); the analog data has no null
    * months, so this exercises the code path as a no-op (fixtures pin
    * the non-trivial case). */
  private val sentinel = Some(20100.0)

  val all: Seq[Q] = Seq(

    // A10 — AggregateCo_DCP_DTWT (gSSURGO_CreateSoilMap.py:5894-5981):
    // per-component max over months, then Dominant Component.
    Q("a10_mo_dcp_dtwt",
      (s, dir) => SdvAgg.moDominantComponent(moNumeric(s, dir), most = true, sentinel),
      Some(withCtes(OracleSql.dcp("pc"), moCte, OracleSql.moExtremeCte("pc", most = true)))),

    // A11 — AggregateCo_DCD_DTWT (:5983-6107): monthly extreme per
    // component, class pct sums, max-sum class with its raw pct.
    Q("a11_mo_dcd_dtwt",
      (s, dir) => SdvAgg.moDominantCondition(moNumeric(s, dir), most = true, sentinel),
      Some(withCtes(OracleSql.rawDcd("pc", tieLow = true),
        moCte, OracleSql.moExtremeCte("pc", most = true)))),

    // A12 — AggregateCo_WTA_DTWT (:7209-7337): per-component min over
    // months with the null sentinel, then comppct-weighted average.
    Q("a12_mo_wta_dtwt",
      (s, dir) => SdvAgg.moWeightedAverage(moNumeric(s, dir), most = false, sentinel),
      Some(withCtes(OracleSql.wta("pc"), moCte, OracleSql.moExtremeCte("pc", most = false)))),

    // A13 — AggregateCo_Mo_MaxMin (:6109-6287): per-component monthly
    // extreme, class pct sums, mapunit takes the extreme rating with
    // its class pct.
    Q("a13_mo_maxmin",
      (s, dir) => SdvAgg.moMaxMin(moNumeric(s, dir), most = true),
      Some(withCtes(
        """SELECT mukey, rating, comppct FROM (
          |  SELECT mukey, rating, comppct,
          |         row_number() OVER (PARTITION BY mukey ORDER BY rating DESC) AS rn
          |  FROM (SELECT mukey, rating, sum(comppct) AS comppct
          |        FROM pc GROUP BY mukey, rating) br) t WHERE rn = 1""".stripMargin,
        moCte, OracleSql.moExtremeCte("pc", most = true)))),

    // A14 — AggregateCo_Mo_DCD (:6289-6411): per-component
    // tiebreak-directed extreme over months (the "12X" de-dup fix),
    // then dominant component with raw (comppct, rating). High tie.
    Q("a14_mo_dcd_dedup",
      (s, dir) => SdvAgg.moDominantConditionDedup(moChoice(s, dir), tieLow = false),
      Some(withCtes(OracleSql.dcp("pc", tieLow = false), moCte,
        OracleSql.moWorstCte("pc")))),

    // A15 — AggregateCo_Mo_DCP_Domain (:6413-6649): tiebreak High (the
    // flooding/ponding default) → per-component MAX month index, then
    // Dominant Component with the High tie.
    Q("a15_mo_domain_dcp",
      (s, dir) => SdvAgg.moDomainDominantComponent(moChoice(s, dir), tieLow = false),
      Some(withCtes(OracleSql.dcp("pc", tieLow = false), moCte,
        OracleSql.moWorstCte("pc")))),

    // A16 — AggregateCo_Mo_DCD_Domain (:6651-7055): same pre-step, then
    // class pct sums and the (sumpct, index-desc) winner with its RAW
    // class sum — no trump, no normalization.
    Q("a16_mo_domain_dcd",
      (s, dir) => SdvAgg.moDomainDominantCondition(moChoice(s, dir), tieLow = false),
      Some(withCtes(OracleSql.rawDcd("pc", tieLow = false),
        moCte, OracleSql.moWorstCte("pc")))),

    // A17 — AggregateCo_Mo_WTA (:7057-7207): per-component max over
    // months, then weighted average.
    Q("a17_mo_wta",
      (s, dir) => SdvAgg.moWta(moNumeric(s, dir), most = true),
      Some(withCtes(OracleSql.wta("pc"), moCte, OracleSql.moExtremeCte("pc", most = true)))),

    // A24 — wide 12-month presentation of the per-(mapunit, month) WTA
    // rating: the pivot step the reference's month tables imply
    // (12-column soil-moisture style output). pivot() is given the
    // explicit month domain — NEVER values-less pivot, which runs an
    // eager collect-distinct job over the corpus before planning.
    // Exact-cents ratings keep the per-month weighted mean
    // engine-stable under the shared floor-form rounding.
    Q("a24_month_pivot",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val pm = mo(s, dir)
          .groupBy(col("mukey"), col("month").cast("int").as("m"))
          .agg(graft.core.Exprs.roundHalfUp(
            sum(col("comppct") * col("rating")) / sum(col("comppct")), 4).as("r"))
        pm.groupBy(col("mukey")).pivot("m", 1 to 12).agg(first(col("r")))
          .toDF("mukey" +: (1 to 12).map(i => s"m$i"): _*)
      },
      Some(withCtes(
        s"""SELECT mukey,
           |  ${(1 to 12).map(i => s"min(CASE WHEN m = $i THEN r END) AS m$i").mkString(",\n  ")}
           |FROM pm GROUP BY mukey""".stripMargin,
        moCte,
        """pm AS (SELECT mukey, CAST(month AS INT) AS m,
          |  floor(sum(comppct*rating)/sum(comppct)*1e4 + 0.5)/1e4 AS r
          |FROM mo GROUP BY 1, 2)""".stripMargin))),

    // A18 — AggregateHz_WTA_SUM (:8308-8482, AWS): slice [0,100).
    Q("a18_hz_wta_sum",
      (s, dir) => SdvAgg.hzWtaSum(hzNumeric(s, dir), 0, 100),
      Some(withCtes(
        """SELECT mukey,
          |  floor((sum(CASE WHEN compval IS NOT NULL THEN comppct*compval END)
          |    / sum(CASE WHEN compval IS NOT NULL THEN comppct END))*1e4 + 0.5)/1e4 AS rating,
          |  floor((sum(CASE WHEN compval IS NOT NULL THEN comppct*thick END)
          |    / sum(CASE WHEN compval IS NOT NULL THEN comppct END))*1e4 + 0.5)/1e4 AS thickness
          |FROM pc GROUP BY mukey""".stripMargin,
        hzCte, OracleSql.hzSliceCte("pc", 0, 100)))),

    // A19 — AggregateHz_WTA_WTA (:8484-8637, AWC): per-component
    // depth-weighted mean, then comppct-weighted average.
    Q("a19_hz_wta_wta",
      (s, dir) => SdvAgg.hzWtaWta(hzNumeric(s, dir), 0, 100),
      Some(withCtes(
        """SELECT mukey,
          |  floor(sum(CASE WHEN rE8 IS NOT NULL THEN comppct*rE8 END)
          |    / sum(CASE WHEN rE8 IS NOT NULL THEN comppct END) / 1e8 * 1e4 + 0.5)/1e4 AS rating,
          |  sum(CASE WHEN rE8 IS NOT NULL THEN comppct END) AS comppct
          |FROM (SELECT mukey, comppct, floor(compval/thick * 1e8 + 0.5) AS rE8 FROM pc) w
          |GROUP BY mukey""".stripMargin,
        hzCte, OracleSql.hzSliceCte("pc", 0, 100)))),

    // A20 — AggregateHz_DCP_WTA (:8639-8893): components tied for max
    // comppct all kept (:8739-8752); depth-weighted mean over their
    // horizons.
    Q("a20_hz_dcp_wta",
      (s, dir) => SdvAgg.hzDcpWta(hzNumeric(s, dir), 0, 100),
      Some(withCtes(
        s"""SELECT mukey,
           |  floor((sum(CASE WHEN rating IS NOT NULL AND ${OracleSql.ovExpr(0, 100)} > 0
           |              THEN ${OracleSql.ovExpr(0, 100)}*rating END)
           |    / sum(CASE WHEN rating IS NOT NULL AND ${OracleSql.ovExpr(0, 100)} > 0
           |              THEN ${OracleSql.ovExpr(0, 100)} END))*1e4 + 0.5)/1e4 AS rating
           |FROM dom GROUP BY mukey""".stripMargin,
        hzCte,
        "mx AS (SELECT mukey, max(comppct) AS mxpct FROM hz GROUP BY mukey)",
        "dom AS (SELECT hz.* FROM hz JOIN mx ON hz.mukey = mx.mukey AND hz.comppct = mx.mxpct)"))),

    // A21 — AggregateHz_MaxMin_WTA (:8895-9050): per-component
    // depth-weighted mean over the slice, then max across components.
    Q("a21_hz_maxmin_wta",
      (s, dir) => SdvAgg.hzMaxMinWta(hzNumeric(s, dir), most = true, 0, 100),
      Some(withCtes(
        "SELECT mukey, max(floor((compval/thick)*1e4 + 0.5)/1e4) AS rating FROM pc GROUP BY mukey",
        hzCte, OracleSql.hzSliceCte("pc", 0, 100)))),

    // A22 — AggregateHz_MaxMin_DCD (:9052-9199, K-factor): per-component
    // worst horizon rating in slice, then the max-comppct component's
    // raw pct and class win (SortData(muVals,0,0) :9165-9169 — NOT a
    // condition sum, despite the reference function's name).
    Q("a22_hz_maxmin_dcd",
      (s, dir) => SdvAgg.hzMaxMinDcd(hzChoice(s, dir), 0, 100),
      Some(withCtes(OracleSql.dcp("pc"), hzCte,
        OracleSql.hzWorstCte("pc", 0, 100)))),

    // A23 — AggregateHz_MaxMin_DCP (:9201-9346): per-component worst
    // horizon rating, then Dominant Component.
    Q("a23_hz_maxmin_dcp",
      (s, dir) => SdvAgg.hzMaxMinDcp(hzChoice(s, dir), 0, 100),
      Some(withCtes(OracleSql.dcp("pc"), hzCte, OracleSql.hzWorstCte("pc", 0, 100)))))
}
