package graft.analog

/** Generators for the mechanical DuckDB-oracle SQL shapes that mirror
  * graft.sdv.SdvAgg combinators. Every generator consumes a source
  * relation (CTE name) with normalized columns
  * (mukey, cokey, comppct, rating, ord) and must stay in lockstep with
  * the combinator it mirrors. */
object OracleSql {

  private def dir(tieLow: Boolean) = if (tieLow) "ASC" else "DESC"

  /** Mirror of SdvAgg.dominantComponent: winner by
    * (comppct DESC, ord tie-dir, cokey DESC). */
  def dcp(src: String, tieLow: Boolean = true): String =
    s"""SELECT mukey, rating, comppct FROM (
       |  SELECT mukey, rating, comppct,
       |         row_number() OVER (PARTITION BY mukey
       |           ORDER BY comppct DESC, ord ${dir(tieLow)}, cokey DESC) AS rn
       |  FROM $src) t WHERE rn = 1""".stripMargin

  /** Per-(mukey,rating) class sums CTE used by the DCD mirror. The
    * `name` parameter lets one oracle carry several DCD legs. */
  def dcdBr(src: String, name: String = "dcd_br"): String =
    s"""$name AS (SELECT mukey, rating, max(ord) AS ord, sum(comppct) AS sumpct
       |           FROM $src GROUP BY mukey, rating)""".stripMargin

  /** Mirror of SdvAgg.dominantCondition (needs dcdBr(src) in the CTE
    * list): class with max summed pct wins unless the dominant
    * component's pct >= 50 (the DCD trump, :5768-5787) — in which case
    * the reported pct is the dominant COMPONENT's pct (:5778-5780). */
  def dcd(src: String, tieLow: Boolean = true, br: String = "dcd_br"): String =
    s"""SELECT w.mukey, w.rating, floor((100*w.wpct/t.totalpct)*1e4 + 0.5)/1e4 AS comppct
       |FROM (SELECT c.mukey,
       |             CASE WHEN d.dcppct >= 50 THEN d.dcprating ELSE c.rating END AS rating,
       |             CASE WHEN d.dcppct >= 50 THEN d.dcppct ELSE c.sumpct END AS wpct
       |      FROM (SELECT mukey, rating, sumpct FROM (
       |              SELECT mukey, rating, sumpct, row_number() OVER (PARTITION BY mukey
       |                ORDER BY sumpct DESC, ord ${dir(tieLow)}) AS rn
       |              FROM $br) x WHERE rn = 1) c
       |      JOIN (SELECT mukey, rating AS dcprating, comppct AS dcppct FROM (
       |              SELECT mukey, rating, comppct, row_number() OVER (PARTITION BY mukey
       |                ORDER BY comppct DESC, ord ${dir(tieLow)}, cokey DESC) AS rn
       |              FROM $src) y WHERE rn = 1) d ON c.mukey = d.mukey) w
       |JOIN (SELECT mukey, sum(sumpct) AS totalpct FROM $br GROUP BY mukey) t
       |  ON t.mukey = w.mukey""".stripMargin

  /** Mirror of SdvAgg's raw class-sum winner (A11/A16,
    * rawDominantCondition): class pct sums over a per-component table,
    * max sum wins with its RAW pct (no trump, no normalization); ties
    * by ord (tie direction) then rating DESC. */
  def rawDcd(src: String, tieLow: Boolean = true): String =
    s"""SELECT mukey, rating, comppct FROM (
       |  SELECT mukey, rating, sumpct AS comppct,
       |         row_number() OVER (PARTITION BY mukey
       |           ORDER BY sumpct DESC, ord ${dir(tieLow)}, rating DESC) AS rn
       |  FROM (SELECT mukey, rating, max(ord) AS ord, sum(comppct) AS sumpct
       |        FROM $src GROUP BY mukey, rating) br) t WHERE rn = 1""".stripMargin

  /** Mirror of SdvAgg.weightedAverage. */
  def wta(src: String): String =
    s"""SELECT mukey, floor((sum(comppct*rating)/sum(comppct))*1e4 + 0.5)/1e4 AS rating,
       |       sum(comppct) AS comppct
       |FROM $src GROUP BY mukey""".stripMargin

  /** Per-component extreme over months (mirror of
    * SdvAgg.perComponentMonthlyExtreme on the numeric mo view). */
  def moExtremeCte(name: String, most: Boolean): String = {
    val f = if (most) "max" else "min"
    s"""$name AS (SELECT mukey, cokey, comppct, $f(rating) AS rating, $f(rating) AS ord
       |           FROM mo GROUP BY mukey, cokey, comppct)""".stripMargin
  }

  /** Per-component worst month by domain (choice view; alphabetical
    * domain lets the oracle use max(crating)). */
  def moWorstCte(name: String): String =
    s"""$name AS (SELECT mukey, cokey, comppct, max(crating) AS rating, max(cord) AS ord
       |           FROM mo GROUP BY mukey, cokey, comppct)""".stripMargin

  /** Slice-overlap thickness expression for the hz CTE. */
  def ovExpr(top: Int, bot: Int): String =
    s"greatest(0.0, least(hzdepb, $bot.0) - greatest(hzdept, $top.0))"

  /** Per-component slice sums CTE (mirror of perComponentSliceSums). */
  def hzSliceCte(name: String, top: Int, bot: Int): String = {
    val ov = ovExpr(top, bot)
    s"""$name AS (SELECT mukey, cokey, comppct,
       |           sum(CASE WHEN rating IS NOT NULL AND $ov > 0 THEN $ov*rating END) AS compval,
       |           sum(CASE WHEN rating IS NOT NULL AND $ov > 0 THEN $ov END) AS thick
       |           FROM hz GROUP BY mukey, cokey, comppct)""".stripMargin
  }

  /** Per-component worst horizon rating in slice (choice view mirror of
    * perComponentWorstHorizon; alphabetical domain). */
  def hzWorstCte(name: String, top: Int, bot: Int): String =
    s"""$name AS (SELECT mukey, cokey, comppct, max(crating) AS rating, max(cord) AS ord
       |           FROM hz WHERE hzdepb > $top AND hzdept < $bot AND crating IS NOT NULL
       |           GROUP BY mukey, cokey, comppct)""".stripMargin
}
