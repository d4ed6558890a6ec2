package graft.analog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.Exprs

/** Adapters that present the driver's TPC-H-ish test tables
  * (TESTDATA.md) as SSURGO-shaped rating tables, so the SDV combinators
  * (graft.sdv.SdvAgg) can be exercised end-to-end against the DuckDB
  * oracle. Each DataFrame builder has a **matching SQL CTE** used by the
  * oracle queries — keep them in lockstep.
  *
  * Determinism contract: every derived numeric column is integral
  * (quantities are integral doubles; prices/discounts go through the
  * exact-cents encoding), so all sums are exact in IEEE754 and the final
  * division/round steps see bit-identical operands in Spark and DuckDB.
  */
object Analog {

  /** Choice-rating domain for l_returnflag. Alphabetical on purpose: the
    * oracle can then express ordinal comparisons directly on the string.
    * (Non-alphabetical domains are pinned by the ScalaTest fixtures.) */
  val flagDomain: Seq[String] = Seq("A", "N", "R")

  val flagOrdSql: String =
    "CASE l_returnflag WHEN 'A' THEN 1.0 WHEN 'N' THEN 2.0 WHEN 'R' THEN 3.0 ELSE 4.0 END"

  // -------------------------------------------------------------------
  // Component-level rating table: mapunit = order, component = lineitem.
  // mukey=o_orderkey, cokey unique numeric, comppct=l_quantity,
  // rating = exact cents of l_extendedprice, crating/cord = returnflag.

  val compCte: String =
    s"""comp AS (
       |  SELECT l_orderkey AS mukey,
       |         l_orderkey*10 + l_linenumber AS cokey,
       |         l_quantity AS comppct,
       |         floor(l_extendedprice*100 + 0.5) AS rating,
       |         l_returnflag AS crating,
       |         $flagOrdSql AS cord
       |  FROM lineitem)""".stripMargin

  def comp(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey").as("mukey"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("cokey"),
      col("l_quantity").as("comppct"),
      Exprs.cents(col("l_extendedprice")).as("rating"),
      col("l_returnflag").as("crating"),
      Exprs.domainRank(col("l_returnflag"), flagDomain).as("cord"))

  /** Numeric-rating view: ratingOrd == rating. */
  def compNumeric(spark: SparkSession, dir: String): DataFrame =
    comp(spark, dir).withColumn("ratingOrd", col("rating"))

  /** Choice-rating view: rating = returnflag, ratingOrd = domain index. */
  def compChoice(spark: SparkSession, dir: String): DataFrame =
    comp(spark, dir).select(col("mukey"), col("cokey"), col("comppct"),
      col("crating").as("rating"), col("cord").as("ratingOrd"))

  /** Choice view with a 'Not rated' class injected (components with
    * comppct < 5), for the not-rated fallback paths (A7/A8). Domain:
    * A(1) N(2) R(3) NotRated(4). */
  val notRatedOrd: Double = 4.0

  val compNrCte: String =
    s"""compnr AS (
       |  SELECT mukey, cokey, comppct,
       |         CASE WHEN comppct < 5 THEN 'Not rated' ELSE crating END AS rating,
       |         CASE WHEN comppct < 5 THEN 4.0 ELSE cord END AS ratingOrd
       |  FROM comp)""".stripMargin

  def compNotRated(spark: SparkSession, dir: String): DataFrame =
    comp(spark, dir).select(col("mukey"), col("cokey"), col("comppct"),
      when(col("comppct") < 5, lit("Not rated")).otherwise(col("crating")).as("rating"),
      when(col("comppct") < 5, lit(notRatedOrd)).otherwise(col("cord")).as("ratingOrd"))

  // -------------------------------------------------------------------
  // Month-level rating table (comonth/cosoilmoist analog): mapunit =
  // customer, component = order, months from the order's lineitem
  // shipdates. comppct is a deterministic 1..97 pseudo-percent so the
  // DCD 50%-trump rule exercises both branches.

  val moCte: String =
    s"""mo AS (
       |  SELECT o_custkey AS mukey,
       |         o_orderkey AS cokey,
       |         CAST(1 + o_orderkey % 97 AS DOUBLE) AS comppct,
       |         CAST(month(l_shipdate) AS DOUBLE) AS month,
       |         floor(l_extendedprice*100 + 0.5) AS rating,
       |         l_returnflag AS crating,
       |         $flagOrdSql AS cord
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""".stripMargin

  def mo(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey")).select(
      col("o_custkey").as("mukey"),
      col("o_orderkey").as("cokey"),
      (col("o_orderkey") % 97 + 1).cast("double").as("comppct"),
      month(col("l_shipdate")).cast("double").as("month"),
      Exprs.cents(col("l_extendedprice")).as("rating"),
      col("l_returnflag").as("crating"),
      Exprs.domainRank(col("l_returnflag"), flagDomain).as("cord"))
  }

  def moNumeric(spark: SparkSession, dir: String): DataFrame =
    mo(spark, dir).withColumn("ratingOrd", col("rating"))

  def moChoice(spark: SparkSession, dir: String): DataFrame =
    mo(spark, dir).select(col("mukey"), col("cokey"), col("comppct"), col("month"),
      col("crating").as("rating"), col("cord").as("ratingOrd"))

  // -------------------------------------------------------------------
  // Horizon-level rating table (chorizon analog): mapunit = customer,
  // component = order, horizons = lineitems at synthetic depths
  // [(n-1)*30, n*30), rating = discount in exact percent points.

  val hzCte: String =
    s"""hz AS (
       |  SELECT o_custkey AS mukey,
       |         o_orderkey AS cokey,
       |         CAST(1 + o_orderkey % 97 AS DOUBLE) AS comppct,
       |         CAST((l_linenumber-1)*30 AS DOUBLE) AS hzdept,
       |         CAST(l_linenumber*30 AS DOUBLE) AS hzdepb,
       |         floor(l_discount*100 + 0.5) AS rating,
       |         l_returnflag AS crating,
       |         $flagOrdSql AS cord
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""".stripMargin

  def hz(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey")).select(
      col("o_custkey").as("mukey"),
      col("o_orderkey").as("cokey"),
      (col("o_orderkey") % 97 + 1).cast("double").as("comppct"),
      ((col("l_linenumber") - 1) * 30).cast("double").as("hzdept"),
      (col("l_linenumber") * 30).cast("double").as("hzdepb"),
      Exprs.cents(col("l_discount")).as("rating"),
      col("l_returnflag").as("crating"),
      Exprs.domainRank(col("l_returnflag"), flagDomain).as("cord"))
  }

  def hzNumeric(spark: SparkSession, dir: String): DataFrame =
    hz(spark, dir).withColumn("ratingOrd", col("rating"))

  /** Choice-rating horizon view (K-factor pattern): rating = returnflag. */
  def hzChoice(spark: SparkSession, dir: String): DataFrame =
    hz(spark, dir).select(col("mukey"), col("cokey"), col("comppct"),
      col("hzdept"), col("hzdepb"),
      col("crating").as("rating"), col("cord").as("ratingOrd"))

  // -------------------------------------------------------------------
  // Restriction analog (corestrictions: cokey, resdept_r): two depths
  // per component — (o_orderkey % 7)*30 sits ON the synthetic horizon
  // grid and matches iff the order has enough lineitems (mixed
  // outcomes, data-dependent), while (o_orderkey % 5)*30 + 15 sits
  // BETWEEN horizon tops and always violates (non-vacuous at every SF,
  // the val05 deliberate-wrongness pattern).

  val restrCte: String =
    """restr AS (
      |  SELECT o_orderkey AS cokey, CAST((o_orderkey % 7) * 30 AS DOUBLE) AS resdept
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, CAST((o_orderkey % 5) * 30 + 15 AS DOUBLE)
      |  FROM orders)""".stripMargin

  def restr(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.select(col("o_orderkey").as("cokey"),
        ((col("o_orderkey") % 7) * 30).cast("double").as("resdept"))
      .unionByName(o.select(col("o_orderkey").as("cokey"),
        ((col("o_orderkey") % 5) * 30 + 15).cast("double").as("resdept")))
  }

  // -------------------------------------------------------------------
  // Component-universe analog with name/kind (component: cokey,
  // compname, compkind) keyed like hz (cokey = o_orderkey): %17 plants
  // NOTCOM/NOTPUB names and %19 a 'Miscellaneous area' kind, so the
  // reference's no-horizon exclusions are exercised at every SF.

  val coKindCte: String =
    """cokind AS (
      |  SELECT o_orderkey AS cokey,
      |         CASE o_orderkey % 17 WHEN 0 THEN 'NOTCOM' WHEN 1 THEN 'NOTPUB'
      |              ELSE 'COMP-' || CAST(o_orderkey AS VARCHAR) END AS compname,
      |         CASE WHEN o_orderkey % 19 = 0 THEN 'Miscellaneous area'
      |              ELSE 'Series' END AS compkind
      |  FROM orders)""".stripMargin

  def coKind(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(
      col("o_orderkey").as("cokey"),
      when(col("o_orderkey") % 17 === 0, lit("NOTCOM"))
        .when(col("o_orderkey") % 17 === 1, lit("NOTPUB"))
        .otherwise(concat(lit("COMP-"), col("o_orderkey").cast("string"))).as("compname"),
      when(col("o_orderkey") % 19 === 0, lit("Miscellaneous area"))
        .otherwise(lit("Series")).as("compkind"))

  /** Mapunit key universe (the reference always reports every mukey —
    * BadTable, gSSURGO_CreateSoilMap.py:433-454). */
  def baseMu(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders").select(col("o_orderkey").as("mukey"))

  val baseMuCte: String = "basemu AS (SELECT o_orderkey AS mukey FROM orders)"

  /** Prefix a query body with the named CTEs it uses. */
  def withCtes(body: String, ctes: String*): String =
    "WITH " + ctes.mkString(",\n") + "\n" + body
}
