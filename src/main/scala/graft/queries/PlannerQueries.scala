package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft
import graft.Tables
import graft.analog.Analog.withCtes
import graft.core.Exprs
import graft.schema.SdvAttribute
import graft.sdv.SdvAgg
import graft.sdv.SdvPlanner.SdvRequest

/** The metadata-driven planner driven end-to-end through the driver
  * gate: SSURGO-shaped tables (string keys!) are derived from the
  * analog data, a catalog row goes in, a rating table comes out, and
  * DuckDB mirrors the whole computation. Also R2-raster acreage. */
object PlannerQueries extends QuerySet {

  /** SSURGO-shaped mapunit/component/chorizon derived from TPC-H analog
    * (keys become strings, like real SSURGO). */
  private def ssurgoTables(s: SparkSession, dir: String): Map[String, DataFrame] = {
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    val mapunit = o.select(col("o_orderkey").cast("string").as("mukey"),
      lit("M").as("musym"), lit("Mu name").as("muname"), lit("L1").as("lkey"))
    val component = l.select(
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cokey"),
      col("l_orderkey").cast("string").as("mukey"),
      col("l_quantity").cast("int").as("comppct_r"),
      lit("Alpha").as("compname"),
      round(col("l_extendedprice") * 100, 0).as("price_cents"),
      col("l_returnflag").as("flag"))
    val chorizon = l.select(
      (col("l_orderkey") * 100 + col("l_linenumber")).cast("string").as("chkey"),
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cokey_unused"),
      col("l_orderkey").cast("string").as("mukey_unused"))
    Map("mapunit" -> mapunit, "component" -> component, "chorizon" -> chorizon)
  }

  private val ssurgoCte =
    """sco AS (
      |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
      |         CAST(l_orderkey AS VARCHAR) AS mukey,
      |         CAST(l_quantity AS INT) AS comppct_r,
      |         floor(l_extendedprice*100 + 0.5) AS price_cents,
      |         l_returnflag AS flag
      |  FROM lineitem)""".stripMargin

  val all: Seq[Q] = Seq(

    // Planner end-to-end: catalog row → component-level DCP with string
    // keys, comppct cutoff, and the COKEY DESC (string-order) tiebreak.
    Q("p01_planner_dcp",
      (s, dir) => Graft.soilMap(ssurgoTables(s, dir))(
        SdvAttribute("Price", "component", "price_cents", "rating",
          "Float", "Dominant Component", complevelattribflag = 1),
        SdvRequest(cutOff = 5)),
      Some(withCtes(
        """SELECT mukey, rating, comppct FROM (
          |  SELECT mukey, price_cents AS rating, CAST(comppct_r AS DOUBLE) AS comppct,
          |         row_number() OVER (PARTITION BY mukey
          |           ORDER BY comppct_r DESC, price_cents ASC, cokey DESC) AS rn
          |  FROM sco WHERE comppct_r >= 5) t WHERE rn = 1""".stripMargin, ssurgoCte))),

    // Planner end-to-end: Choice rating ranked by a NON-alphabetical
    // domain (R < A < N), Dominant Condition with the 50% trump.
    Q("p02_planner_dcd_domain",
      (s, dir) => Graft.soilMap(ssurgoTables(s, dir),
        domains = Map("flags" -> Seq("R", "A", "N")))(
        SdvAttribute("Flag", "component", "flag", "rating",
          "Choice", "Dominant Condition", complevelattribflag = 1,
          tiebreakdomainname = Some("flags"))),
      Some(withCtes(
        graft.analog.OracleSql.dcd("scord"), ssurgoCte,
        """scord AS (SELECT mukey, cokey, CAST(comppct_r AS DOUBLE) AS comppct,
          |                 flag AS rating,
          |                 CASE flag WHEN 'R' THEN 1.0 WHEN 'A' THEN 2.0
          |                           WHEN 'N' THEN 3.0 ELSE 4.0 END AS ord
          |          FROM sco WHERE comppct_r >= 0)""".stripMargin,
        graft.analog.OracleSql.dcdBr("scord")))),

    // Planner end-to-end over a mapunit-level 1:N satellite
    // (CreateRatingTable1S, gSSURGO_CreateSoilMap.py:4146-4194):
    // mucropyld crop yields, metadata whereclause slicing one crop,
    // mapunits without a matching row null-padded.
    Q("p03_planner_mucropyld",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val mucropyld = l.select(
          col("l_orderkey").cast("string").as("mukey"),
          when(col("l_linenumber") <= 2, "Corn").otherwise("Soybeans").as("cropname"),
          col("l_quantity").cast("double").as("nonirryield_r"))
        Graft.soilMap(ssurgoTables(s, dir) + ("mucropyld" -> mucropyld))(
          SdvAttribute("Crop yield", "mucropyld", "nonirryield_r", "nonirryield",
            "Float", "No Aggregation Necessary",
            sqlwhereclause = Some("cropname = 'Corn'")))
      },
      Some(
        """SELECT m.mukey, round(c.nonirryield_r, 2) AS nonirryield
          |FROM (SELECT CAST(o_orderkey AS VARCHAR) AS mukey FROM orders) m
          |LEFT JOIN (SELECT CAST(l_orderkey AS VARCHAR) AS mukey,
          |                  CAST(l_quantity AS DOUBLE) AS nonirryield_r
          |           FROM lineitem WHERE l_linenumber <= 2) c ON m.mukey = c.mukey""".stripMargin)),

    // F10 — RV low/high estimate swap driven end-to-end
    // (gSSURGO_CreateSoilMap.py:3776-3785): the request asks for the Low
    // estimate, so the planner rates yield_l where the catalog row says
    // yield_r. The oracle computes the WTA over yield_l directly — a
    // missed (or wrong-direction) swap fails the hash gate.
    Q("p04_planner_rv_low",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val component = l.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cokey"),
          col("l_orderkey").cast("string").as("mukey"),
          col("l_quantity").cast("int").as("comppct_r"),
          lit("Alpha").as("compname"),
          Exprs.cents(col("l_extendedprice")).as("yield_r"),
          (Exprs.cents(col("l_extendedprice")) - col("l_linenumber") * 100).as("yield_l"),
          (Exprs.cents(col("l_extendedprice")) + col("l_linenumber") * 100).as("yield_h"))
        Graft.soilMap(ssurgoTables(s, dir) + ("component" -> component))(
          SdvAttribute("Yield", "component", "yield_r", "rating",
            "Float", "Weighted Average", complevelattribflag = 1),
          SdvRequest(cutOff = 5, rv = Some("l")))
      },
      Some(withCtes(
        """SELECT mukey, floor((sum(comppct*rating)/sum(comppct))*1e4 + 0.5)/1e4 AS rating,
          |       sum(comppct) AS comppct
          |FROM srv GROUP BY mukey""".stripMargin,
        """srv AS (
          |  SELECT CAST(l_orderkey AS VARCHAR) AS mukey,
          |         CAST(l_quantity AS DOUBLE) AS comppct,
          |         floor(l_extendedprice*100 + 0.5) - l_linenumber*100 AS rating
          |  FROM lineitem WHERE l_quantity >= 5)""".stripMargin))),

    // R8 — floodBandaid driven end-to-end (gSSURGO_CreateSoilMap.py:
    // 166-203): the catalog row arrives with a NULL tiebreakdomainname;
    // SdvCatalog.normalize (applied by Graft.soilMap) restores
    // 'flooding_frequency_class', which supplies the non-alphabetical
    // rating order the DCD tiebreaks depend on (None < Rare < Frequent,
    // vs alphabetical Frequent < None < Rare). Without the bandaid the
    // planner would rank every class 0 and tie-break arbitrarily.
    Q("p05_planner_flood_bandaid",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val component = l.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cokey"),
          col("l_orderkey").cast("string").as("mukey"),
          col("l_quantity").cast("int").as("comppct_r"),
          lit("Alpha").as("compname"),
          when(col("l_returnflag") === "R", "Frequent")
            .when(col("l_returnflag") === "A", "None")
            .otherwise("Rare").as("flodfreqdcd"))
        Graft.soilMap(ssurgoTables(s, dir) + ("component" -> component),
          domains = Map("flooding_frequency_class" ->
            Seq("None", "Very rare", "Rare", "Occasional", "Frequent", "Very frequent")))(
          SdvAttribute("Flooding Frequency - Maximum", "component", "flodfreqdcd",
            "rating", "Choice", "Dominant Condition", complevelattribflag = 1,
            tiebreakdomainname = None))
      },
      Some(withCtes(
        graft.analog.OracleSql.dcd("scfl"),
        """scfl AS (
          |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
          |         CAST(l_orderkey AS VARCHAR) AS mukey,
          |         CAST(l_quantity AS DOUBLE) AS comppct,
          |         CASE l_returnflag WHEN 'R' THEN 'Frequent' WHEN 'A' THEN 'None'
          |                           ELSE 'Rare' END AS rating,
          |         CASE l_returnflag WHEN 'R' THEN 5.0 WHEN 'A' THEN 1.0
          |                           ELSE 3.0 END AS ord
          |  FROM lineitem)""".stripMargin,
        graft.analog.OracleSql.dcdBr("scfl")))),

    // bFuzzy through the planner (GetSDVAtts :3719-3740): the user
    // asks to rate an interpretation by its FUZZY value, so the
    // planner must swap the attribute column to INTERPHR (and Float)
    // while keeping the catalog row's aggregation; the cointerp branch
    // also applies the ruledepth=0 and rulename filters. The oracle
    // computes the weighted average over interphr directly — a missed
    // column swap would aggregate the class column and die, a missed
    // rule filter changes every mean.
    Q("p06_planner_fuzzy",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val cointerp = l.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cokey"),
          lit("mr1").as("mrulekey"),
          when(col("l_returnflag") === "N", "Bar").otherwise("Foo").as("rulename"),
          when(col("l_linenumber") === 7, 1).otherwise(0).as("ruledepth"),
          when(col("l_linenumber") === 6, "Limited").otherwise("Not limited").as("interpllc"),
          Exprs.cents(col("l_discount")).as("interphr"))
        Graft.soilMap(ssurgoTables(s, dir) + ("cointerp" -> cointerp))(
          SdvAttribute("Interp fuzzy", "cointerp", "interpllc", "rating",
            "Choice", "Weighted Average", complevelattribflag = 1,
            nasisrulename = Some("Foo")),
          SdvRequest(cutOff = 5, bFuzzy = true))
      },
      Some(withCtes(
        // component and cointerp are SEPARATE relations joined on
        // cokey (which the analog data makes non-unique — a
        // single-table shortcut here would silently cross-pair
        // comppct and rulename from different rows)
        """SELECT mukey, floor((sum(comppct*rating)/sum(comppct))*1e4 + 0.5)/1e4 AS rating,
          |       sum(comppct) AS comppct
          |FROM scof JOIN scif USING (cokey) GROUP BY mukey""".stripMargin,
        """scof AS (
          |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
          |         CAST(l_orderkey AS VARCHAR) AS mukey,
          |         CAST(l_quantity AS DOUBLE) AS comppct
          |  FROM lineitem WHERE l_quantity >= 5)""".stripMargin,
        """scif AS (
          |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
          |         floor(l_discount*100 + 0.5) AS rating
          |  FROM lineitem WHERE l_linenumber <> 7 AND l_returnflag <> 'N')""".stripMargin))),

    // F3' — the bZero null-as-class branch of the property Dominant
    // Condition (AggregateCo_DCD_Domain, gSSURGO_CreateSoilMap.py:
    // 7375-7383): with bZero ON, components whose Choice rating is NULL
    // stay in the aggregation as their own condition class — ranked
    // after every domain value under tiebreak-Low, before them under
    // High (:7458-7467) — and can WIN the mapunit (rating = NULL rows
    // in the output). With bZero OFF they are excluded. Three legs
    // through the same catalog row pin all three behaviors; the repo's
    // former zero-fill would emit a '0.0' class and fail every leg.
    Q("p07_planner_dcd_null_class",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val component = l.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cokey"),
          col("l_orderkey").cast("string").as("mukey"),
          col("l_quantity").cast("int").as("comppct_r"),
          lit("Alpha").as("compname"),
          when(col("l_returnflag") === "R", "Rare")
            .when(col("l_returnflag") === "A", "Occasional").as("draincl"))
        val t = ssurgoTables(s, dir) + ("component" -> component)
        val dom = Map("drainage" -> Seq("Rare", "Occasional", "Frequent"))
        val att = SdvAttribute("Drainage", "component", "draincl", "rating",
          "Choice", "Dominant Condition", complevelattribflag = 1,
          tiebreakdomainname = Some("drainage"))
        // one shareBase planner for all three legs: the mapunit⟕component
        // join materializes once instead of once per variant (the
        // soilMaps batch-loop shape; output identical)
        val planner = new graft.sdv.SdvPlanner(t, dom, shareBase = true)
        def leg(tag: String, req: SdvRequest) =
          planner.plan(graft.schema.SdvCatalog.normalize(att), req)
            .withColumn("variant", lit(tag))
        leg("zon_low", SdvRequest(bZero = true))
          .unionByName(leg("zon_high", SdvRequest(bZero = true, tieLow = Some(false))))
          .unionByName(leg("zoff_low", SdvRequest()))
      },
      Some(withCtes(
        Seq(("zon_low", "ASC"), ("zon_high", "DESC"), ("zoff_low", "ASC"))
          .map { case (tag, d) =>
            graft.analog.OracleSql.dcd(s"src_$tag", tieLow = d == "ASC", br = s"br_$tag")
              .replace("SELECT w.mukey,", s"SELECT w.mukey, '$tag' AS variant,")
          }.mkString("\nUNION ALL\n"),
        // bZero legs keep the NULL-rating rows; null ord = 4 (after the
        // 3-value domain) under Low, 0 (before it) under High
        """src_zon_low AS (
          |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
          |         CAST(l_orderkey AS VARCHAR) AS mukey,
          |         CAST(l_quantity AS DOUBLE) AS comppct,
          |         CASE l_returnflag WHEN 'R' THEN 'Rare' WHEN 'A' THEN 'Occasional' END AS rating,
          |         CASE l_returnflag WHEN 'R' THEN 1.0 WHEN 'A' THEN 2.0 ELSE 4.0 END AS ord
          |  FROM lineitem)""".stripMargin,
        """src_zon_high AS (
          |  SELECT cokey, mukey, comppct, rating,
          |         CASE WHEN rating IS NULL THEN 0.0 ELSE ord END AS ord
          |  FROM src_zon_low)""".stripMargin,
        "src_zoff_low AS (SELECT * FROM src_zon_low WHERE rating IS NOT NULL)",
        graft.analog.OracleSql.dcdBr("src_zon_low", "br_zon_low"),
        graft.analog.OracleSql.dcdBr("src_zon_high", "br_zon_high"),
        graft.analog.OracleSql.dcdBr("src_zoff_low", "br_zoff_low")))),

    // Reference-exact fldPrecision (fldPrecision = max(0,
    // attributeprecision), rounding at :4871 DCP / :8115 WTA): a
    // catalog row carrying attributeprecision = 0 must emit INTEGER
    // ratings with the half-up tiebreak pinned on both engine sides
    // (Exprs.roundHalfUp ≡ floor(x + 0.5) — Spark's BigDecimal round
    // and DuckDB's double round disagree on decimal .5 boundaries,
    // which integer precision hits constantly). Two legs: the WTA
    // mean (integral-cents ratio → fractional mean) and the DCP pick
    // over exact binary quarters (x.25/x.5/x.75), where rounding
    // happens AFTER the pick.
    Q("p08_planner_int_precision",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val component = l.select(
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("string").as("cokey"),
          col("l_orderkey").cast("string").as("mukey"),
          col("l_quantity").cast("int").as("comppct_r"),
          lit("Alpha").as("compname"),
          Exprs.cents(col("l_extendedprice")).as("price_cents"),
          (Exprs.cents(col("l_extendedprice")) / 4).as("price_q"))
        val t = ssurgoTables(s, dir) + ("component" -> component)
        def leg(tag: String, attCol: String, alg: String) =
          Graft.soilMap(t)(
            SdvAttribute("Price", "component", attCol, "rating",
              "Float", alg, complevelattribflag = 1,
              attributeprecision = Some(0)),
            SdvRequest(cutOff = 5)).withColumn("variant", lit(tag))
        leg("wta", "price_cents", "Weighted Average")
          .unionByName(leg("dcp", "price_q", "Dominant Component"))
      },
      Some(withCtes(
        """SELECT 'wta' AS variant, mukey,
          |       floor((sum(comppct*rating)/sum(comppct)) + 0.5) AS rating,
          |       sum(comppct) AS comppct
          |FROM pint GROUP BY mukey
          |UNION ALL
          |SELECT 'dcp' AS variant, mukey, floor(rating/4 + 0.5) AS rating, comppct
          |FROM (SELECT mukey, rating, comppct,
          |        row_number() OVER (PARTITION BY mukey
          |          ORDER BY comppct DESC, rating/4 ASC, cokey DESC) AS rn
          |      FROM pint) t WHERE rn = 1""".stripMargin,
        """pint AS (
          |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
          |         CAST(l_orderkey AS VARCHAR) AS mukey,
          |         CAST(l_quantity AS DOUBLE) AS comppct,
          |         floor(l_extendedprice*100 + 0.5) AS rating
          |  FROM lineitem WHERE l_quantity >= 5)""".stripMargin))),

    // The catalog-sweep dispatch (CreateSoilMaps batch loop +
    // MergeRatingTables, gSSURGO_CreateSoilMaps.py + the :10612-10918
    // dispatch): a MULTI-ROW sdvattribute catalog — one row per
    // (algorithm × level-flag) combination the fixture tables support —
    // runs through Graft.soilMaps into ONE wide merged table. This pins
    // the dispatch table itself (column swaps, level routing, rename
    // plumbing), not just each algorithm in isolation.
    Q("p09_planner_catalog_sweep",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val mucropyld = l.select(
          col("l_orderkey").cast("string").as("mukey"),
          when(col("l_linenumber") <= 2, "Corn").otherwise("Soybeans").as("cropname"),
          col("l_quantity").cast("double").as("nonirryield_r"))
        val t = ssurgoTables(s, dir) + ("mucropyld" -> mucropyld)
        val dom = Map("flags" -> Seq("R", "A", "N"))
        def comp(att: String, res: String, dt: String, alg: String) =
          SdvAttribute(res, "component", att, res, dt, alg,
            complevelattribflag = 1,
            tiebreakdomainname = if (dt == "Choice") Some("flags") else None)
        val catalog = Seq(
          comp("price_cents", "dcp_price", "Float", "Dominant Component"),
          comp("flag", "dcd_flag", "Choice", "Dominant Condition"),
          comp("price_cents", "wta_price", "Float", "Weighted Average"),
          comp("flag", "minmax_flag", "Choice", "Minimum or Maximum"),
          SdvAttribute("Crop yield", "mucropyld", "nonirryield_r", "nonirryield",
            "Float", "No Aggregation Necessary",
            sqlwhereclause = Some("cropname = 'Corn'")),
          comp("price_cents", "pp_pct", "Float", "Percent Present"))
        Graft.soilMaps(t, dom)(catalog.map(a => (a, SdvRequest())))
      },
      Some(withCtes(
        """SELECT m.mukey, dcp_price, dcd_flag, wta_price, minmax_flag,
          |       nonirryield, coalesce(pp_pct, 0.0) AS pp_pct
          |FROM (SELECT CAST(o_orderkey AS VARCHAR) AS mukey FROM orders) m
          |LEFT JOIN (SELECT mukey, rating AS dcp_price FROM (
          |    SELECT mukey, rating, row_number() OVER (PARTITION BY mukey
          |      ORDER BY comppct DESC, rating ASC, cokey DESC) AS rn
          |    FROM swsrc) WHERE rn = 1) q1 ON m.mukey = q1.mukey
          |LEFT JOIN (SELECT mukey, rating AS dcd_flag
          |           FROM (""".stripMargin +
        graft.analog.OracleSql.dcd("swflag", br = "br_sweep") +
        """) ) q2 ON m.mukey = q2.mukey
          |LEFT JOIN (SELECT mukey,
          |    floor((sum(comppct*rating)/sum(comppct))*1e4 + 0.5)/1e4 AS wta_price
          |  FROM swsrc GROUP BY mukey) q3 ON m.mukey = q3.mukey
          |LEFT JOIN (SELECT mukey, rating AS minmax_flag FROM (
          |    SELECT mukey, rating, row_number() OVER (PARTITION BY mukey
          |      ORDER BY ord ASC, rating ASC) AS rn
          |    FROM swflag) WHERE rn = 1) q4 ON m.mukey = q4.mukey
          |LEFT JOIN (SELECT CAST(l_orderkey AS VARCHAR) AS mukey,
          |    round(CAST(l_quantity AS DOUBLE), 2) AS nonirryield
          |  FROM lineitem WHERE l_linenumber <= 2) q5 ON m.mukey = q5.mukey
          |LEFT JOIN (SELECT mukey, sum(comppct) AS pp_pct
          |  FROM swsrc GROUP BY mukey) q6 ON m.mukey = q6.mukey""".stripMargin,
        """swsrc AS (
          |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
          |         CAST(l_orderkey AS VARCHAR) AS mukey,
          |         CAST(l_quantity AS DOUBLE) AS comppct,
          |         floor(l_extendedprice*100 + 0.5) AS rating
          |  FROM lineitem)""".stripMargin,
        """swflag AS (
          |  SELECT CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS cokey,
          |         CAST(l_orderkey AS VARCHAR) AS mukey,
          |         CAST(l_quantity AS DOUBLE) AS comppct,
          |         l_returnflag AS rating,
          |         CASE l_returnflag WHEN 'R' THEN 1.0 WHEN 'A' THEN 2.0
          |                           WHEN 'N' THEN 3.0 ELSE 4.0 END AS ord
          |  FROM lineitem)""".stripMargin,
        graft.analog.OracleSql.dcdBr("swflag", "br_sweep")))),

    // R2 raster-path acreage: cell counts × cell acres per rating class
    // (gSSURGO_AcreageReport.py:186-243, raster branch).
    Q("r03_raster_acreage",
      (s, dir) => {
        val cells = graft.analog.Analog.comp(s, dir)
          .select(col("cokey").as("cellvalue"), col("mukey"))
        val rating = SdvAgg.dominantComponent(graft.analog.Analog.compChoice(s, dir))
          .select(col("mukey"), col("rating"))
        cells.join(rating, Seq("mukey"))
          .groupBy(col("rating"))
          .agg(Exprs.roundHalfUp(count(lit(1)) * 0.222, 2).as("acres"),
            count(lit(1)).as("n_cells"))
      },
      Some(withCtes(
        s"""SELECT d.rating, floor((count(*) * 0.222)*1e2 + 0.5)/1e2 AS acres,
           |       count(*) AS n_cells
           |FROM comp c JOIN dcp d ON c.mukey = d.mukey
           |GROUP BY d.rating""".stripMargin,
        graft.analog.Analog.compCte,
        "compc AS (SELECT mukey, cokey, comppct, crating AS rating, cord AS ord FROM comp)",
        s"dcp AS (${graft.analog.OracleSql.dcp("compc")})"))))
}
