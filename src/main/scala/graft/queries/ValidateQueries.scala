package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.analog.Analog._
import graft.sdv.SdvAgg
import graft.streaming.Ingest
import graft.validate.Validate

/** Validation invariants (SURVEY §5) + the streaming rollup's batch
  * twin. */
object ValidateQueries extends QuerySet {

  val all: Seq[Q] = Seq(

    // §5.2 — horizon gap/overlap detection
    // (gSSURGO_ValidateData.py:600-606); the analog horizons get a
    // 5 cm gap injected so every multi-horizon component trips it.
    Q("val01_horizon_gaps",
      (s, dir) => Validate.horizonGaps(
        hz(s, dir).select(col("cokey"), col("hzdept"),
          (col("hzdept") + 25).as("hzdepb"))),
      Some(withCtes(
        """SELECT cokey, hzdept, prev_depb FROM (
          |  SELECT cokey, hzdept,
          |         lag(hzdepb) OVER (PARTITION BY cokey ORDER BY hzdept) AS prev_depb
          |  FROM (SELECT cokey, hzdept, hzdept + 25 AS hzdepb FROM hz) g) t
          |WHERE prev_depb IS NOT NULL AND prev_depb <> hzdept""".stripMargin, hzCte))),

    // §5.2 — Σ comppct ∈ [75,100] per mapunit
    // (gSSURGO_ValidateData.py:624-636): violations reported.
    Q("val02_comppct_bounds",
      (s, dir) => Validate.comppctBounds(comp(s, dir)),
      Some(withCtes(
        """SELECT mukey, sum(comppct) AS sumpct FROM comp GROUP BY mukey
          |HAVING sum(comppct) < 75 OR sum(comppct) > 100""".stripMargin, compCte))),

    // R7 — BadTable rating-cardinality check
    // (gSSURGO_CreateSoilMap.py:433-454).
    Q("val03_rating_cardinality",
      (s, dir) => Validate.ratingCardinality(
        SdvAgg.weightedAverage(compNumeric(s, dir)), baseMu(s, dir)),
      Some(withCtes(
        """SELECT (SELECT count(DISTINCT mukey) FROM comp) AS n_rating,
          |       (SELECT count(*) FROM orders) AS n_mapunit,
          |       (SELECT count(DISTINCT mukey) FROM comp) = (SELECT count(*) FROM orders) AS ok""".stripMargin,
        compCte))),

    // §5.1 — count reconciliation vs an authority snapshot
    // (SSURGO_CheckgSSURGO.py:449-1489). region/nation are
    // SF-invariant (authoritative 5/25); events carries a deliberately
    // wrong expectation and supplier none, so all three ok-outcomes are
    // exercised at every scale factor.
    Q("val04_count_reconcile",
      (s, dir) => Validate.countReconcile(
        Map(
          "region" -> Tables.load(s, dir, "region"),
          "nation" -> Tables.load(s, dir, "nation"),
          "events" -> Tables.events(s, dir),
          "supplier" -> Tables.load(s, dir, "supplier")),
        Map("region" -> 5L, "nation" -> 25L, "events" -> 0L)),
      Some(
        """SELECT 'events' AS tbl, (SELECT count(*) FROM events) AS n_actual,
          |       CAST(0 AS BIGINT) AS n_expected, (SELECT count(*) FROM events) = 0 AS ok
          |UNION ALL
          |SELECT 'nation', (SELECT count(*) FROM nation),
          |       CAST(25 AS BIGINT), (SELECT count(*) FROM nation) = 25
          |UNION ALL
          |SELECT 'region', (SELECT count(*) FROM region),
          |       CAST(5 AS BIGINT), (SELECT count(*) FROM region) = 5
          |UNION ALL
          |SELECT 'supplier', (SELECT count(*) FROM supplier),
          |       CAST(NULL AS BIGINT), false""".stripMargin)),

    // Stateful sessionization — batch twin of
    // graft.streaming.Sessionize.sessionizeStream
    // (flatMapGroupsWithState); 30-min gap sessions per user. The
    // oracle expresses the same fold as lag + cumulative session ids.
    Q("st02_sessionize",
      (s, dir) => {
        import graft.streaming.Sessionize
        Sessionize.sessionizeBatch(
          Sessionize.fromEvents(s, Tables.events(s, dir)))
          .toDF().select(col("user_id"), col("start_ms"), col("end_ms"),
            col("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms FROM events),
             |x AS (SELECT user_id, ts_ms,
             |        CASE WHEN lag(ts_ms) OVER w IS NULL
             |               OR ts_ms - lag(ts_ms) OVER w > 1800000
             |             THEN 1 ELSE 0 END AS new_sess
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
             |y AS (SELECT user_id, ts_ms,
             |        sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms
             |          ROWS UNBOUNDED PRECEDING) AS sid
             |      FROM x)
             |SELECT user_id, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
             |       count(*) AS n_events
             |FROM y GROUP BY user_id, sid""".stripMargin)),

    // Streaming ingestion rollup — batch twin of
    // graft.streaming.Ingest.streamHourlyRollup (same shared transform;
    // the watermarked streaming wrapper is exercised in the test suite).
    Q("st01_stream_hourly_rollup",
      (s, dir) => Ingest.hourlyRollup(Tables.events(s, dir))
        .select(unix_timestamp(col("hour")).as("hour_epoch"), col("event_type"),
          col("n_events"), col("sum_value")),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             |       event_type, count(*) AS n_events,
             |       round(sum(floor(value*100 + 0.5))/100.0, 2) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Streaming ingestion dedup — batch twin of
    // graft.streaming.Ingest.streamDedup (watermark-bounded
    // dropDuplicatesWithinWatermark; the streaming wrapper's key-set
    // equivalence is exercised in StreamingSpec). First-arrival time
    // and duplicate count are the deterministic summary the stream's
    // surviving-payload choice cannot provide.
    Q("st03_stream_dedup",
      (s, dir) => Ingest.firstArrival(Tables.events(s, dir)),
      Some("""SELECT user_id, event_type, floor(value*100 + 0.5) AS value_cents,
             |       min(CAST(epoch_ms(ts) AS BIGINT)) AS first_ms,
             |       count(*) AS n_dups
             |FROM events GROUP BY 1, 2, 3""".stripMargin)),

    // §5.1' — referential-integrity orphan report across the FK
    // hierarchy (gSSURGO_ValidateData.py's child-without-parent walk,
    // generalized): one anti-join per edge, a one-row summary each.
    // The customer→nation edge checks against a deliberately TRUNCATED
    // authority (nations < 20) so the orphan path is non-vacuous at
    // every SF — the val04 deliberate-wrongness pattern.
    Q("val05_fk_orphans",
      (s, dir) => {
        def edge(tag: String, child: org.apache.spark.sql.DataFrame, fk: String,
            parent: org.apache.spark.sql.DataFrame, pk: String) = {
          val orphans = child.select(col(fk).as("__k"))
            .join(parent.select(col(pk).as("__k")), Seq("__k"), "left_anti")
          child.agg(count(lit(1)).as("n_child"))
            .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
            .select(lit(tag).as("edge"), col("n_child"), col("n_orphans"),
              (col("n_orphans") === 0).as("ok"))
        }
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        edge("lineitem->orders", Tables.load(s, dir, "lineitem"), "l_orderkey",
            Tables.load(s, dir, "orders"), "o_orderkey")
          .unionByName(edge("orders->customer", Tables.load(s, dir, "orders"),
            "o_custkey", c, "c_custkey"))
          .unionByName(edge("customer->nation20", c, "c_nationkey",
            n.filter(col("n_nationkey") < 20), "n_nationkey"))
          .unionByName(edge("nation->region", n, "n_regionkey",
            Tables.load(s, dir, "region"), "r_regionkey"))
      },
      Some("""SELECT 'lineitem->orders' AS edge,
             |  (SELECT count(*) FROM lineitem) AS n_child,
             |  (SELECT count(*) FROM lineitem
             |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans,
             |  (SELECT count(*) FROM lineitem
             |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0 AS ok
             |UNION ALL
             |SELECT 'orders->customer',
             |  (SELECT count(*) FROM orders),
             |  (SELECT count(*) FROM orders
             |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)),
             |  (SELECT count(*) FROM orders
             |   WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
             |UNION ALL
             |SELECT 'customer->nation20',
             |  (SELECT count(*) FROM customer),
             |  (SELECT count(*) FROM customer
             |   WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 20)),
             |  (SELECT count(*) FROM customer
             |   WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_nationkey < 20)) = 0
             |UNION ALL
             |SELECT 'nation->region',
             |  (SELECT count(*) FROM nation),
             |  (SELECT count(*) FROM nation
             |   WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region)),
             |  (SELECT count(*) FROM nation
             |   WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region)) = 0""".stripMargin)),

    // VAL6 — snapshot distribution-drift monitor (Validate
    // .distributionDrift): exact χ²-style drift between two vintages'
    // value histograms, the pre-mix check a training pipeline runs on
    // every corpus drop (a silent upstream change shifts distributions
    // long before it breaks schemas). The "current" vintage is the
    // purchase slice with cents DOUBLED — a deterministic planted
    // inflation, so the drift is strictly positive at every SF and the
    // oracle replays the plant, both histograms, and the nano-quantized
    // contribution sum exactly (integer-only output; the one division
    // chain is IEEE +,−,×,÷ — no libm).
    Q("val06_snapshot_drift",
      (s, dir) => {
        val e = Tables.events(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"),
            graft.core.Exprs.cents(col("value")).cast("long").as("cents"))
        graft.validate.Validate.distributionDrift(
          e.filter(col("event_type") === "view").select(col("cents").as("v")),
          e.filter(col("event_type") === "purchase")
            .select((col("cents") * 2L).as("v")),
          "v", bucketWidth = 2000L, maxBucket = 27)
      },
      Some("""WITH e AS (SELECT event_type,
             |            CAST(floor(value*100 + 0.5) AS BIGINT) AS cents
             |          FROM events WHERE value IS NOT NULL),
             |r AS (SELECT least(cents//2000, 27) AS bucket, count(*) AS n_ref
             |      FROM e WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT least((cents*2)//2000, 27) AS bucket, count(*) AS n_cur
             |      FROM e WHERE event_type = 'purchase' GROUP BY 1),
             |j AS (SELECT coalesce(r.bucket, c.bucket) AS bucket,
             |             coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
             |      FROM r FULL JOIN c ON r.bucket = c.bucket),
             |t AS (SELECT *, sum(n_ref) OVER () AS tr, sum(n_cur) OVER () AS tc
             |      FROM j),
             |x AS (SELECT bucket, n_ref, n_cur,
             |        CAST(floor(
             |          (n_ref/CAST(tr AS DOUBLE) - n_cur/CAST(tc AS DOUBLE))
             |          * (n_ref/CAST(tr AS DOUBLE) - n_cur/CAST(tc AS DOUBLE))
             |          / (n_ref/CAST(tr AS DOUBLE) + n_cur/CAST(tc AS DOUBLE))
             |          * 1e9 + 0.5) AS BIGINT) AS contrib_nano
             |      FROM t)
             |SELECT bucket, n_ref, n_cur, contrib_nano,
             |       CAST(sum(contrib_nano) OVER () AS BIGINT) AS drift_nano
             |FROM x""".stripMargin)),

    // VAL7 — restriction-depth vs horizon-top invariant
    // (gSSURGO_ValidateData.py:313-333 restriction depths, :559-566
    // removal of depths matching a horizon hzdept_r; survivors are the
    // violations). The restriction analog plants one on-grid depth
    // (matches iff the order has enough lineitems — mixed outcomes)
    // and one off-grid depth (+15 — always a violation, non-vacuous at
    // every SF); one anti-join on (cokey, depth), no shuffle beyond it.
    Q("val07_restriction_depth",
      (s, dir) => Validate.restrictionDepthMismatch(
        restr(s, dir), hz(s, dir)),
      Some(withCtes(
        """SELECT r.cokey, r.resdept FROM restr r
          |WHERE NOT EXISTS (SELECT 1 FROM hz h
          |                  WHERE h.cokey = r.cokey AND h.hzdept = r.resdept)""".stripMargin,
        hzCte, restrCte))),

    // VAL8 — components-with-no-horizons
    // (gSSURGO_ValidateData.py:536-541, :466-471: a component whose
    // horizon lookup comes up empty is a violation UNLESS compname ∈
    // {NOTCOM, NOTPUB} or compkind = 'Miscellaneous area'). The horizon
    // side is deliberately truncated to hzdept ≥ 30 (dropping every
    // first horizon), so single-lineitem orders become components with
    // no horizons at every SF; the %17/%19 name/kind plants exercise
    // all three exclusion arms.
    Q("val08_components_no_horizons",
      (s, dir) => Validate.componentsNoHorizons(
        coKind(s, dir),
        hz(s, dir).filter(col("hzdept") >= 30)),
      Some(withCtes(
        """SELECT c.cokey, c.compname, c.compkind FROM cokind c
          |WHERE NOT (c.compname IN ('NOTCOM', 'NOTPUB')
          |           OR c.compkind = 'Miscellaneous area')
          |  AND NOT EXISTS (SELECT 1 FROM hz h
          |                  WHERE h.cokey = c.cokey AND h.hzdept >= 30)""".stripMargin,
        hzCte, coKindCte))))

  /** st01/st02/st03 register their BATCH twins directly (the streaming
    * wrappers live in StreamingSpec), so the queries themselves are the
    * batch-side plans — constructible without any stream lifecycle. */
  override def stBatchPlans
      : Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.filter(_.name.startsWith("st")).map(q => q.name -> q.fn).toMap
}
