package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.events.EventOps

/** Temporal event operators: as-of join and rolling range windows.
  * Timestamps follow the repo convention — nanos parquet → microsecond
  * TimestampType via Tables.events, compared as truncated epoch-ms
  * BIGINTs; money as exact cents. */
object EventQueries extends QuerySet {

  /** Shared events projection: truncated epoch-ms + the repo's
    * exact-cents encoding (Exprs.cents — single source of the money
    * rule, same as streaming/Ingest). */
  private def evts(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"), unix_millis(col("ts")).as("ts_ms"),
      graft.core.Exprs.cents(col("value")).cast("long").as("value_cents"))

  private val eCte =
    """e AS (SELECT event_id, user_id, event_type,
      |             CAST(epoch_ms(ts) AS BIGINT) AS ts_ms,
      |             CAST(round(value*100) AS BIGINT) AS value_cents
      |      FROM events)""".stripMargin

  val all: Seq[Q] = Seq(

    // E1 — backward as-of join: each click picks the latest view (same
    // user, ts ≤ click ts) via the union-scan formulation — one shuffle
    // on user_id, a running last(ignoreNulls); never a range cross-join.
    Q("e01_asof_join",
      (s, dir) => {
        val e = evts(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts_ms")
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ms"), col("event_id"), col("value_cents"))
        EventOps.asOfJoin(clicks, views, "user_id", "ts_ms",
          tie = "event_id", payload = "value_cents", out = "last_view_cents")
      },
      Some(s"""WITH $eCte,
              |u AS (
              |  SELECT event_id, user_id, ts_ms, 1 AS side,
              |         CAST(NULL AS BIGINT) AS p, CAST(NULL AS BIGINT) AS tie
              |  FROM e WHERE event_type = 'click'
              |  UNION ALL
              |  SELECT event_id, user_id, ts_ms, 0, value_cents, event_id
              |  FROM e WHERE event_type = 'view'),
              |x AS (SELECT *, last_value(CASE WHEN side = 0 THEN struct_pack(v := p) END
              |          IGNORE NULLS) OVER (
              |        PARTITION BY user_id
              |        ORDER BY ts_ms NULLS FIRST, side, tie NULLS FIRST
              |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
              |      FROM u)
              |SELECT event_id, user_id, ts_ms, struct_extract(m, 'v') AS last_view_cents
              |FROM x WHERE side = 1""".stripMargin)),

    // E2 — per-user trailing-1h rolling count and value sum. RANGE
    // framing is value-based, so timestamp ties see identical frames —
    // deterministic; cents keep the sum integer-exact.
    Q("e02_rolling_window",
      (s, dir) => {
        val e = evts(s, dir).drop("event_type")
        EventOps.rollingRange(e, "user_id", "ts_ms", 3600000L, Seq(
            count(lit(1)) -> "n_1h",
            sum(col("value_cents")) -> "sum_cents_1h"))
          .select(col("event_id"), col("user_id"), col("ts_ms"), col("n_1h"),
            (col("sum_cents_1h") / 100.0).as("sum_value_1h"))
      },
      Some(s"""WITH $eCte
              |SELECT event_id, user_id, ts_ms,
              |       count(*) OVER w AS n_1h,
              |       CAST(sum(value_cents) OVER w AS BIGINT)/100.0 AS sum_value_1h
              |FROM e
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
              |             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""".stripMargin)))
}
