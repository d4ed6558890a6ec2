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

    // Streaming ingestion rollup — batch twin of
    // graft.streaming.Ingest.streamHourlyRollup (same shared transform;
    // the watermarked streaming wrapper is exercised in the test suite).
    Q("st01_stream_hourly_rollup",
      (s, dir) => Ingest.hourlyRollup(Tables.events(s, dir))
        .select(unix_timestamp(col("hour")).as("hour_epoch"), col("event_type"),
          col("n_events"), col("sum_value")),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
             |       event_type, count(*) AS n_events,
             |       round(sum(round(value*100))/100.0, 2) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)))
}
