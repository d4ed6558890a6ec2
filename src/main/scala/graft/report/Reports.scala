package graft.report

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Exprs, Ranked}

/** Report operators (SURVEY.md §2.6). */
object Reports {

  /** R1 — GetDominantComponent.py:89-117: per mapunit the first cokey
    * under ORDER BY comppct DESC, cokey DESC. */
  def dominantComponentKey(comp: DataFrame): DataFrame =
    Ranked.argmax(comp, Seq("mukey"),
      Seq(col("comppct"), col("cokey")),
      Seq("cokey" -> col("cokey")))

  /** R2/R3 — CalculateAcres (gSSURGO_AcreageReport.py:186-327): Σ area
    * per rating class (null → 'Not rated'), scaled by the acre
    * conversion, with the domain ordinal for display order. */
  def acreage(rating: DataFrame, areas: DataFrame, conv: Double,
      domain: Seq[String], scale: Int = 2): DataFrame =
    rating.join(areas, "mukey")
      .groupBy(coalesce(col("rating"), lit("Not rated")).as("rating"))
      .agg(Exprs.roundHalfUp(sum(col("area")) * lit(conv) / lit(100), scale).as("acres"))
      .withColumn("rank", Exprs.domainRank(col("rating"), domain))

  /** R9 semantic core — the classified-legend color math of
    * gSSURGO_CreateSoilMap.py:512-591 (ColorRamp) /
    * BezierColorRamp.py:213-279: `n` equal-interval classes over the
    * rating's [min, max] with a progressive two-color ramp. With two
    * control points the reference's Bezier degenerates to degree-1
    * Bernstein weights, i.e. per-channel linear interpolation with the
    * reference's per-summand int() truncation:
    * c_i = ⌊(1−t)·lo⌋ + ⌊t·hi⌋, t = i/(n−1)
    * (BezierColorRamp.py:159-199). Class membership is
    * ⌊(v−vmin)/w⌋ capped at n−1 (w = (vmax−vmin)/n) — every step is a
    * single IEEE754 op on identically-derived operands, so membership
    * is engine-exact.
    *
    * Plan: the (vmin, vmax) aggregate is ONE row, broadcast to both the
    * membership pass and the class axis (spark.range(n)); the only
    * shuffle is the partial-aggregating per-class count. Empty classes
    * still emit (n_units = 0) — a legend lists every class. Null
    * ratings are excluded — they belong to the 'Not rated' legend row
    * ([[acreage]]'s coalesce), not a numeric class (and Spark's
    * null-skipping least() would otherwise silently file them under
    * the TOP class).
    * Returns (class_idx, lo, hi, r, g, b, n_units). */
  def legendColorRamp(rating: DataFrame, valueCol: String, n: Int,
      lower: (Int, Int, Int), upper: (Int, Int, Int)): DataFrame = {
    require(n >= 1, "legendColorRamp: need at least one class")
    val spark = rating.sparkSession
    val rated = rating.filter(col(valueCol).isNotNull)
    val stats = rated.agg(min(col(valueCol)).cast("double").as("vmin"),
      max(col(valueCol)).cast("double").as("vmax"))
    val w = (col("vmax") - col("vmin")) / n
    def chan(lo: Int, hi: Int): Column = {
      val t = if (n == 1) lit(0.0)
        else col("class_idx").cast("double") / (n - 1)
      (floor((lit(1.0) - t) * lo) + floor(t * hi)).cast("long")
    }
    val counts = rated.crossJoin(broadcast(stats))
      .select(when(col("vmax") === col("vmin"), lit(0L))
        .otherwise(least(floor((col(valueCol) - col("vmin")) / w), lit((n - 1).toLong)))
        .as("class_idx"))
      .groupBy(col("class_idx")).agg(count(lit(1)).as("n_units"))
    spark.range(n).select(col("id").as("class_idx"))
      .crossJoin(broadcast(stats))
      .join(counts, Seq("class_idx"), "left")
      .select(col("class_idx"),
        Exprs.roundHalfUp(col("vmin") + col("class_idx") * w, 4).as("lo"),
        Exprs.roundHalfUp(col("vmin") + (col("class_idx") + 1) * w, 4).as("hi"),
        chan(lower._1, upper._1).as("r"),
        chan(lower._2, upper._2).as("g"),
        chan(lower._3, upper._3).as("b"),
        coalesce(col("n_units"), lit(0L)).as("n_units"))
  }
}
