package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality invariants (SURVEY §5; reference gSSURGO_ValidateData.py
  * + SSURGO_CheckgSSURGO.py). Each check returns the VIOLATION rows. */
object Validate {

  /** Horizon gap/overlap per component: consecutive horizons must tile
    * (hzdept == previous hzdepb; gSSURGO_ValidateData.py:600-606). */
  def horizonGaps(hz: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cokey")).orderBy(col("hzdept"))
    hz.select(col("cokey"), col("hzdept"), col("hzdepb"))
      .withColumn("prev_depb", lag(col("hzdepb"), 1).over(w))
      .filter(col("prev_depb").isNotNull && col("prev_depb") =!= col("hzdept"))
      .select(col("cokey"), col("hzdept"), col("prev_depb"))
  }

  /** Σ comppct per mapunit must lie in [lo, hi]
    * (gSSURGO_ValidateData.py:624-636). */
  def comppctBounds(comp: DataFrame, lo: Double = 75, hi: Double = 100): DataFrame =
    comp.groupBy(col("mukey")).agg(sum(col("comppct")).as("sumpct"))
      .filter(col("sumpct") < lo || col("sumpct") > hi)

  /** Parents with no children (anti-join; mapunits-without-components /
    * components-without-horizons, gSSURGO_ValidateData.py:536-541). */
  def orphans(parent: DataFrame, child: DataFrame, key: String): DataFrame =
    parent.join(child, Seq(key), "left_anti")

  /** Restriction-depth vs horizon-top invariant
    * (gSSURGO_ValidateData.py:313-333 builds the per-component
    * restriction-depth list from corestrictions.resdept_r, null depths
    * excluded; :559-566 removes every depth that equals some horizon's
    * hzdept_r — the survivors are the violations it reports). One
    * anti-join on (cokey, depth): a restriction depth with NO matching
    * horizon top in its component survives. `restr` carries
    * (cokey, resdept); `hz` (cokey, hzdept). Returns the violating
    * (cokey, resdept) rows. */
  def restrictionDepthMismatch(restr: DataFrame, hz: DataFrame): DataFrame =
    restr.select(col("cokey"), col("resdept"))
      .filter(col("resdept").isNotNull)
      .join(hz.select(col("cokey"), col("hzdept").as("resdept")).distinct(),
        Seq("cokey", "resdept"), "left_anti")

  /** Components-with-no-horizons check (gSSURGO_ValidateData.py:536-541
    * declares the coNoHz list; :466-471 fills it on the horizon-lookup
    * KeyError UNLESS compname ∈ {NOTCOM, NOTPUB} or compkind =
    * 'Miscellaneous area' — those legitimately carry no horizon data).
    * `comp` needs (cokey, compname, compkind); `hz` (cokey, ...).
    * Returns the violating component rows. */
  def componentsNoHorizons(comp: DataFrame, hz: DataFrame): DataFrame =
    comp.filter(!(col("compname").isin("NOTCOM", "NOTPUB") ||
        col("compkind") === "Miscellaneous area"))
      .join(hz.select(col("cokey")).distinct(), Seq("cokey"), "left_anti")

  /** §5.1 — count reconciliation (SSURGO_CheckgSSURGO.py:449-1489: the
    * ~55 per-table row counts compared against an authority snapshot).
    * `tables` is name → DataFrame; `expected` name → authoritative
    * count (unlisted tables report a null expectation and ok = false).
    * One union-all of single-row aggregates — each count is a pruned
    * parquet scan, no shuffles, and the result is table-cardinality. */
  def countReconcile(tables: Map[String, DataFrame],
      expected: Map[String, Long]): DataFrame = {
    require(tables.nonEmpty, "countReconcile needs at least one table")
    val rows = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      val exp = expected.get(name)
      df.agg(count(lit(1)).as("n_actual"))
        .select(lit(name).as("tbl"), col("n_actual"),
          exp.map(lit(_)).getOrElse(lit(null)).cast("long").as("n_expected"))
    }
    rows.reduce(_ unionByName _)
      .withColumn("ok", col("n_expected").isNotNull &&
        col("n_actual") === col("n_expected"))
  }

  /** R7 — BadTable cardinality check
    * (gSSURGO_CreateSoilMap.py:433-454): a rating table must carry
    * exactly one row per mapunit. Returns a single (n_rating, n_mapunit,
    * ok) row. */
  def ratingCardinality(rating: DataFrame, mapunits: DataFrame): DataFrame =
    rating.agg(count(lit(1)).as("n_rating"))
      .crossJoin(mapunits.agg(count(lit(1)).as("n_mapunit")))
      .select(col("n_rating"), col("n_mapunit"),
        (col("n_rating") === col("n_mapunit")).as("ok"))

  /** Distribution-DRIFT monitor between two snapshot vintages of a
    * non-negative integer column — the check a training pipeline runs
    * before mixing a new corpus drop into an old recipe (a silent
    * upstream change shifts the value distribution long before it
    * breaks a schema). Exact fixed-width histograms (integer `div`,
    * tail clamped at `maxBucket`) are full-outer joined and each
    * bucket contributes the χ²-style term (p−q)²/(p+q) with
    * p = n_ref/Σref, q = n_cur/Σcur — ONLY +,−,×,÷, never ln (PSI's
    * log is libm-dependent and not bit-identical across engines).
    * Contributions are quantized to integer NANOS before summing, so
    * the total is exact in any order and partitioning (the cents
    * trick); the output carries no raw doubles at all. The three
    * whole-table window sums run over one partition of ≤ maxBucket+1
    * bucket rows — bounded by the histogram width, never the data.
    *
    * Returns one row per occupied bucket:
    * (bucket, n_ref, n_cur, contrib_nano, drift_nano) — drift_nano the
    * same total on every row; 0 ⟺ identical histograms.
    *
    * Fail-loud contracts (riding the plan, the repo convention):
    * values must be NON-NEGATIVE (integer `div` truncates toward zero,
    * so a negative value would bucket differently than a floor-division
    * oracle — asserted per row, free in codegen) and neither vintage
    * may be empty while the other has rows (tr or tc = 0 would turn
    * every contribution into a silent NaN→null — asserted on the
    * window totals). Both vintages empty ⟺ empty output (no data, no
    * drift claim).
    *
    * `valueCol` is a bare COLUMN NAME, not a SQL expression (callers
    * needing a derived value should `.withColumn` it first), and null
    * values fail loudly: `null >= 0` is null, so the non-negativity
    * assert trips rather than bucketing nulls into a silent group —
    * filter or impute nulls before calling. */
  def distributionDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      bucketWidth: Long, maxBucket: Int): DataFrame = {
    require(bucketWidth > 0 && maxBucket >= 0, "positive width, bucket cap")
    def hist(df: DataFrame, as: String) = df
      .select((col(valueCol) + coalesce(
        assert_true(col(valueCol) >= 0,
          lit(s"distributionDrift: $valueCol must be non-negative " +
            "(integer div truncation diverges from floor on negatives)"))
          .cast("long"), lit(0L))).as("v"))
      .select(least(expr(s"v div $bucketWidth"),
        lit(maxBucket.toLong)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val j = hist(ref, "n_ref").join(hist(cur, "n_cur"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val p = col("n_ref").cast("double") / col("tr").cast("double")
    val q = col("n_cur").cast("double") / col("tc").cast("double")
    j.withColumn("tr", sum(col("n_ref")).over(all))
      .withColumn("tc", sum(col("n_cur")).over(all))
      .withColumn("contrib_nano",
        floor((p - q) * (p - q) / (p + q) * 1e9 + 0.5).cast("long") +
          coalesce(assert_true(col("tr") > 0 && col("tc") > 0,
            lit("distributionDrift: one vintage is empty — p or q would " +
              "be 0/0 and every contribution a silent null"))
            .cast("long"), lit(0L)))
      .withColumn("drift_nano", sum(col("contrib_nano")).over(all))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        col("contrib_nano"), col("drift_nano"))
  }
}
