package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe summary statistics. */
object Stats {

  /** Exact per-group median for LOW-CARDINALITY value domains (enum-ish
    * measures like quantities, ratings, scores).
    *
    * `median()` sorts every row of each group; this instead counts by
    * (group, value) — a partial-aggregating hash shuffle that carries
    * one row per distinct pair — and interpolates the median from the
    * tiny per-group distribution (the cumulative-count window runs over
    * distinct values, not fact rows). Exact-equal to `median()` for any
    * input; the win requires |distinct values| ≪ |rows|, which is what
    * the reconciliation-report measures here look like. */
  def groupedMedian(df: DataFrame, groupCol: String, valueCol: String,
      out: String = "median"): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val all = Window.partitionBy(col(groupCol))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(byVal))
      .withColumn("n", sum(col("c")).over(all))
    // interpolated median: mean of the values at 1-based positions
    // floor((n+1)/2) and floor(n/2)+1 (equal when n is odd)
    val loPos = (col("n") + 1) / 2
    val hiPos = col("n") / 2 + 1
    cum.groupBy(col(groupCol)).agg(
      ((min(when(col("cum") >= floor(loPos), col(valueCol))) +
        min(when(col("cum") >= floor(hiPos), col(valueCol)))) / 2.0).as(out))
  }

  /** Exact per-group nearest-rank quantile (inverse CDF: the smallest
    * value whose cumulative count reaches ceil(n·p/100)) over the same
    * per-(group, value) count shape as [[groupedMedian]] — no per-group
    * row sort, survives fact-table scale for low-cardinality value
    * domains. The rank is pure integer arithmetic
    * ((n·pPct + 99) div 100), so results are engine-portable with no
    * interpolation float math. pPct ∈ [1, 100]; 100 = max, 50 = lower
    * median. */
  def groupedQuantile(df: DataFrame, groupCol: String, valueCol: String,
      pPct: Int, out: String = "quantile"): DataFrame = {
    require(pPct >= 1 && pPct <= 100, s"pPct $pPct outside [1, 100]")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val all = Window.partitionBy(col(groupCol))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(byVal))
      .withColumn("n", sum(col("c")).over(all))
    val pos = floor((col("n") * pPct + lit(99)) / 100)
    cum.groupBy(col(groupCol))
      .agg(min(when(col("cum") >= pos, col(valueCol))).as(out))
  }
}
