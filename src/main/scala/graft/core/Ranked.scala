package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-1-per-group machinery.
  *
  * The reference implements every "dominant" pick as an ORDER BY cursor +
  * take-first-row-per-group (SortData, gSSURGO_CreateSoilMap.py:456-509).
  * The scalable Spark shape is `max_by` over a packed ordering struct
  * rather than a `row_number` window: max_by does map-side partial
  * aggregation, so the shuffle carries one candidate per (group, map
  * partition) instead of the whole component table — the difference
  * between shuffling ~100 TB and shuffling the group cardinality.
  */
object Ranked {

  /** One row per group; the winner is the row whose `order` tuple is
    * greatest under lexicographic struct comparison. Callers orient every
    * order column so that MAX selects the winner (negate numeric columns
    * that should sort ascending) and guarantee they are non-null.
    *
    * `payload` = (outputName -> expression) columns carried from the
    * winning row.
    */
  def argmax(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[Column],
      payload: Seq[(String, Column)]): DataFrame = {
    val ordStruct = struct(order.zipWithIndex.map { case (c, i) => c.as(s"o$i") }: _*)
    val payStruct = struct(payload.map { case (n, c) => c.as(n) }: _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(max_by(payStruct, ordStruct).as("__win"))
      .select(groupCols.map(col) ++ payload.map { case (n, _) => col(s"__win.$n").as(n) }: _*)
  }

  /** Keep every row tied for the top of `orderCol` within its group —
    * the reference's multi-dominant-component tie retention
    * (AggregateHz_DCP_WTA, gSSURGO_CreateSoilMap.py:8739-8752).
    * Implemented as a self-join against the per-group max (both sides
    * partial-aggregate; no full-table window shuffle).
    */
  def keepTies(df: DataFrame, groupCols: Seq[String], orderCol: String): DataFrame = {
    val mx = df.groupBy(groupCols.map(col): _*)
      .agg(max(col(orderCol)).as("__mx"))
    df.join(mx, groupCols).filter(col(orderCol) === col("__mx")).drop("__mx")
  }
}
