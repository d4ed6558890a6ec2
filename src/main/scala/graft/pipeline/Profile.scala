package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the data-card summary a corpus
  * release ships with: per column, row count, null count, and exact
  * distinct cardinality. Values are profiled in canonical string form
  * (exact for integer/string columns; profile float columns via
  * pre-quantized derivations — a raw double's string form is
  * engine-dependent).
  *
  * Plan: one generator pass stacks (column, value) pairs — c rows per
  * input row, no join, no per-column job — and ONE partial-aggregating
  * shuffle computes all three measures; count(DISTINCT) plans as the
  * two-phase Expand aggregate, still map-side partial. At 100 TB this
  * is the shape you want: a single scan of the table, never a
  * driver-side loop over columns. */
object Profile {

  /** Profile `cols` of `df`. Returns (col_name, n_rows, n_null,
    * n_distinct); n_distinct excludes nulls (SQL DISTINCT-aggregate
    * semantics on both engines). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.col_name").as("col_name"), col("s.v").as("v"))
    pairs.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      count_distinct(col("v")).as("n_distinct"))
  }
}
