package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Column names/types must match the oracle
  * exactly — the driver sorts columns by name and hash-compares values. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QuerySet {
  def all: Seq[Q]

  /** Batch-side plans of this set's STREAMING (st*) queries, built on
    * STATIC frames — no checkpoint lifecycle, no temp dirs, safe to
    * construct without executing anything. CodegenGateSpec
    * compile-probes these: the st* queries themselves cannot be
    * constructed without running their streams, so a foreachBatch /
    * per-batch transform silently falling off whole-stage codegen
    * (the r7 s12 / r9 mm07 class) would otherwise go unseen. Where a
    * query's per-batch transform is a named function, the SAME
    * function must back both the query and this plan. */
  def stBatchPlans: Map[String, (SparkSession, String) => DataFrame] = Map.empty
}
