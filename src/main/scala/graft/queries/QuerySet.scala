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

  /** BENCH-TIME substitutes for queries whose registered (Verify)
    * form carries an expensive correctness GATE on top of the
    * operator — e.g. the ANN maintenance queries re-prove
    * maintained-recall ≥ from-scratch-rebuild every run, so the
    * bench was pricing two index builds and two full search walks
    * as if they were the operator (r14 verdict #6). A benchPlan runs
    * ONLY the operator under measurement (same code path, same input
    * artifacts, full evaluation); the gate stays in the Verify query,
    * where the DuckDB oracle and ContractCheck still fail loudly.
    * Keys must be a subset of this set's registered query names —
    * SparkEntry asserts it, so a benchPlan can never smuggle in an
    * unverified query. */
  def benchPlans: Map[String, (SparkSession, String) => DataFrame] = Map.empty
}
