package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one query here
  * (and, when ANSI-SQL-expressible, a DuckDB oracle). Query names are
  * prefixed by the SURVEY operator id they exercise (a02 ↔ A2, etc.).
  */
object SparkEntry {

  /** All registered query sets, one per SURVEY.md §2 family. */
  def sets: Seq[QuerySet] =
    Seq(CoreQueries, SdvQueries, HzMoQueries, ValuQueries, MiscQueries,
      TrainQueries, ValidateQueries, ExtraQueries, PlannerQueries,
      SweepQueries, EventQueries, SampleQueries, GeoQueries)

  private lazy val allQ: Seq[Q] = sets.flatMap(_.all)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Batch-side plan of every streaming (st*) query on static frames —
    * see [[graft.queries.QuerySet.stBatchPlans]]. CodegenGateSpec
    * asserts this covers every registered st* query and compile-probes
    * each plan. */
  def streamingBatchPlans: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.stBatchPlans).toMap

  /** What [[graft.Bench]] times: every registered query, with the
    * few gate-heavy entries swapped for their operator-only
    * [[graft.queries.QuerySet.benchPlans]] twin. Correctness always
    * runs the full [[queries]] form — a benchPlan key that isn't a
    * registered (oracle-gated) query is a contract violation and
    * fails here. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] = {
    val overrides = sets.flatMap(_.benchPlans).toMap
    val unknown = overrides.keySet -- queries.keySet
    require(unknown.isEmpty,
      s"benchPlans for unregistered queries: ${unknown.mkString(", ")}")
    queries ++ overrides
  }

  /** The twin-swapped query names, disclosed in the bench artifact so
    * cross-round wall/CPU ratios can exclude measurement-definition
    * changes from code-change claims (r15 advice). */
  def benchTwinNames: Seq[String] =
    sets.flatMap(_.benchPlans.keys).distinct.sorted
}
