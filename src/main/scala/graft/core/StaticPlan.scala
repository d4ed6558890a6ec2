package graft.core

import org.apache.spark.sql.SparkSession

/** Construction-time static planning for the iterative/chained
  * operators (ANN graph walks, insert repair, tower maintenance).
  *
  * Under AQE, `localCheckpoint(eager = false)` is NOT lazy: planning
  * the checkpoint RDD (`queryExecution.toRdd`) forces
  * `AdaptiveSparkPlanExec.getFinalPhysicalPlan`, which materializes
  * every exchange of the subtree as a synchronous shuffle job. A chain
  * of ~20 lazy checkpoints (n20/n22/n23) therefore executes as ~20+
  * SEQUENTIAL blocking job rounds at query-CONSTRUCTION time — r18
  * StageProbe measured n20 at 122 stages, 6.5 task-seconds, 7.7 s
  * wall: the wall is driver round latency, not work (guide §2.6).
  *
  * With AQE off while the chain is BUILT, every checkpoint plans to a
  * static RDD graph with zero jobs; the final action then runs the
  * whole DAG in one job where independent subtrees (index build,
  * brute-force truth, per-level graphs) overlap on the scheduler —
  * exactly the dupClusters/dupClustersStar lesson applied to
  * construction instead of a convergence loop. Shuffle partitions are
  * sized to the operator's input (the dupClusters convention: these
  * stages move corpus-graph-sized frames, not fact tables), restored
  * after; the session's AQE setting is restored for the top-level
  * plan, which still adapts. Physical-planning only — results are
  * partitioning-invariant by the operators' determinism contract. */
object StaticPlan {

  /** Run `body` (query construction) with AQE off and shuffle
    * partitions sized to `rows` (≈ the corpus rows the chain's
    * shuffles carry), restoring both confs after. */
  def sized[T](spark: SparkSession, rows: Long)(body: => T): T = {
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(aqeKey, "true")
    val prevSp = spark.conf.get(spKey)
    val sessionParts =
      scala.util.Try(prevSp.toLong).getOrElse(scala.util.Try(
        spark.sessionState.conf.numShufflePartitions.toLong).getOrElse(200L))
    val parts = math.max(4L, math.min(sessionParts, rows / 250000L + 1L))
    spark.conf.set(aqeKey, "false")
    spark.conf.set(spKey, parts.toString)
    try body
    finally {
      spark.conf.set(aqeKey, prevAqe)
      spark.conf.set(spKey, prevSp)
    }
  }
}
