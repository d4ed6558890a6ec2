package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, LongType}

/** Ray-cast point-in-polygon over BIGINT vertex arrays as a native
  * Catalyst expression WITH codegen — the raster-cell hot path
  * (SSURGO_ExportMuRaster.py:1252-1357 cell-center lookups fan one
  * test per cell, millions of rows at sf0.1 and billions at CONUS
  * scale). The Column-combinator forms in graft.geo.Geo hit two
  * compilation cliffs there: the higher-order `aggregate` is
  * CodegenFallback (interpreted per row), and the statically unrolled
  * edge sum inlines the vertex arithmetic into one generated method so
  * large that HotSpot refuses to JIT it (DontCompileHugeMethods) —
  * codegen'd yet running as interpreted bytecode, measured ~10× slow.
  * This expression is ONE bounded loop in a ~20-line method: janino
  * compiles it, HotSpot JITs it, and whole-stage codegen keeps the
  * surrounding plan fused.
  *
  * Semantics match graft.geo.Geo.pointInPolygon term for term on
  * WELL-FORMED input: half-open straddle rule ((y1<=py) != (y2<=py)),
  * integer cross-product side test, t == 0 (point on the edge line)
  * never counts. DELIBERATE CHANGE on malformed input (the CosineSim
  * precedent): mismatched xs/ys lengths or a null vertex yield NULL —
  * the HOF form's null arithmetic silently falls through its
  * when(...) to "edge doesn't cross" and still emits a verdict over
  * the garbage polygon; a null row drops out of filters instead of
  * posing as an answer. */
case class PointInPolygon(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(pxA: Any, pyA: Any, xsA: Any, ysA: Any): Any = {
    val px = pxA.asInstanceOf[Long]; val py = pyA.asInstanceOf[Long]
    val xs = xsA.asInstanceOf[ArrayData]; val ys = ysA.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var crossings = 0L
    var i = 0
    while (i < n) {
      val j = (i + 1) % n
      if (xs.isNullAt(i) || ys.isNullAt(i) || xs.isNullAt(j) || ys.isNullAt(j))
        return null
      val x1 = xs.getLong(i); val y1 = ys.getLong(i)
      val x2 = xs.getLong(j); val y2 = ys.getLong(j)
      if ((y1 <= py) != (y2 <= py)) {
        val t = (x1 - px) * (y2 - y1) + (x2 - x1) * (py - y1)
        if (t != 0L && ((t > 0L) == (y2 > y1))) crossings += 1L
      }
      i += 1
    }
    java.lang.Boolean.valueOf(crossings % 2L == 1L)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (px, py, xs, ys) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cr = ctx.freshName("cr")
      val bad = ctx.freshName("bad")
      val x1 = ctx.freshName("x1"); val y1 = ctx.freshName("y1")
      val x2 = ctx.freshName("x2"); val y2 = ctx.freshName("y2")
      val t = ctx.freshName("t")
      s"""int $n = $xs.numElements();
         |boolean $bad = ($ys.numElements() != $n);
         |long $cr = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  int $j = ($i + 1) % $n;
         |  // NOTE: never start a generated line with "||" — a later
         |  // stripMargin pass in codegen assembly eats a line-leading
         |  // pipe and silently breaks the compile (janino fallback).
         |  if ($xs.isNullAt($i) || $ys.isNullAt($i) ||
         |      $xs.isNullAt($j) || $ys.isNullAt($j)) { $bad = true; break; }
         |  long $x1 = $xs.getLong($i); long $y1 = $ys.getLong($i);
         |  long $x2 = $xs.getLong($j); long $y2 = $ys.getLong($j);
         |  if (($y1 <= $py) != ($y2 <= $py)) {
         |    long $t = ($x1 - $px) * ($y2 - $y1) + ($x2 - $x1) * ($py - $y1);
         |    if ($t != 0L && (($t > 0L) == ($y2 > $y1))) $cr += 1L;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ($cr % 2L == 1L);
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): PointInPolygon =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Column-level entry — hosted in a org.apache.spark.sql subpackage
  * because ExpressionUtils and AbstractDataType are private[sql]. */
object PointInPolygon {
  def ofColumns(px: Column, py: Column, xs: Column, ys: Column): Column =
    ExpressionUtils.column(PointInPolygon(
      ExpressionUtils.expression(px), ExpressionUtils.expression(py),
      ExpressionUtils.expression(xs), ExpressionUtils.expression(ys)))
}
