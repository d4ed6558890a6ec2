package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Cosine similarity of two double arrays as a native Catalyst
  * expression WITH codegen — the hot-path primitive behind every
  * similarity/dedup query. The higher-order-function formulation
  * (zip_with + aggregate) is CodegenFallback: each call interprets
  * three lambda folds and allocates an intermediate array per row.
  * This single fused loop stays inside whole-stage codegen.
  *
  * Semantics match the HOF form bit-for-bit on well-formed input:
  * elements accumulate left-to-right in doubles (deterministic across
  * engines/partitionings — the DuckDB oracle parity relies on it),
  * and a null element or length mismatch yields null (zip_with pads
  * with null, which the fold then propagates). DELIBERATE CHANGE: a
  * zero-norm vector yields null — the HOF form's division raised
  * DIVIDE_BY_ZERO under Spark 4's ANSI default, crashing the whole
  * query on one degenerate row; a null row drops out of threshold
  * filters and aggregates instead. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  /** Accept float OR double arrays NATIVELY. The embedding columns are
    * array<float>; with double-only inputs every call site wrapped the
    * vector in cast(array<float> AS array<double>) — and because the
    * cosine sits in the post-JOIN projection, the Σ|bucket|² scoring
    * joins paid TWO fresh array allocations + 2·d element copies per
    * scored PAIR, not per vector (r18 StageProbe: ~10 µs and ~1 KB
    * garbage per scored row; n18's scoring stage burned 10.8 task-s
    * for 0.2 s of actual fused-loop work). Reading the float elements
    * in place and widening per-element is bit-identical: float→double
    * conversion is exact, and the accumulation below was already
    * double left-to-right. */
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (fa, fb) = (isFloat(left), isFloat(right))
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      val bad = ctx.freshName("bad")
      val getL = if (isFloat(left)) s"(double) $l.getFloat($i)"
                 else s"$l.getDouble($i)"
      val getR = if (isFloat(right)) s"(double) $r.getFloat($i)"
                 else s"$r.getDouble($i)"
      s"""int $n = $l.numElements();
         |boolean $bad = ($n != $r.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($l.isNullAt($i) || $r.isNullAt($i)) { $bad = true; break; }
         |  double $x = $getL;
         |  double $y = $getR;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |if ($bad || $denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry — hosted in a org.apache.spark.sql subpackage
  * because both ExpressionUtils (Expression↔Column bridging, the
  * Spark 4 replacement for the removed `new Column(expr)`) and
  * AbstractDataType are private[sql]. */
object CosineSim {
  def ofColumns(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
