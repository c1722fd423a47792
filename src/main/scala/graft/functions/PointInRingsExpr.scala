package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Even-odd point-in-polygon containment as NATIVE Catalyst
  * expressions — one per-edge loop instead of the former
  * triple-interpreted fold (`aggregate(sequence(1, size(ring)), …)`
  * with two `element_at`s and the crossing arithmetic re-built per
  * edge per point), which every containment consumer (J2 refine, E4
  * polygon assign, G6 inside-point, OSM multipolygon assembly, the
  * MultiPart coverage count) evaluates candidate-pair × point ×
  * edge times.
  *
  * Value contract (pinned by PointInRingsSpec against the replaced
  * folds, bit-identically):
  * - crossing test in the EXACT op order of the fold (and of the
  *   DuckDB oracles): `((y1 > py) != (y2 > py)) &&
  *   (px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)` — IEEE doubles,
  *   division by zero yielding ±Inf exactly as before;
  * - vertex order v1 = ring[i], v2 = ring[i % n + 1] (1-based wrap);
  * - an edge with any null/missing coordinate leaves the parity
  *   unchanged (the fold's `when(null-crosses, !acc).otherwise(acc)`
  *   algebra); a null RING inside the ring set likewise;
  * - null px/py/ring(s) input → null result (expression-level null
  *   propagation, as before).
  */
object GeoContainKernels {

  /** Even-odd parity contribution of one ring. */
  def inRing(px: Double, py: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements()
    var acc = false
    var i = 0
    while (i < n) {
      if (!ring.isNullAt(i)) {
        val v1 = ring.getArray(i)
        val j = (i + 1) % n
        if (!ring.isNullAt(j)) {
          val v2 = ring.getArray(j)
          if (v1.numElements() >= 2 && v2.numElements() >= 2 &&
              !v1.isNullAt(0) && !v1.isNullAt(1) &&
              !v2.isNullAt(0) && !v2.isNullAt(1)) {
            val x1 = v1.getDouble(0); val y1 = v1.getDouble(1)
            val x2 = v2.getDouble(0); val y2 = v2.getDouble(1)
            if (((y1 > py) != (y2 > py)) &&
                px < (x2 - x1) * (py - y1) / (y2 - y1) + x1)
              acc = !acc
          }
        }
      }
      i += 1
    }
    acc
  }

  /** Even-odd parity across a full ring set (outer + hole rings). */
  def inRings(px: Double, py: Double, rings: ArrayData): Boolean = {
    val n = rings.numElements()
    var acc = false
    var i = 0
    while (i < n) {
      if (!rings.isNullAt(i) && inRing(px, py, rings.getArray(i)))
        acc = !acc
      i += 1
    }
    acc
  }
}

case class PointInRingExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType, ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pointInPolygon expects (double, double, array<array<double>>), got $other")
    }
  override protected def nullSafeEval(px: Any, py: Any, ring: Any): Any =
    GeoContainKernels.inRing(px.asInstanceOf[Double],
      py.asInstanceOf[Double], ring.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (px, py, r) =>
      s"graft.functions.GeoContainKernels.inRing($px, $py, $r)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PointInRingExpr =
    copy(first = f, second = s, third = t)
}

case class PointInRingsExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, DoubleType,
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pointInRings expects (double, double, array<array<array<double>>>), got $other")
    }
  override protected def nullSafeEval(px: Any, py: Any, rings: Any): Any =
    GeoContainKernels.inRings(px.asInstanceOf[Double],
      py.asInstanceOf[Double], rings.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (px, py, r) =>
      s"graft.functions.GeoContainKernels.inRings($px, $py, $r)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PointInRingsExpr =
    copy(first = f, second = s, third = t)
}

object PointInRingsExpr {
  def pointInPolygon(px: Column, py: Column, ring: Column): Column =
    GraftExpressionBridge.column(PointInRingExpr(
      GraftExpressionBridge.expression(px),
      GraftExpressionBridge.expression(py),
      GraftExpressionBridge.expression(ring)))

  def pointInRings(px: Column, py: Column, rings: Column): Column =
    GraftExpressionBridge.column(PointInRingsExpr(
      GraftExpressionBridge.expression(px),
      GraftExpressionBridge.expression(py),
      GraftExpressionBridge.expression(rings)))
}
