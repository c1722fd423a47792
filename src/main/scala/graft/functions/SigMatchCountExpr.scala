package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Position-wise equal-element count of two long arrays (MinHash
  * signature agreement) as a NATIVE Catalyst expression.
  *
  * The declarative form —
  * `aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
  * 0, (acc, v) => acc + v)` — evaluates two interpreted higher-order
  * functions and allocates an intermediate array per candidate pair,
  * and (being codegen-incapable) severs the WholeStageCodegen span of
  * the projection after the signature joins. This kernel is one fused
  * loop, no allocation.
  *
  * Value contract (pinned by SigMatchCountSpec): positions beyond the
  * shorter array and positions where either element is null contribute
  * 0 — exactly the replaced form's zip_with null-padding and
  * `when(x === y, …)` null semantics.
  */
case class SigMatchCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sigMatchCount expects (array<bigint>, array<bigint>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigMatchCountExpr.matchCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SigMatchCountExpr.matchCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigMatchCountExpr =
    copy(left = newLeft, right = newRight)
}

object SigMatchCountExpr {
  def matchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def sigMatchCount(a: Column, b: Column): Column =
    GraftExpressionBridge.column(SigMatchCountExpr(
      GraftExpressionBridge.expression(a),
      GraftExpressionBridge.expression(b)))
}
