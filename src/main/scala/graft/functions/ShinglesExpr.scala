package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-n-gram shingles ("w1 w2 w3" space-joined windows) as a NATIVE
  * Catalyst expression — the fan-out stage of every n-gram operator
  * (minhash signatures, duplicate-span coverage, trigram novelty,
  * vocabulary/top-gram building, cross-split contamination).
  *
  * The declarative form (`transform(sequence(0, size-n), i ->
  * concat_ws(" ", slice(toks, i+1, n)))`) is a higher-order function —
  * CodegenFallback, an interpreted slice allocation plus expression
  * walk per window. This kernel emits the windows in one pass over
  * the token array inside whole-stage codegen.
  *
  * Value contract — identical to the replaced form: windows shorter
  * than n (size < n) yield an EMPTY array; elements join on a single
  * space with nulls skipped (`UTF8String.concatWs`, the same kernel
  * Spark's string-typed `concat_ws` lowers to); output elements are
  * never null.
  */
case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects array<string>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.shingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.shingles($c, $n)")
  override protected def withNewChildInternal(
      newChild: Expression): ShinglesExpr = copy(child = newChild)
}

object ShinglesExpr {
  def shingles(toks: Column, n: Int): Column =
    GraftExpressionBridge.column(
      ShinglesExpr(GraftExpressionBridge.expression(toks), n))
}
