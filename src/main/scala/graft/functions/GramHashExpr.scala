package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling K-character-gram portable hashes over a string as a NATIVE
  * Catalyst expression — the sketching front half of the winnowing
  * dedup (its fingerprints are `hash32(substr(text, i, K))` for every
  * position i).
  *
  * The declarative form (`transform(sequence(1, length-K+1),
  * i -> hash32(substr(text, i, K)))`) is an interpreted lambda whose
  * every element allocates a substring copy and walks an
  * md5/conv/substring expression tree. This kernel walks the UTF-8
  * byte array once, precomputes per-code-point byte offsets, and
  * digests each gram's byte RANGE directly — no string copies —
  * with a thread-local MessageDigest.
  *
  * Value contract — bit-for-bit with the replaced form: positions and
  * gram boundaries count CODE POINTS (Spark's `length`/`substr`
  * semantics on strings); each value is the first 8 md5 hex chars of
  * the gram's UTF-8 bytes parsed base-16 (= big-endian first-4-bytes,
  * zero-extended). Inputs shorter than K code points yield an empty
  * array.
  */
case class GramHashExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram width must be >= 1, got $k")
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gramHashes expects string, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.gramHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.gramHashes($c, $k)")
  override protected def withNewChildInternal(
      newChild: Expression): GramHashExpr = copy(child = newChild)
}

object GramHashExpr {
  def gramHashes(text: Column, k: Int): Column =
    GraftExpressionBridge.column(
      GramHashExpr(GraftExpressionBridge.expression(text), k))
}
