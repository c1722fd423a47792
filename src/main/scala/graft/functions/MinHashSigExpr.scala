package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature (k seeded portable-hash minima over a shingle
  * array) as a NATIVE Catalyst expression — the ingest-path kernel of
  * the LSH dedup index.
  *
  * The declarative form (`transform(sequence(0,k-1), j ->
  * array_min(transform(sh, s -> hash64(concat(j,':',s)))))`) is a
  * doubly-nested higher-order function: interpreted, k passes over
  * the shingle array, and each of the k·n hash evaluations walks an
  * md5/conv/substring expression tree. At a 100 TB corpus the
  * signature build IS the dedup-index ingest cost; this kernel makes
  * one pass over the shingles, reuses each shingle's UTF-8 bytes
  * across all k seeds, and drives a single thread-local MessageDigest
  * — inside whole-stage codegen.
  *
  * Value contract — bit-for-bit with [[TextFunctions.minhashSignature]]
  * (and the DuckDB oracle): per seed j, the value is
  * `hash64(j || ':' || shingle)` = the first 15 hex chars of
  * md5(UTF-8 bytes) parsed base-16 — computed here as the big-endian
  * first-8-bytes value logically shifted right 4. Null shingle
  * elements hash to null and are ignored (like `array_min`); an empty
  * or all-null shingle array yields k null elements.
  */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"signature length must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhashSig expects array<string>, got $other")
    }
  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.minhashSig($c, $k)")
  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
}

object MinHashSigExpr {
  def minhashSig(sh: Column, k: Int): Column =
    GraftExpressionBridge.column(
      MinHashSigExpr(GraftExpressionBridge.expression(sh), k))
}
