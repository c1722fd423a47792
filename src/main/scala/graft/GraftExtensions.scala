package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProductExpr, LineLengthMExpr}

/** SQL surface for the library's native Catalyst expressions.
  *
  * Two entry points, same registrations:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    time (the standard Spark extension hook — works from
  *    spark-submit / spark-sql / thrift server with the library jar on
  *    the classpath, no Scala code at all);
  *  - [[GraftExtensions.register]] on an already-running session
  *    (notebooks, tests).
  *
  * Both make the codegen kernels available to pure-SQL users:
  * `graft_line_length_m(coords)` (geodesic polyline meters over
  * `array<array<double>>`) and `graft_vec_dot(a, b)` (dense
  * double-vector dot product). The functions resolve to the SAME
  * `Expression` nodes the DataFrame API uses, so SQL callers get
  * whole-stage codegen, not a UDF shim.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def oneArg(name: String, f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.size}")
  }

  private def twoArg(name: String, f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${args.size}")
  }

  /** (identifier, info, builder) triples in the shape
    * `SparkSessionExtensions.injectFunction` and
    * `FunctionRegistry.registerFunction` both accept.
    */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_line_length_m"),
      new ExpressionInfo(classOf[LineLengthMExpr].getName,
        "graft_line_length_m"),
      oneArg("graft_line_length_m", LineLengthMExpr)),
    (FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "graft_vec_dot"),
      twoArg("graft_vec_dot", DotProductExpr(_, _))))

  /** Register the functions on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
