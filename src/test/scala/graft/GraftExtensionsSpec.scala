package graft

import org.apache.spark.sql.functions._

/** SQL-surface checks: the registered functions must resolve in pure
  * SQL and agree exactly with their DataFrame-API twins (same
  * Expression nodes, so bit-identical results).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("graft_line_length_m resolves in SQL and matches the DSL expression") {
    GraftExtensions.register(spark)
    val sqlRes = spark.sql(
      """SELECT graft_line_length_m(
        |  array(array(7.0d, 46.0d), array(7.01d, 46.0d), array(7.01d, 46.01d)))
        |  AS m""".stripMargin).collect().head.getDouble(0)
    import spark.implicits._
    val dslRes = Seq(Seq(Seq(7.0, 46.0), Seq(7.01, 46.0), Seq(7.01, 46.01)))
      .toDF("coords")
      .select(functions.GeoFunctions.lineLengthM(col("coords")))
      .collect().head.getDouble(0)
    assert(sqlRes == dslRes)
    assert(sqlRes > 1800 && sqlRes < 2100) // ~0.78km + ~1.11km
  }

  test("graft_vec_dot resolves in SQL and handles arity errors") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT graft_vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(got == 32.0)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_vec_dot(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("graft_vec_dot"))
  }

  test("extensions class wires the same descriptions as register()") {
    val ext = new GraftExtensions
    // applying to a fresh SparkSessionExtensions must accept every
    // description without throwing (the builder-time injection path)
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.descriptions.map(_._1.funcName).sorted ==
      Seq("graft_line_length_m", "graft_vec_dot"))
  }
}
