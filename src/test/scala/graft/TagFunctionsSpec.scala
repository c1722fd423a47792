package graft

import graft.functions.TagFunctions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden cases for the OSM tag operators, mirroring the reference's
  * Status/OSMTransforms unit-test expectations (SURVEY §5).
  */
class TagFunctionsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def statusOf(tags: Map[String, String]): (String, String) = {
    import spark.implicits._
    val df = Seq(tags).toDF("tags")
      .select(lifecycleStatus(col("tags"), "piste:type").as("st"))
      .select(col("st.status"), col("st.value"))
    val r = df.collect().head
    (r.getString(0), r.getString(1))
  }

  test("plain base tag → operating") {
    assert(statusOf(Map("piste:type" -> "downhill")) == ("operating", "downhill"))
  }

  test("piste:abandoned=yes → abandoned, value from base") {
    assert(statusOf(Map("piste:type" -> "downhill", "piste:abandoned" -> "yes"))
      == ("abandoned", "downhill"))
  }

  test("prefixed lifecycle key → that state") {
    assert(statusOf(Map("proposed:piste:type" -> "nordic")) == ("proposed", "nordic"))
    assert(statusOf(Map("disused:piste:type" -> "downhill")) == ("disused", "downhill"))
  }

  test("base value is a state name → that state, value from state key") {
    assert(statusOf(Map("piste:type" -> "abandoned", "abandoned" -> "downhill"))
      == ("abandoned", "downhill"))
  }

  test("demolished prefix → dropped") {
    assert(statusOf(Map("demolished:piste:type" -> "downhill"))._1 == "dropped")
  }

  test("no piste tags → null status") {
    assert(statusOf(Map("highway" -> "path"))._1 == null)
  }

  test("osmRef precedence piste:loc_ref > piste:ref > loc_ref > ref") {
    import spark.implicits._
    val df = Seq(
      Map("ref" -> "d", "loc_ref" -> "c", "piste:ref" -> "b", "piste:loc_ref" -> "a"),
      Map("ref" -> "d", "piste:ref" -> "b"),
      Map("ref" -> "d")).toDF("tags")
      .select(osmRef(col("tags")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("a", "b", "d"))
  }

  test("osmName collects name + name:* sorted, uniqued, comma-joined") {
    import spark.implicits._
    val df = Seq(
      Map("name" -> "Zeta", "name:en" -> "Alpha", "name:fr" -> "Zeta"),
      Map("other" -> "x")).toDF("tags").select(osmName(col("tags")))
    val got = df.collect().map(_.getString(0)).toSeq
    assert(got == Seq("Alpha, Zeta", null))
  }

  test("stripRefPrefix removes leading ref") {
    import spark.implicits._
    val df = Seq(("12 - Foo run", "12"), ("12a Bar", "12a"), ("Baz", "9"))
      .toDF("name", "ref")
      .select(stripRefPrefix(col("name"), col("ref")))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Foo run", "Bar", "Baz"))
  }

  test("tagBoolean maps yes/no/1/0 and rejects junk") {
    import spark.implicits._
    val df = Seq("yes", "no", "1", "0", "maybe").toDF("v")
      .select(tagBoolean(col("v")))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      == Seq(true, false, true, false, null))
  }

  test("formatRuns end to end on a hand-built feature") {
    import spark.implicits._
    val feature = (1L,
      Map("piste:type" -> "Downhill;junk", "piste:difficulty" -> "expert",
        "name" -> "Test run", "piste:ref" -> "7"),
      Seq(Seq(0.0, 0.0, 100.0), Seq(0.001, 0.0, 110.0)))
    val df = operators.Formatters.formatRuns(
      Seq(feature).toDF("way_id", "tags", "coords"))
    val r = df.select("status", "uses", "difficulty", "grooming", "oneway", "kept")
      .collect().head
    assert(r.getString(0) == "operating")
    assert(r.getSeq[String](1) == Seq("downhill"))
    assert(r.getString(2) == "expert")
    assert(r.getString(3) == "backcountry") // expert + no grooming tag
    assert(r.getBoolean(4)) // downhill defaults oneway=true
    assert(r.getBoolean(5))
  }
}
