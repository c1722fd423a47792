package graft.operators

import graft.functions.TagFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Run formatter (SURVEY P1): the reference's per-record normalization
  * (`/root/reference/src/transforms/RunFormatter.ts:30-189`) as one
  * declarative select over (way_id, tags, coords) —
  * lifecycle status (P7), `piste:type` list → validated uses,
  * difficulty validation, grooming defaulting (`no`→backcountry,
  * expert/freeride/extreme absent→backcountry), gladed fallback from
  * `natural=wood`, oneway default for downhill, name/ref extraction.
  *
  * Everything is a column expression → single codegen'd map stage, no
  * shuffle, predicate pushdown unobstructed.
  */
object Formatters {

  def formatRuns(features: DataFrame): DataFrame = {
    val tags = col("tags")
    val st = lifecycleStatus(tags, "piste:type")
    val usesArr = filter(
      transform(split(col("st").getField("value"), ";"), u => lower(trim(u))),
      u => u.isin(SkiFeatures.ValidUses.map(x => x: Any): _*))
    val diffTag = element_at(tags, "piste:difficulty")
    val difficulty = when(
      diffTag.isin(SkiFeatures.ValidDifficulties.map(x => x: Any): _*), diffTag)
    val groomTag = element_at(tags, "piste:grooming")
    val grooming =
      when(groomTag.isin(SkiFeatures.ValidGrooming.map(x => x: Any): _*), groomTag)
        .when(groomTag === "no", "backcountry")
        .when(groomTag.isNull &&
          difficulty.isin("expert", "freeride", "extreme"), "backcountry")
    val gladed = coalesce(
      tagBoolean(element_at(tags, "gladed")),
      when(element_at(tags, "natural") === "wood", true))
    val status = col("st").getField("status")

    features
      .withColumn("st", st)
      .filter(status.isNotNull && status =!= "dropped")
      .withColumn("uses", usesArr)
      .withColumn("difficulty", difficulty)
      .withColumn("grooming", grooming)
      .withColumn("gladed", gladed)
      .withColumn("oneway", coalesce(
        tagBoolean(element_at(tags, "oneway")),
        when(array_contains(col("uses"), "downhill"), true)))
      .withColumn("ref", osmRef(tags))
      .withColumn("name", osmName(tags))
      .withColumn("status", status)
      .withColumn("kept", status === "operating" && size(col("uses")) > 0)
      .drop("st", "tags")
  }
}
