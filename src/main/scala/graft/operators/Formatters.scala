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

  val ValidLiftTypes: Seq[String] = Seq("cable_car", "gondola", "chair_lift",
    "drag_lift", "t-bar", "j-bar", "platter", "rope_tow", "magic_carpet",
    "funicular")
  val RailwayTypes: Seq[String] = Seq("rail", "light_rail", "subway",
    "narrow_gauge", "funicular")

  /** Lift formatter (SURVEY P2,
    * `/root/reference/src/transforms/LiftFormatter.ts:27-155`):
    * lifecycle status over `aerialway` else `railway` (rail values →
    * "railway"), private/freight access drop, "mm:ss"-or-minutes
    * duration → seconds, occupancy int, bubble/heating booleans.
    * Input: (lift_id, tags map); output adds status/lift_type/
    * duration_s/occupancy/bubble/heating.
    */
  def formatLifts(features: DataFrame): DataFrame = {
    val tags = col("tags")
    val aerialSt = lifecycleStatus(tags, "aerialway")
    val railSt = lifecycleStatus(tags, "railway")
    val st = when(col("ast").getField("status").isNotNull, col("ast"))
      .otherwise(col("rst"))
    val fromRail = col("ast").getField("status").isNull
    val rawType = col("st").getField("value")
    val liftType = when(fromRail &&
        rawType.isin(RailwayTypes.map(x => x: Any): _*), "railway")
      .when(!fromRail && rawType.isin(ValidLiftTypes.map(x => x: Any): _*),
        rawType)
    val dur = element_at(tags, "duration")
    val durationS = when(dur.contains(":"),
        split(dur, ":").getItem(0).cast("long") * 60
          + split(dur, ":").getItem(1).cast("long"))
      .otherwise(round(dur.cast("double") * 60).cast("long"))

    features
      .withColumn("ast", aerialSt)
      .withColumn("rst", railSt)
      .withColumn("st", st)
      .filter(col("st").getField("status").isNotNull
        && col("st").getField("status") =!= "dropped")
      .filter(coalesce(element_at(tags, "access"), lit("yes")) =!= "private"
        && coalesce(element_at(tags, "usage"), lit("")) =!= "freight")
      .withColumn("status", col("st").getField("status"))
      .withColumn("lift_type", liftType)
      .withColumn("duration_s", durationS)
      .withColumn("occupancy", element_at(tags, "aerialway:occupancy").cast("int"))
      .withColumn("bubble", tagBoolean(element_at(tags, "aerialway:bubble")))
      .withColumn("heating", tagBoolean(element_at(tags, "aerialway:heating")))
      .withColumn("name", osmName(tags))
      .drop("ast", "rst", "st", "tags")
  }

  val ValidStationPositions: Seq[String] = Seq("top", "mid", "bottom")

  /** Spot formatter (SURVEY P4,
    * `/root/reference/src/transforms/SpotFormatter.ts:30-192`): ONE
    * input node can emit up to 5 spots — crossing, lift station (with
    * validated top/mid/bottom position), transceiver training,
    * transceiver checkpoint, halfpipe — each gated by its own tag
    * predicate. Input: (node_id, tags); output one row per emitted
    * spot (node_id, spot_type, position).
    */
  def formatSpots(features: DataFrame): DataFrame = {
    val tags = col("tags")
    def cand(cond: org.apache.spark.sql.Column, t: String,
        pos: org.apache.spark.sql.Column) =
      when(cond, struct(lit(t).as("spot_type"), pos.as("position")))
    val noPos = lit(null).cast("string")
    val stationPos = {
      val p = element_at(tags, "aerialway:station")
      when(p.isin(ValidStationPositions.map(x => x: Any): _*), p)
    }
    val candidates = array(
      cand(element_at(tags, "ski") === "crossing", "crossing", noPos),
      cand(element_at(tags, "aerialway") === "station", "lift_station",
        stationPos),
      cand(element_at(tags, "avalanche_transceiver") === "training",
        "avalanche_transceiver_training", noPos),
      cand(element_at(tags, "avalanche_transceiver") === "checkpoint",
        "avalanche_transceiver_checkpoint", noPos),
      cand(element_at(tags, "halfpipe") === "yes", "halfpipe", noPos))
    features
      .select(col("node_id"),
        explode(filter(candidates, c => c.isNotNull)).as("spot"))
      .select(col("node_id"), col("spot.spot_type"), col("spot.position"))
  }

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
