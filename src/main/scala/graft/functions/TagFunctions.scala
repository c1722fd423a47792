package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OSM tag-map operators (SURVEY P7-P10), as column expressions over a
  * `map<string,string>` tags column.
  *
  * Reference semantics:
  *  - lifecycle status parsing `/root/reference/src/transforms/Status.ts:9-68`
  *    (+ the `piste:abandoned=yes` special case
  *    `/root/reference/src/transforms/RunFormatter.ts:110-113`)
  *  - ref selection `/root/reference/src/transforms/OSMTransforms.ts:103-109`
  *  - name collection + ref-prefix strip `OSMTransforms.ts:37-65,111-131`
  *  - yes/no boolean mapping `OSMTransforms.ts:15-24`
  */
object TagFunctions {

  /** Lifecycle states recognized by the status parser, in check order. */
  val states: Seq[String] =
    Seq("disused", "abandoned", "proposed", "planned", "construction")

  /** States that cause the feature to be dropped entirely. */
  val droppedStates: Seq[String] = Seq("demolished", "removed", "razed")

  /** Parse lifecycle status for a base key (e.g. "piste:type"):
    * returns struct(status, value) where value is the effective tag
    * value, or NULL status when the feature has no such tag at all.
    *
    * Cascade (reference order):
    *  1. `piste:abandoned=yes` ⇒ abandoned, value from base key;
    *  2. dropped-state prefix present (`demolished:key` …) ⇒ status
    *     "dropped" (callers filter it out);
    *  3. first `{state}:{key}` present ⇒ that state, its value;
    *  4. base key whose VALUE is itself a state name ⇒ that state,
    *     value from `tags[stateName]` when present;
    *  5. base key present ⇒ operating;
    *  6. else NULL.
    */
  def lifecycleStatus(tags: Column, key: String): Column = {
    val base = element_at(tags, key)
    val abandonedFlag = element_at(tags, "piste:abandoned") === "yes"
    val dropped = droppedStates
      .map(s => element_at(tags, s"$s:$key").isNotNull)
      .reduce(_ || _)
    val prefixedStatus = states.foldRight(lit(null).cast("string")) {
      (s, acc) => when(element_at(tags, s"$s:$key").isNotNull, lit(s)).otherwise(acc)
    }
    val prefixedValue = states.foldRight(lit(null).cast("string")) {
      (s, acc) => when(element_at(tags, s"$s:$key").isNotNull,
        element_at(tags, s"$s:$key")).otherwise(acc)
    }
    val valueIsState = states.foldRight(lit(null).cast("string")) {
      (s, acc) => when(base === s, lit(s)).otherwise(acc)
    }
    val status =
      when(abandonedFlag && base.isNotNull, lit("abandoned"))
        .when(dropped, lit("dropped"))
        .when(prefixedStatus.isNotNull, prefixedStatus)
        .when(valueIsState.isNotNull, valueIsState)
        .when(base.isNotNull, lit("operating"))
        .otherwise(lit(null).cast("string"))
    val value =
      when(abandonedFlag && base.isNotNull, base)
        .when(dropped, lit(null).cast("string"))
        .when(prefixedStatus.isNotNull, prefixedValue)
        .when(valueIsState.isNotNull,
          coalesce(element_at(tags, valueIsState), lit(null).cast("string")))
        .when(base.isNotNull, base)
        .otherwise(lit(null).cast("string"))
    struct(status.as("status"), value.as("value"))
  }

  /** First of piste:loc_ref, piste:ref, loc_ref, ref (P8). */
  def osmRef(tags: Column): Column =
    coalesce(element_at(tags, "piste:loc_ref"), element_at(tags, "piste:ref"),
      element_at(tags, "loc_ref"), element_at(tags, "ref"))

  /** Collect `name` and `name:*` values, sorted + uniqued, comma-joined;
    * empty result → NULL (P9).
    */
  def osmName(tags: Column): Column = {
    val nameMap = map_filter(tags,
      (k, _) => k === "name" || k.startsWith("name:"))
    val joined = array_join(array_sort(array_distinct(map_values(nameMap))), ", ")
    when(joined === "", lit(null).cast("string")).otherwise(joined)
  }

  /** Strip a leading "{ref} - " / "{ref} " prefix from a name (P9). */
  def stripRefPrefix(name: Column, ref: Column): Column =
    when(ref.isNotNull && name.isNotNull,
      regexp_replace(name,
        concat(lit("^\\Q"), ref, lit("\\E(\\s*-?\\s+|-\\s*)")), lit("")))
      .otherwise(name)

  /** yes/no/1/0/true/false → boolean, anything else → NULL (P10). */
  def tagBoolean(v: Column): Column =
    when(v.isin("yes", "true", "1"), lit(true))
      .when(v.isin("no", "false", "0"), lit(false))
      .otherwise(lit(null).cast("boolean"))
}
