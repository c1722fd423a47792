package graft.operators

import graft.QuerySpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Output-projection formatters (SURVEY P5/P6): the MapboxGL tile
  * properties (`/root/reference/src/transforms/MapboxGLFormatter.ts:40-277`)
  * and the CSV export rows (`/root/reference/src/transforms/CSVFormatter.ts:120-444`)
  * as pure column projections over the formatted feature tables.
  *
  * The color tables and lift-type display text live in the public
  * `openskidata-format` package (not vendored in the reference repo);
  * the mappings here are documented stand-ins with the same SHAPE —
  * convention-aware difficulty color names, hex values, status colors —
  * and the oracle replays exactly these tables.
  *
  * All of P5's interesting semantics are implemented exactly:
  * per-use parallel-line offsets `index - (n-1)/2` over the sorted
  * unique mapped uses (`MapboxGLFormatter.ts:104-121`), name+ref
  * joining, >20-char name shortening at the first '(' , the
  * all-connection run drop; P6: CSV field escaping (quote when the
  * value contains , " ; or newlines, double inner quotes), yes/no/''
  * booleans, elevation metrics from the 3D geometry, toFixed-style
  * number rendering, vertex-average centroid lat/lng at 6 dp.
  */
object OutputFormats {

  // ---- shared mapping tables (documented stand-ins, see object doc) ----
  val ColorValues: Map[String, String] = Map(
    "green" -> "#008000", "blue" -> "#005CE6", "red" -> "#E3001B",
    "black" -> "#000000", "orange" -> "#F7901E", "grey" -> "#808080")

  val LiftTypeText: Map[String, String] = Map(
    "cable_car" -> "Cable Car", "gondola" -> "Gondola",
    "chair_lift" -> "Chairlift", "mixed_lift" -> "Hybrid",
    "drag_lift" -> "Drag lift", "t-bar" -> "T-bar", "j-bar" -> "J-bar",
    "platter" -> "Platter", "rope_tow" -> "Ropetow",
    "magic_carpet" -> "Magic Carpet", "funicular" -> "Funicular",
    "railway" -> "Railway")

  /** Difficulty convention from location (openskidata-format
    * getRunDifficultyConvention is geometry-based; documented stand-in:
    * japan box, americas longitude band, europe elsewhere).
    */
  def difficultyConvention(lon: Column, lat: Column): Column =
    when(lon >= 129.0 && lon <= 146.0 && lat >= 30.0 && lat <= 45.0, "japan")
      .when(lon >= -172.0 && lon <= -40.0, "north_america")
      .otherwise("europe")

  val sqlDifficultyConvention: String =
    """CASE WHEN lon0 >= 129.0 AND lon0 <= 146.0
      |       AND lat0 >= 30.0 AND lat0 <= 45.0 THEN 'japan'
      |     WHEN lon0 >= -172.0 AND lon0 <= -40.0 THEN 'north_america'
      |     ELSE 'europe' END""".stripMargin

  /** Convention-aware difficulty → color name. */
  def runColorName(convention: Column, difficulty: Column): Column =
    when(difficulty.isNull, "grey")
      .when(difficulty === "novice", "green")
      .when(difficulty === "easy",
        when(convention === "europe", "blue").otherwise("green"))
      .when(difficulty === "intermediate",
        when(convention === "north_america", "blue").otherwise("red"))
      .when(difficulty.isin("advanced", "expert"), "black")
      .when(difficulty.isin("freeride", "extreme"), "orange")
      .otherwise("grey")

  def sqlRunColorName(convention: String, difficulty: String): String =
    s"""CASE WHEN $difficulty IS NULL THEN 'grey'
       |     WHEN $difficulty = 'novice' THEN 'green'
       |     WHEN $difficulty = 'easy' THEN
       |       CASE WHEN $convention = 'europe' THEN 'blue' ELSE 'green' END
       |     WHEN $difficulty = 'intermediate' THEN
       |       CASE WHEN $convention = 'north_america' THEN 'blue' ELSE 'red' END
       |     WHEN $difficulty IN ('advanced', 'expert') THEN 'black'
       |     WHEN $difficulty IN ('freeride', 'extreme') THEN 'orange'
       |     ELSE 'grey' END""".stripMargin

  private def mapCase(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  private def sqlMapCase(expr: String, m: Map[String, String]): String =
    "CASE " + m.map { case (k, v) => s"WHEN $expr = '$k' THEN '$v'" }
      .mkString(" ") + " END"

  /** getNameIncludingRef (MapboxGLFormatter.ts:252-262). */
  def nameIncludingRef(name: Column, ref: Column): Column =
    when(ref.isNull, name)
      .when(name.isNull, ref)
      .otherwise(concat(ref, lit(" - "), name))

  /** shortenedName: >20 chars → truncate at first '(' and trim. */
  def shortenedName(name: Column): Column =
    when(name.isNotNull && length(name) > 20,
      trim(substring_index(name, "(", 1))).otherwise(name)

  /** Lift status → line color (documented stand-in table). */
  def liftColor(status: Column): Column =
    when(status === "operating", "#000000")
      .when(status.isin("disused", "abandoned"), "#AA0000")
      .otherwise("#888888")

  // ---- P5: MapboxGL run properties ---------------------------------------
  private val qGlRuns = QuerySpec.of(
    "q_mapbox_runs", {
      val conv = sqlDifficultyConvention.replaceAll("\n", " ")
      val color = sqlRunColorName("conv", "difficulty").replaceAll("\n", " ")
      val hex = sqlMapCase("color_name", OutputFormats.ColorValues)
      s"""WITH ${SkiQueries.oraclePrelude},
        |m AS (
        |  SELECT way_id, name, ref, difficulty, oneway, lit, gladed,
        |    patrolled, grooming,
        |    ($conv) AS conv,
        |    list_sort(list_distinct(list_transform(uses,
        |      u -> CASE WHEN u IN ('downhill', 'nordic', 'skitour')
        |        THEN u ELSE 'other' END))) AS mapped
        |  FROM kept
        |  WHERE len(list_filter(uses, u -> u <> 'connection')) > 0),
        |c AS (
        |  SELECT *, ($color) AS color_name FROM m)
        |SELECT way_id,
        |  CASE WHEN ref IS NULL THEN name
        |       WHEN name IS NULL THEN ref
        |       ELSE ref || ' - ' || name END AS name,
        |  difficulty, conv AS convention, color_name, ($hex) AS color,
        |  oneway, lit, gladed, patrolled, grooming,
        |  CASE WHEN list_contains(mapped, 'downhill')
        |    THEN CAST(list_position(mapped, 'downhill') - 1 AS DOUBLE)
        |      - CAST(len(mapped) - 1 AS DOUBLE) / 2.0 END AS downhill,
        |  CASE WHEN list_contains(mapped, 'nordic')
        |    THEN CAST(list_position(mapped, 'nordic') - 1 AS DOUBLE)
        |      - CAST(len(mapped) - 1 AS DOUBLE) / 2.0 END AS nordic,
        |  CASE WHEN list_contains(mapped, 'skitour')
        |    THEN CAST(list_position(mapped, 'skitour') - 1 AS DOUBLE)
        |      - CAST(len(mapped) - 1 AS DOUBLE) / 2.0 END AS skitour,
        |  CASE WHEN list_contains(mapped, 'other')
        |    THEN CAST(list_position(mapped, 'other') - 1 AS DOUBLE)
        |      - CAST(len(mapped) - 1 AS DOUBLE) / 2.0 END AS other
        |FROM c ORDER BY way_id""".stripMargin
    }) { (s, d) =>
    val kept = SkiQueries.formatted(s, d).filter(col("kept"))
      .filter(exists(col("uses"), u => u =!= "connection"))
    val conv = difficultyConvention(
      element_at(element_at(col("coords"), 1), 1),
      element_at(element_at(col("coords"), 1), 2))
    val mapped = array_sort(array_distinct(transform(col("uses"),
      u => when(u.isin("downhill", "nordic", "skitour"), u)
        .otherwise("other"))))
    def off(v: String): Column =
      when(array_position(col("mapped"), v) > 0,
        (array_position(col("mapped"), v) - 1).cast("double")
          - (size(col("mapped")) - 1).cast("double") / 2.0)
    kept
      .withColumn("convention", conv)
      .withColumn("mapped", mapped)
      .withColumn("color_name",
        runColorName(col("convention"), col("difficulty")))
      .select(col("way_id"),
        nameIncludingRef(col("name"), col("ref")).as("name"),
        col("difficulty"), col("convention"), col("color_name"),
        mapCase(col("color_name"), ColorValues).as("color"),
        col("oneway"), col("lit"), col("gladed"), col("patrolled"),
        col("grooming"),
        off("downhill").as("downhill"), off("nordic").as("nordic"),
        off("skitour").as("skitour"), off("other").as("other"))
      .orderBy("way_id")
  }

  // ---- P5: MapboxGL lift properties --------------------------------------
  private val qGlLifts = QuerySpec.of(
    "q_mapbox_lifts", {
      val typeText = sqlMapCase("lift_type", OutputFormats.LiftTypeText)
      s"""WITH ${SkiQueries.liftOracleCtes},
        |t AS (
        |  SELECT lift_id, status, access, ref, name,
        |    ($typeText) AS type_text
        |  FROM lfmt),
        |n AS (
        |  SELECT lift_id, status, access,
        |    CASE WHEN name IS NULL THEN type_text
        |         ELSE name || ' (' || type_text || ')' END AS nat, ref
        |  FROM t)
        |SELECT lift_id,
        |  CASE WHEN ref IS NULL THEN nat
        |       WHEN nat IS NULL THEN ref
        |       ELSE ref || ' - ' || nat END AS name_and_type,
        |  CASE WHEN status = 'operating' THEN '#000000'
        |       WHEN status IN ('disused', 'abandoned') THEN '#AA0000'
        |       ELSE '#888888' END AS color,
        |  status, access
        |FROM n ORDER BY lift_id""".stripMargin
    }) { (s, d) =>
    val typeText = mapCase(col("lift_type"), LiftTypeText)
    SkiQueries.formattedLifts(s, d)
      .withColumn("type_text", typeText)
      .withColumn("nat",
        when(col("name").isNull, col("type_text"))
          .otherwise(concat(col("name"), lit(" ("), col("type_text"),
            lit(")"))))
      .select(col("lift_id"),
        nameIncludingRef(col("nat"), col("ref")).as("name_and_type"),
        liftColor(col("status")).as("color"),
        col("status"), col("access"))
      .orderBy("lift_id")
  }

  // ---- P6: CSV run export rows -------------------------------------------
  // Full CSVFormatter.formatRun column layout; places/skiAreas/sources
  // are not modeled here and render as the reference's empty strings.
  private val qCsvRuns = QuerySpec.of(
    "q_csv_runs", {
      val conv = sqlDifficultyConvention.replaceAll("\n", " ")
      val color = sqlRunColorName(s"($conv)", "difficulty").replaceAll("\n", " ")
      val h1 = GeoFunctions.sqlHaversineM("lon0", "lat0",
        "(lon0 + dx)", "(lat0 + dy)")
      val h2 = GeoFunctions.sqlHaversineM("(lon0 + dx)", "(lat0 + dy)",
        "(lon0 + dx * 2)", "(lat0 + dy)")
      s"""WITH ${SkiQueries.oraclePrelude},
        |e AS (
        |  SELECT way_id, name, ref, difficulty, oneway, lit, gladed,
        |    patrolled, grooming, uses, wikidata_id, website,
        |    ($conv) AS conv, ($color) AS color_name,
        |    ($h1) AS hav1, ($h2) AS hav2,
        |    l_quantity AS dz1, l_quantity AS dz2,
        |    z0, (z0 + l_quantity * 2) AS z2,
        |    (0.0 + lat0 + (lat0 + dy) + (lat0 + dy)) / 3 AS clat,
        |    (0.0 + lon0 + (lon0 + dx) + (lon0 + dx * 2)) / 3 AS clon,
        |    md5(concat_ws('|', 'run', CAST(way_id AS VARCHAR), status,
        |      array_to_string(uses, ';'), difficulty, name)) AS id
        |  FROM kept),
        |x AS (
        |  SELECT way_id, id,
        |    CASE WHEN name IS NULL THEN ''
        |      WHEN regexp_matches(name, '[,";\n\r]')
        |        THEN '"' || replace(name, '"', '""') || '"'
        |      ELSE name END AS name_esc,
        |    coalesce(ref, '') AS ref_esc,
        |    coalesce(difficulty, '') AS difficulty_s, color_name,
        |    CASE WHEN oneway IS NULL THEN ''
        |         WHEN oneway THEN 'yes' ELSE 'no' END AS oneway_s,
        |    CASE WHEN lit IS NULL THEN ''
        |         WHEN lit THEN 'yes' ELSE 'no' END AS lit_s,
        |    CASE WHEN gladed IS NULL THEN ''
        |         WHEN gladed THEN 'yes' ELSE 'no' END AS gladed_s,
        |    CASE WHEN patrolled IS NULL THEN ''
        |         WHEN patrolled THEN 'yes' ELSE 'no' END AS patrolled_s,
        |    coalesce(grooming, '') AS grooming_s,
        |    array_to_string(uses, ';') AS uses_s,
        |    CAST(CAST(floor(sqrt(hav1 * hav1 + dz1 * dz1)
        |      + sqrt(hav2 * hav2 + dz2 * dz2) + 0.5) AS BIGINT) AS VARCHAR) AS inclined_s,
        |    '0' AS descent_s,
        |    CAST(CAST(floor(dz1 + dz2 + 0.5) AS BIGINT) AS VARCHAR) AS ascent_s,
        |    printf('%.2f', (dz1 + dz2) / (hav1 + hav2) * 100) AS avg_pitch_s,
        |    printf('%.2f', greatest(dz1 / hav1 * 100, dz2 / hav2 * 100)) AS max_pitch_s,
        |    CAST(CAST(floor(z0 + 0.5) AS BIGINT) AS VARCHAR) AS min_elev_s,
        |    CAST(CAST(floor(z2 + 0.5) AS BIGINT) AS VARCHAR) AS max_elev_s,
        |    conv, coalesce(wikidata_id, '') AS wikidata_s,
        |    coalesce(website, '') AS websites_s,
        |    printf('%.6f', clat) AS lat_s, printf('%.6f', clon) AS lng_s
        |  FROM e)
        |SELECT way_id,
        |  concat_ws(',', name_esc, ref_esc, '', '', '', '', difficulty_s,
        |    color_name, oneway_s, lit_s, gladed_s, patrolled_s, grooming_s,
        |    uses_s, inclined_s, descent_s, ascent_s, avg_pitch_s,
        |    max_pitch_s, min_elev_s, max_elev_s, conv, wikidata_s,
        |    websites_s, 'https://openskimap.org/?obj=' || id, id,
        |    'LineString', lat_s, lng_s, '', '', '') AS line
        |FROM x ORDER BY way_id""".stripMargin
    }) { (s, d) =>
    val kept = SkiQueries.formatted(s, d).filter(col("kept"))
    def pt(i: Int, j: Int) = element_at(element_at(col("coords"), i), j)
    val hav1 = GeoFunctions.haversineM(pt(1, 1), pt(1, 2), pt(2, 1), pt(2, 2))
    val hav2 = GeoFunctions.haversineM(pt(2, 1), pt(2, 2), pt(3, 1), pt(3, 2))
    val dz1 = pt(2, 3) - pt(1, 3)
    val dz2 = pt(3, 3) - pt(2, 3)
    def esc(c: Column): Column =
      when(c.isNull, "")
        .when(c.rlike("[,\";\\n\\r]"),
          concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))
        .otherwise(c)
    def yn(c: Column): Column =
      when(c.isNull, "").when(c, "yes").otherwise("no")
    def fixed0(c: Column): Column =
      floor(c + 0.5).cast("long").cast("string")
    val centroid = GeoFunctions.centroid(col("coords"))
    kept
      .withColumn("conv", difficultyConvention(pt(1, 1), pt(1, 2)))
      .withColumn("color_name",
        runColorName(col("conv"), col("difficulty")))
      .select(col("way_id"), concat_ws(",",
        esc(col("name")), coalesce(col("ref"), lit("")),
        lit(""), lit(""), lit(""), lit(""),
        coalesce(col("difficulty"), lit("")), col("color_name"),
        yn(col("oneway")), yn(col("lit")), yn(col("gladed")),
        yn(col("patrolled")), coalesce(col("grooming"), lit("")),
        concat_ws(";", col("uses")),
        fixed0(sqrt(hav1 * hav1 + dz1 * dz1) + sqrt(hav2 * hav2 + dz2 * dz2)),
        fixed0(greatest(-dz1, lit(0.0)) + greatest(-dz2, lit(0.0))),
        fixed0(greatest(dz1, lit(0.0)) + greatest(dz2, lit(0.0))),
        format_string("%.2f", (dz1 + dz2) / (hav1 + hav2) * 100),
        format_string("%.2f",
          greatest(dz1 / hav1 * 100, dz2 / hav2 * 100)),
        fixed0(pt(1, 3)), fixed0(pt(3, 3)),
        col("conv"), coalesce(col("wikidata_id"), lit("")),
        coalesce(col("website"), lit("")),
        concat(lit("https://openskimap.org/?obj="), col("id")), col("id"),
        lit("LineString"),
        format_string("%.6f", centroid.getField("lat")),
        format_string("%.6f", centroid.getField("lon")),
        lit(""), lit(""), lit("")).as("line"))
      .orderBy("way_id")
  }

  val specs: Seq[QuerySpec] = Seq(qGlRuns, qGlLifts, qCsvRuns)
}
