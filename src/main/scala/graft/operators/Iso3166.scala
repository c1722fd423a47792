package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Vendored public ISO-3166 region table (E3) — the offline stand-in
  * for the reference's `iso3166-2-db` dataset lookup
  * (`/root/reference/src/transforms/Geocoder.ts:268-333`: photon's
  * countrycode/state resolve to `country.iso`, `country.names.en`,
  * and `iso3166_2 = country.iso + "-" + region.iso`; Kosovo ("XK")
  * is special-cased because the dataset lacks it — here it is simply
  * a row of the vendored file).
  *
  * The resource is a ~235-row CSV of public ISO 3166-1 alpha-2
  * country codes and ISO 3166-2 subdivision codes for the main ski
  * countries (full subdivision sets for AT/CH/DE/FR/IT/ES/US/CA/JP;
  * country-only rows elsewhere). Row order in the file IS the
  * deterministic index the geocoding stub picks from, so the Spark
  * and DuckDB sides agree by construction.
  */
object Iso3166 {

  final case class Entry(cc: String, country: String,
      regionIso: Option[String], regionName: Option[String]) {
    /** "CC-RR" per the reference's iso3166_2 rendering; None for
      * country-only rows.
      */
    def iso2: Option[String] = regionIso.map(r => s"$cc-$r")
  }

  /** File-order entries (the lookup index). */
  lazy val entries: IndexedSeq[Entry] = {
    val in = getClass.getResourceAsStream("/graft/iso3166.csv")
    require(in != null, "vendored /graft/iso3166.csv missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val f = line.split(",", -1)
      Entry(f(0), f(1),
        Option(f(2)).filter(_.nonEmpty), Option(f(3)).filter(_.nonEmpty))
    }.toIndexedSeq
    finally src.close()
  }

  def size: Int = entries.size

  /** The table as a DataFrame for broadcast joins (idx = file order). */
  def table(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.zipWithIndex.map { case (e, i) =>
      (i, e.cc, e.country, e.regionIso.orNull, e.regionName.orNull,
        e.iso2.orNull)
    }.toDF("idx", "cc", "country", "region_iso", "region_name", "iso3166_2")
  }

  /** DuckDB list literal of iso3166_2 codes ('' for country-only
    * rows), 1-based-indexable: `(${sqlIso2List})[idx + 1]`.
    */
  lazy val sqlIso2List: String =
    entries.map(e => "'" + e.iso2.getOrElse("").replace("'", "''") + "'")
      .mkString("[", ",", "]")

  /** DuckDB list literal of alpha-2 country codes. */
  lazy val sqlCcList: String =
    entries.map(e => "'" + e.cc + "'").mkString("[", ",", "]")
}
