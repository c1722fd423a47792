package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a [[QuerySpec]] in one of the
  * module registries below; this object is just the aggregation point.
  */
object SparkEntry {

  /** All registered operator modules. */
  def allSpecs: Seq[QuerySpec] =
    operators.RelationalQueries.specs ++
      operators.TpchSuite.specs ++
      operators.TextAnalysis.specs ++
      operators.Pii.specs ++
      operators.Dedup.specs ++
      operators.Corpus.specs ++
      operators.CorpusProfile.specs ++
      operators.QualityModel.specs ++
      operators.Similarity.specs ++
      operators.Events.specs ++
      operators.AsofJoin.specs ++
      operators.RangeJoin.specs ++
      operators.SkiQueries.specs ++
      operators.MultiPart.specs ++
      operators.OutputFormats.specs ++
      operators.SnowCover.specs ++
      operators.LiftStations.specs ++
      operators.Geocoding.specs ++
      operators.Statistics.specs ++
      operators.SkiAreaOps.specs ++
      operators.ClusterPipeline.specs ++
      operators.Multimodal.specs ++
      operators.Enrichment.specs ++
      operators.TerrainTiles.specs ++
      operators.PipelineE2E.specs ++
      operators.SpatialLayout.specs ++
      operators.GeoPackage.specs ++
      operators.MvtTiles.specs ++
      operators.Validity.specs ++
      operators.ViewportHint.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Benchmark headline set (subset of queries). */
  def headlines: Seq[QuerySpec] = allSpecs.filter(_.headline)
}
