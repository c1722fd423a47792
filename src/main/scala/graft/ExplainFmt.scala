package graft

import org.apache.spark.sql.SparkSession

/** Per-query `.explain("formatted")` dump for the optimization-round
  * plan artifacts (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *   sbt "runMain graft.ExplainFmt plans/r18 after q_ski_normalize ..."
  *
  * Args: <outDir> <suffix> <queryName>... — writes
  * `<outDir>/<queryName>_<suffix>.txt` containing the formatted
  * physical plan exactly as `df.explain("formatted")` prints it.
  * Session config mirrors [[Explain]] (the bench/verify settings), so
  * the dumped shapes are the shapes the driver runs. Engine-shape
  * switches (`spark.graft.tiles.streamEncode`,
  * `spark.graft.normalize.streamSegments`) are honored from
  * `SPARK_GRAFT_EXPLAIN_CONF` as `k=v,k=v` so a "before" dump can
  * reconstruct the prior round's plan from the same binary.
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainFmt <outDir> <suffix> <queryName>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val builder = SparkSession.builder()
      .master("local[32]")
      .appName("graft-explain-fmt")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXPLAIN_CONF").foreach { kvs =>
      kvs.split(',').filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)

    // phase pseudo-queries: subplans that the full query hides behind
    // a localCheckpoint barrier (combineSegments checkpoints its
    // input, so q_ski_normalize's dumped plan starts at the
    // checkpoint — the split shape is only visible here)
    val phases: Map[String, (SparkSession, String)
        => org.apache.spark.sql.DataFrame] = Map(
      "phase_normalize_split" -> ((s, d) =>
        operators.Normalization.splitSharedArcs(
          operators.SkiQueries.normalizeInput(s, d))),
      // q_corpus_prep's quality→dedup→split lineage, minus the
      // checkpoint that hides it from the full-query dump: _r17 is
      // the pre-optimization double-derivation shape (kept verbatim
      // in CorpusPrepProfile), the other the shipped one-scan shape
      "phase_corpus_prep_split_r17" -> ((s, d) =>
        operators.CorpusPrepProfile.r17Split(s, d)),
      "phase_corpus_prep_ck" -> ((s, d) =>
        operators.CorpusPrepProfile.r18CkFrame(s, d)),
      // q_pipeline_e2e's enrichment frame, minus the localCheckpoint
      // that hides it from the full-query dump: _r17 is the retired
      // zarr-collect/zip_with/wide shape (kept verbatim in
      // PipelineProfile), the other the shipped narrow scalar shape
      "phase_pipeline_enrich_r17" -> ((s, d) =>
        operators.PipelineProfile.r17Enriched(s, d)),
      "phase_pipeline_enrich" -> ((s, d) =>
        operators.PipelineProfile.r18Enriched(s, d)))

    val registry = SparkEntry.queries ++ phases
    names.foreach { name =>
      val fn = registry.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val hdr = s"# $name — explain(formatted) at $sfDir" +
        sys.env.get("SPARK_GRAFT_EXPLAIN_CONF")
          .map(c => s" (conf: $c)").getOrElse("") + "\n\n"
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        (hdr + txt).getBytes("UTF-8"))
      println(s"[explain-fmt] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
