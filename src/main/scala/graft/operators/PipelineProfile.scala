package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Dev-only stage profiler for `q_pipeline_e2e` (round 18: attribute
  * the sf1 solo figure the way NormalizeProfile attributes normalize).
  * Times each stage in isolation AND keeps the round-17 enrichment
  * lineage (sort_array(collect_list) zarr + zip_with coords3d + wide
  * checkpoint) side by side with the round-18 shape (four scalar
  * z aggregates + pre-checkpoint length + narrow checkpoint), so a
  * regression in either shape is attributable to a named frame rather
  * than guessed — [[r17Enriched]] is the attribution record of the
  * retired shape and the `phase_pipeline_enrich_r17` plan artifact's
  * source. Not part of the bench or the correctness surface; run with
  * `sbt "runMain graft.operators.PipelineProfile"` (honors
  * SPARK_GRAFT_SF_DIR, SPARK_GRAFT_PIPE_STAGES prefix filter).
  */
object PipelineProfile {

  private val CellDeg = 0.01
  private val RadiusM = 500.0

  private def qix(c: Column): Column =
    (c * 1e7 + when(c >= 0, 0.5).otherwise(-0.5)).cast("long")
  private def packKey(x: Column, y: Column): Column =
    shiftleft(x, 32).bitwiseOR(y.bitwiseAND(lit(0xFFFFFFFFL)))
  private def keyStr(k: Column): Column = concat_ws("_",
    shiftright(k, 32), shiftright(shiftleft(k, 32), 32))

  /** The stage-2 artifact exactly as the query reads it (same scaffold
    * key, so the profile and the query share one materialization).
    */
  def normScaffold(s: SparkSession, d: String): DataFrame =
    graft.Scaffold.table(s, "pipeline-norm", SkiFeatures.memoKey(s, d)) {
      val fk = SkiQueries.formatted(s, d).filter(col("kept"))
      val propsCol = struct(
        col("uses"), col("name"), col("ref"), col("difficulty"),
        col("grooming"), col("status"), col("oneway"), col("gladed"),
        col("patrolled"), col("snowmaking"), col("snowfarming"),
        col("tunnel"), col("lit"), col("wikidata_id"))
      val base = fk.select(col("way_id").as("run_id"), propsCol.as("props"),
        col("coords"))
      val dupProps = struct(
        array(lit("skitour")).as("uses"), lit("ZDUP").as("name"),
        lit(null).cast("string").as("ref"), lit("novice").as("difficulty"),
        lit(null).cast("string").as("grooming"), lit("operating").as("status"),
        lit(false).as("oneway"), lit(null).cast("boolean").as("gladed"),
        lit(true).as("patrolled"), lit(null).cast("boolean").as("snowmaking"),
        lit(null).cast("boolean").as("snowfarming"),
        lit(null).cast("boolean").as("tunnel"),
        lit(null).cast("boolean").as("lit"), lit("Q1").as("wikidata_id"))
      val overlap = fk.filter(pmod(col("way_id"), lit(10)) === 4)
        .select((col("way_id") + 1000000000L).as("run_id"),
          dupProps.as("props"), slice(col("coords"), 2, 2).as("coords"))
      Normalization.normalizeRuns(base.unionByName(overlap),
        Normalization.RunPropsLattice)
    }

  private def withEnds(norm: DataFrame): DataFrame =
    norm.select(col("run_id").as("okey"),
      col("props.uses").as("uses"),
      coalesce(col("props.difficulty"), lit("other")).as("difficulty"),
      col("props"), col("coords"),
      qix(element_at(element_at(col("coords"), 1), 1)).as("x0"),
      qix(element_at(element_at(col("coords"), 1), 2)).as("y0"),
      qix(element_at(element_at(col("coords"), -1), 1)).as("xn"),
      qix(element_at(element_at(col("coords"), -1), 2)).as("yn"))

  private def pts(norm: DataFrame): DataFrame =
    norm.select(col("run_id").as("okey"),
        posexplode(col("coords")).as(Seq("pidx", "pt")))
      .select(col("okey"), col("pidx"),
        packKey(qix(element_at(col("pt"), 1)),
          qix(element_at(col("pt"), 2))).as("key"))

  private def cacheOf(s: SparkSession, norm: DataFrame): DataFrame = {
    val emptyCache = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "key bigint, value double"))
    Enrichment.cacheAside(pts(norm).select("key"), emptyCache, lit(true),
      missing => missing.select(col("key"),
        Enrichment.stubElevation(keyStr(col("key"))).as("value")))._1
  }

  private def segZ4(s: SparkSession, norm: DataFrame): DataFrame =
    pts(norm).join(cacheOf(s, norm), Seq("key"))
      .groupBy("okey")
      .agg(min_by(col("value"), col("pidx")).as("z_start"),
        max_by(col("value"), col("pidx")).as("z_end"),
        min(col("value")).as("z_min"), max(col("value")).as("z_max"))

  private def segZarr(s: SparkSession, norm: DataFrame): DataFrame =
    pts(norm).join(cacheOf(s, norm), Seq("key"))
      .groupBy("okey")
      .agg(transform(
        sort_array(collect_list(struct(col("pidx"), col("value")))),
        p => p.getField("value")).as("zarr"))

  /** Round-18 enrichment frame (pre-checkpoint): four scalar z
    * aggregates, geodesic length computed here, narrow output.
    */
  def r18Enriched(s: SparkSession, d: String): DataFrame = {
    val norm = normScaffold(s, d)
    withEnds(norm).join(segZ4(s, norm), Seq("okey"))
      .select(col("okey"), col("uses"), col("difficulty"),
        col("x0"), col("y0"), col("xn"), col("yn"),
        col("z_start"), col("z_end"), col("z_min"), col("z_max"),
        lineLengthM(col("coords")).as("len_m"))
  }

  /** Round-17 enrichment frame (pre-checkpoint), kept verbatim as the
    * attribution record: zarr collect + zip_with 3-D rebuild + wide
    * output (coords3d rode the checkpoint; length was computed later,
    * per assigned row, from coords3d whose z the kernel ignores).
    */
  def r17Enriched(s: SparkSession, d: String): DataFrame = {
    val norm = normScaffold(s, d)
    withEnds(norm).drop("uses", "difficulty")
      .join(segZarr(s, norm), Seq("okey"))
      .withColumn("coords3d", zip_with(col("coords"), col("zarr"),
        (p, z) => array(element_at(p, 1), element_at(p, 2), z)))
      .withColumn("z_start", element_at(col("zarr"), 1))
      .withColumn("z_end", element_at(col("zarr"), -1))
      .withColumn("z_min", array_min(col("zarr")))
      .withColumn("z_max", array_max(col("zarr")))
      .drop("zarr")
  }

  private def cluster(s: SparkSession, d: String,
      enr: DataFrame): DataFrame = {
    val startIsAnchor = col("x0") < col("xn") ||
      (col("x0") === col("xn") && col("y0") <= col("yn"))
    val objs = enr.select(col("okey"), col("uses"),
      (when(startIsAnchor, col("x0")).otherwise(col("xn"))
        .cast("double") / 1e7).as("lon"),
      (when(startIsAnchor, col("y0")).otherwise(col("yn"))
        .cast("double") / 1e7).as("lat"))
    val areas = graft.Tables.orders(s, d)
      .filter(pmod(col("o_orderkey"), lit(37)) === 0)
      .select(col("o_orderkey").as("area_id"),
        when(pmod(col("o_orderkey"), lit(2)) === 0, "downhill")
          .otherwise("nordic").as("act"),
        (pmod(col("o_orderkey") * 7919, lit(360000)).cast("double") / 1000.0
          - 180.0).as("lon"),
        (pmod(col("o_orderkey") * 104729, lit(120000)).cast("double")
          / 1000.0 - 60.0).as("lat"))
    Clustering.transitiveAssign(areas, objs, RadiusM, CellDeg)
  }

  private def statsTail(assigned: DataFrame): DataFrame =
    assigned.groupBy("area_id", "difficulty")
      .agg(count(lit(1)).as("n"), sum("len_m").as("len_m"),
        min(col("z_min")).as("zmin"), max(col("z_max")).as("zmax"),
        sum(abs(col("z_end") - col("z_start"))).as("dz"))
      .groupBy("area_id")
      .agg(sum("n").as("n_segments"),
        (floor((sum("len_m") / 1000.0) * 1e4 + 0.5) / 1e4).as("total_km"),
        array_join(array_sort(collect_list(
          concat(col("difficulty"), lit(":"), col("n")))), ";")
          .as("difficulties"),
        (floor((min("zmin")) * 1e1 + 0.5) / 1e1).as("min_elev"),
        (floor((max("zmax")) * 1e1 + 0.5) / 1e1).as("max_elev"),
        (floor((sum("dz")) * 1e2 + 0.5) / 1e2).as("vertical_m"))
      .orderBy("area_id")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sfBytes: Long =
      try {
        val root = java.nio.file.Paths.get(sfDir)
        if (java.nio.file.Files.isDirectory(root)) {
          val st = java.nio.file.Files.walk(root)
          try st.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally st.close()
        } else 0L
      } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    val aggFallback = sys.env.getOrElse("SPARK_GRAFT_AGG_FALLBACK",
      if (sfBytes <= 64L * 1024 * 1024 ||
          Runtime.getRuntime.maxMemory >= 40L * 1024 * 1024 * 1024)
        "10000000"
      else "128")
    if (sfBytes >= graft.DiskLock.HeavyInputBytes)
      graft.DiskLock.acquire(s"graft.operators.PipelineProfile $sfDir")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pipeline-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        aggFallback)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages: Option[Seq[String]] = sys.env.get("SPARK_GRAFT_PIPE_STAGES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def time(name: String)(df: => DataFrame): Unit = {
      if (stages.exists(ps => !ps.exists(name.startsWith(_)))) return
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
    }

    val s = spark; val d = sfDir
    val norm = normScaffold(s, d)
    println("norm rows:  " + norm.count())
    println("pos rows:   " + norm.select(posexplode(col("coords"))).count())

    time("A_norm_read")(norm)
    time("B_pts_explode")(pts(norm))
    time("C_cache_aside")(cacheOf(s, norm))
    time("D1_segZ_agg4_new")(segZ4(s, norm))
    time("D2_segZ_collect_old")(segZarr(s, norm))
    time("E1_enriched_new")(r18Enriched(s, d))
    time("E2_enriched_old")(r17Enriched(s, d))
    time("E3_len_only")(withEnds(norm).select(col("okey"),
      lineLengthM(col("coords")).as("len_m")))

    val enrCk = r18Enriched(s, d).localCheckpoint()
    time("F_cluster_on_ck")(cluster(s, d, enrCk))
    val asgCk = cluster(s, d, enrCk).localCheckpoint()
    time("G_stats_tail")(statsTail(enrCk.join(asgCk, Seq("okey"))))
    time("H_full_query")(
      graft.SparkEntry.queries("q_pipeline_e2e")(s, d))

    // ---- full-query variants, built inline, to bisect a composition
    // difference the per-frame timings can't see: each V frame pays
    // enriched construction + checkpoint + cluster loop + stats tail.
    def fullOld: DataFrame = {
      val enr = r17Enriched(s, d).localCheckpoint()
      val withUses = enr.withColumn("uses", col("props.uses"))
      val asg = cluster(s, d, withUses)
      statsTail(enr.join(asg, Seq("okey"))
        .withColumn("len_m", lineLengthM(col("coords3d")))
        .withColumn("difficulty",
          coalesce(col("props.difficulty"), lit("other"))))
    }
    def fullNew: DataFrame = {
      val enr = r18Enriched(s, d).localCheckpoint()
      statsTail(enr.join(cluster(s, d, enr), Seq("okey")))
    }
    time("V1_full_old_inline")(fullOld)
    time("V2_full_new_inline")(fullNew)
    spark.stop()
  }
}
