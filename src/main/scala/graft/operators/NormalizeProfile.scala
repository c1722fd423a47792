package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the N1→N3 normalization pipeline
  * (VERDICT r17 #4: attribute the sf1 `q_ski_normalize` solo figure
  * the way MvtProfile attributes the tile pipeline). Times each stage
  * in isolation so the dominant cost is named — quantized edge
  * explode vs the (lo,hi) arc exchange vs the per-run window
  * segmentation vs the owner re-collect vs deg-2/CC/stitch — rather
  * than guessed. Not part of the bench or the correctness surface;
  * run with `sbt "runMain graft.operators.NormalizeProfile"`
  * (honors SPARK_GRAFT_SF_DIR).
  *
  * Stage frames B-E re-run their upstream each time (same by-name
  * re-eval caveat as MvtProfile: deep-JIT warming reads a little
  * below a cold bench run); the F stages isolate combineSegments
  * behind a localCheckpoint of the segments so downstream timings
  * don't re-pay the split.
  */
object NormalizeProfile {
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
      graft.DiskLock.acquire(s"graft.operators.NormalizeProfile $sfDir")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-normalize-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        aggFallback)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages: Option[Seq[String]] = sys.env.get("SPARK_GRAFT_NORM_STAGES")
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
    val dup = SkiQueries.normalizeInput(s, d)
    println("input runs: " + dup.count())
    println("edge rows:  " + Normalization.edgesOf(dup).count())
    time("A_input")(dup)
    time("B_edges")(Normalization.edgesOf(dup))
    time("C_arc_exchange")(
      Normalization.arcMembers(Normalization.edgesOf(dup)))
    time("D_window_segment")(
      Normalization.segmented(
        Normalization.arcMembers(Normalization.edgesOf(dup))))
    time("E_split_full")(Normalization.splitSharedArcs(dup))
    // isolate N3 behind a checkpoint of the split output
    val segs = Normalization.splitSharedArcs(dup).localCheckpoint()
    time("F1_deg2_pairs")(Normalization.deg2Pairs(segs))
    time("F2_cc_labels")(
      Clustering.minLabelComponents(Normalization.deg2Pairs(segs)))
    time("F3_combine_full")(Normalization.combineSegments(segs))
    time("G_full_query")(
      graft.SparkEntry.queries("q_ski_normalize")(s, d))
    spark.stop()
  }
}
