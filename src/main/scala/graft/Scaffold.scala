package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once persisted scaffold tables (phase artifacts), keyed by a
  * dataset fingerprint — the Spark analog of the reference's phase
  * files (`/root/reference/src/PrepareGeoJSON.ts:95-270`): each
  * expensive preparation stage (normalized run geometry, the minhash
  * signature index, the ANN bucket index) is MATERIALIZED once per
  * input dataset and every consumer — including re-executions in the
  * same or a later JVM — reads the artifact instead of recomputing
  * the stage.
  *
  * Why not `localCheckpoint` + a process-local memo (the previous
  * design):
  *  - `localCheckpoint` blocks are not fault-tolerant: an executor
  *    loss invalidates them mid-job at cluster scale;
  *  - a JVM memo dies with the process, so the measured cost of a
  *    query depends on JVM warmth instead of the query (identical
  *    code benched 20.2 s and 4.9 s across rounds);
  *  - parquet artifacts survive restarts, are readable by any
  *    SparkSession (no session-keyed cache bugs), and are visible to
  *    the planner — column pruning and filter pushdown apply to the
  *    scaffold scan like any other source.
  *
  * Location: `spark.graft.scaffoldDir` conf, else
  * `SPARK_GRAFT_SCAFFOLD_DIR` env, else a per-user directory under
  * `java.io.tmpdir` (the same place Spark puts its own local dirs).
  * At warehouse scale this would be a dfs:// path owned by the ingest
  * pipeline.
  *
  * Concurrency: a JVM-local per-key lock serializes first-builders in
  * one process; cross-process races are benign — the build writes to
  * a temp dir and commits via rename, and both racers produce
  * identical deterministic content (the fingerprint pins the input).
  */
object Scaffold {

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scaffoldDir")
      .orElse(sys.env.get("SPARK_GRAFT_SCAFFOLD_DIR"))
      .getOrElse(new java.io.File(
        sys.props("java.io.tmpdir"),
        s"graft-scaffold-${sys.props.getOrElse("user.name", "anon")}")
        .getAbsolutePath)

  /** Fingerprint extended with the ALGORITHM parameters the artifact
    * was built under — an index keyed only by its input data silently
    * serves stale content when a tunable (plane count derivation,
    * k, shingle width, ...) changes between binaries. Call sites pass
    * every constant the build closure reads.
    */
  def paramsKey(fingerprint: String, params: (String, Any)*): String =
    fingerprint + params.map { case (k, v) => s";$k=$v" }.mkString

  private def keyHash(fingerprint: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(fingerprint.getBytes("UTF-8"))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  /** Read the scaffold table `kind` for `fingerprint`, building and
    * persisting it first when absent. The returned DataFrame is a
    * plain parquet scan of the artifact.
    */
  def table(spark: SparkSession, kind: String, fingerprint: String)
           (build: => DataFrame): DataFrame =
    commit(spark, kind, fingerprint, Nil)(build)

  /** Like [[table]] but the artifact is written PARTITIONED by
    * `partCols` (hive-style directories) — consumers that filter or
    * join on those columns get partition pruning (static and dynamic)
    * at planning time instead of scanning the whole artifact. This is
    * the layout a 100 TB fact table actually ships with; the
    * unpartitioned variant is for small index-like artifacts.
    */
  def partitionedTable(spark: SparkSession, kind: String,
      fingerprint: String, partCols: Seq[String])
      (build: => DataFrame): DataFrame =
    commit(spark, kind, fingerprint, partCols)(build)

  private def commit(spark: SparkSession, kind: String,
      fingerprint: String, partCols: Seq[String])
      (build: => DataFrame): DataFrame = {
    val dir = new Path(root(spark), s"$kind-${keyHash(fingerprint)}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val done = new Path(dir, "_SUCCESS")
    val lock = locks.computeIfAbsent(dir.toString, _ => new Object)
    lock.synchronized {
      if (!fs.exists(done)) {
        // stale partial commit (crashed writer) — clear before rebuild
        if (fs.exists(dir)) fs.delete(dir, true)
        val tmp = new Path(dir.getParent,
          s".${dir.getName}.tmp-${java.util.UUID.randomUUID}")
        val w = build.write.mode("overwrite")
        (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
          .parquet(tmp.toString)
        if (!fs.rename(tmp, dir)) {
          // lost a cross-process race; the winner's artifact is
          // identical (deterministic build keyed by fingerprint)
          fs.delete(tmp, true)
          if (!fs.exists(done))
            sys.error(s"scaffold commit failed for $dir")
        }
      }
    }
    spark.read.parquet(dir.toString)
  }
}
