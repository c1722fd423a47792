package graft

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Paths, StandardOpenOption}

/** Process-exclusive advisory lock serializing the two disk-heavy
  * phases that ENOSPC'd each other twice in round 16: a Spark
  * sf1-size Verify / tile extraction stages ~17 GB of temp files
  * while the DuckDB oracle compare's materialized CTE chain spills
  * ~50 GB — each fits the disk alone, together they don't. The rule
  * "never run them concurrently" lived in SKILL.md prose; this makes
  * it mechanical (VERDICT r16 #5).
  *
  * The lock file is `/tmp/graft_disk.lock`, taken via NIO
  * [[FileChannel#lock]] — POSIX `fcntl` record locks on Linux, the
  * same namespace `tools/check.py` uses through Python's
  * `fcntl.lockf` (NOT `flock()`, which is a disjoint lock type and
  * would never collide). Held until JVM exit; `fcntl` locks die with
  * the process, so a crashed holder can never wedge the next run.
  */
object DiskLock {

  val Path = "/tmp/graft_disk.lock"

  /** Inputs at least this large make a run "disk-heavy": the sf0.1
    * fixture is ~17 MB (compressed parquet) and stages nothing
    * material; the sf1 scaffold is ~154 MB on disk but its extraction
    * staging + shuffle spill expand to tens of GB — which is what
    * collided with the oracle's spill. Same 64 MB fixture-vs-scale
    * cutover as the agg-fallback heuristic, so every dev-loop
    * invocation stays lock-free and every at-scale one serializes.
    */
  val HeavyInputBytes: Long = 64L * 1024 * 1024

  // STRONG references for the JVM lifetime: POSIX record locks die
  // with the file descriptor, and JDK file descriptors are closed by
  // a Cleaner when unreachable — without these fields the lock
  // silently evaporated at the first post-acquire GC (observed: a
  // Verify that had just written the lock file lost the lock during
  // SparkSession startup and a concurrent check.py sailed through)
  @volatile private var channelRef: FileChannel = _
  @volatile private var lockRef: java.nio.channels.FileLock = _

  private[graft] def held: Boolean = lockRef != null

  /** Block until the advisory lock is ours. Idempotent per process. */
  def acquire(why: String): Unit = synchronized {
    if (held) return
    val ch = FileChannel.open(Paths.get(Path),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val tryLock = try ch.tryLock() catch { case _: Throwable => null }
    val lock =
      if (tryLock != null) tryLock
      else {
        // name the blocker: the holder wrote "why pid=" into the lock
        // file at acquire time, so a stuck wait says WHO holds it
        // (VERDICT r17 #7 — both sides print the holder)
        val holder =
          try {
            val s = java.nio.file.Files.readString(
              Paths.get(Path), StandardCharsets.UTF_8).trim
            if (s.nonEmpty) s else "unknown holder"
          } catch { case _: Throwable => "unknown holder" }
        System.err.println(s"[disklock] waiting for $Path " +
          s"(held by: $holder) — $why")
        ch.lock()
      }
    ch.truncate(0)
    ch.write(java.nio.ByteBuffer.wrap(
      s"$why pid=${ProcessHandle.current().pid()}\n"
        .getBytes(StandardCharsets.UTF_8)))
    channelRef = ch
    lockRef = lock // held (and auto-released) for the JVM lifetime
  }
}
