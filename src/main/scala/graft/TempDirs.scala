package graft

import java.nio.file.{Files, Path}

/** Temp directories that clean themselves up at JVM exit.
  *
  * Several artifact gates (the .mbtiles container, tile-directory
  * extraction, the GeoPackage db, bucketed-join warehouses, streaming
  * checkpoints) stage their work under `Files.createTempDirectory` —
  * and the query closures can't delete eagerly because the returned
  * DataFrame is consumed lazily AFTER the closure returns. Left alone,
  * an at-scale run leaks the staging (the r16 sf1 sweep filled the
  * disk: each tile extraction stages ~17 GB of z/x/y files, and three
  * sweeps' worth of debris ate 50 GB). A shutdown hook bounds the
  * leak to one process lifetime: Verify/Bench exit → staging gone.
  */
object TempDirs {

  def scoped(prefix: String): Path = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(dir)))
    dir
  }

  /** Best-effort recursive delete (shutdown context: never throws). */
  def deleteTree(root: Path): Unit =
    try {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => try Files.deleteIfExists(p) catch {
          case _: Throwable => ()
        })
      finally s.close()
    } catch { case _: Throwable => () }
}
