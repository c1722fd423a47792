package graft.sources

/** External-process runner + tile-command planning (SURVEY §2.8,
  * `/root/reference/src/utils/ProcessRunner.ts:8-39`,
  * `src/transforms/TilesGenerator.ts:7-100`).
  *
  * The reference shells out to `tippecanoe` / `tile-join` for MVT tile
  * generation — inherently out-of-engine work that stays a driver-side
  * post-step here too. What the engine owns: a process wrapper with
  * the same contract (non-zero exit and spawn failure become errors
  * carrying the full command line) and the deterministic tile command
  * PLAN (per-layer tippecanoe invocations + the final tile-join),
  * which is testable without the binaries installed.
  */
object ProcessRunner {

  /** Run a command, inheriting stdio, failing on non-zero exit with
    * the command line in the message (ProcessRunner.ts:21-36).
    */
  def runCommand(command: String, args: Seq[String],
      cwd: Option[String] = None): Unit = {
    val pb = new ProcessBuilder((command +: args): _*)
    cwd.foreach(d => pb.directory(new java.io.File(d)))
    pb.inheritIO()
    val rendered = (command +: args).mkString(" ")
    val code =
      try pb.start().waitFor()
      catch {
        case e: java.io.IOException =>
          throw new RuntimeException(
            s"""Failed to start command "$command": ${e.getMessage}""")
      }
    if (code != 0)
      throw new RuntimeException(
        s"Command failed with exit code $code: $rendered")
  }

  /** One planned invocation. */
  final case class Command(command: String, args: Seq[String])

  /** The tile-generation plan (TilesGenerator.ts:16-97): four
    * per-layer tippecanoe runs (zoom ranges and density flags per
    * layer) followed by one tile-join combining them. Pure planning —
    * callers execute with [[runCommand]].
    */
  def tilesPlan(liftsGeoJson: String, runsGeoJson: String,
      skiAreasGeoJson: String, spotsGeoJson: String,
      workingDir: String, outMbTiles: String): Seq[Command] = {
    def wd(f: String) = s"$workingDir/$f"
    Seq(
      Command("tippecanoe", Seq("-Q", "-o", wd("lifts.mbtiles"), "-f",
        "-z", "15", "-Z", "5", "--simplify-only-low-zooms",
        "--drop-densest-as-needed", s"--named-layer=lifts:$liftsGeoJson")),
      Command("tippecanoe", Seq("-Q", "-o", wd("runs.mbtiles"), "-f",
        "-z", "15", "-Z", "9", "--simplify-only-low-zooms",
        "--drop-densest-as-needed", s"--named-layer=runs:$runsGeoJson")),
      Command("tippecanoe", Seq("-Q", "-o", wd("ski_areas.mbtiles"), "-f",
        "-z", "15", "-Z", "0", "-B", "0", "--drop-densest-as-needed",
        s"--named-layer=skiareas:$skiAreasGeoJson")),
      Command("tippecanoe", Seq("-Q", "-o", wd("spots.mbtiles"), "-f",
        "-z", "15", "-Z", "9", "-B", "10", "--simplify-only-low-zooms",
        "--drop-densest-as-needed", s"--named-layer=spots:$spotsGeoJson")),
      Command("tile-join", Seq("-f", "--no-tile-size-limit", "-o",
        outMbTiles, wd("ski_areas.mbtiles"), wd("runs.mbtiles"),
        wd("lifts.mbtiles"), wd("spots.mbtiles"))))
  }
}
