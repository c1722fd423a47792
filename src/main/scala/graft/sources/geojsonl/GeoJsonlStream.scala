package graft.sources.geojsonl

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch streaming over a growing directory of GeoJSONL shards —
  * `spark.readStream.format("geojsonl").load(dir)` tails the directory
  * the way the batch sink (or any external producer) appends to it.
  *
  * Offsets are positions in a write-ahead file list persisted under
  * the query's checkpoint location as VERSIONED files
  * (`<checkpoint>/graft-file-list.v{N}`): each `latestOffset` lists
  * the directory, appends files not seen before (sorted listing for a
  * deterministic order within one batch), and persists the log by
  * writing a hidden temp and renaming it to the NEXT version — the
  * previous version is deleted only after the new one exists, so a
  * crash at any instant leaves at least one complete log on disk
  * (delete-then-rename had a window that left none, bricking the
  * checkpoint). Restart reads the highest version (falling back to
  * the legacy unversioned `graft-file-list` name), so committed
  * offsets keep meaning the same files even when later-arriving files
  * sort before earlier ones — a plain re-listing would silently remap
  * offsets. The directory is assumed append-only, the same contract
  * as Spark's own file stream source.
  */
private[geojsonl] class GeoJsonlMicroBatchStream(path: String,
    fields: Array[String], permissive: Boolean, checkpointLocation: String,
    conf: SerializableConfiguration,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends MicroBatchStream {

  private val LogBaseName = "graft-file-list"
  private val logDir = new Path(checkpointLocation)
  private val known = scala.collection.mutable.ArrayBuffer[String]()
  private val seen = scala.collection.mutable.HashSet[String]()
  private var logVersion = 0L

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith(LogBaseName + ".v"))
      name.stripPrefix(LogBaseName + ".v").toLongOption
    else None

  // restart: rebuild the append-ordered list from the newest complete
  // log version (hidden .tmp files from an interrupted write never
  // match the versioned name and are ignored)
  locally {
    val fs = logDir.getFileSystem(conf.value)
    val latest: Option[Path] =
      if (!fs.exists(logDir)) None
      else {
        val versioned = fs.listStatus(logDir).map(_.getPath)
          .flatMap(p => versionOf(p.getName).map(v => (v, p)))
        if (versioned.nonEmpty) {
          val (v, p) = versioned.maxBy(_._1)
          logVersion = v
          Some(p)
        } else {
          val legacy = new Path(logDir, LogBaseName)
          if (fs.exists(legacy)) Some(legacy) else None
        }
      }
    latest.foreach { p =>
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(p), StandardCharsets.UTF_8))
      try {
        var line = in.readLine()
        while (line != null) {
          if (line.nonEmpty && seen.add(line)) known += line
          line = in.readLine()
        }
      } finally in.close()
    }
  }

  private def persistLog(): Unit = {
    val fs = logDir.getFileSystem(conf.value)
    fs.mkdirs(logDir)
    val tmp = new Path(logDir,
      s".$LogBaseName.tmp-${java.util.UUID.randomUUID}")
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(tmp, true), StandardCharsets.UTF_8))
    try known.foreach { f => out.write(f); out.write("\n") }
    finally out.close()
    val next = logVersion + 1
    val dest = new Path(logDir, s"$LogBaseName.v$next")
    // the destination name is fresh, so no delete precedes the rename
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"rename $tmp -> $dest failed")
    logVersion = next
    // older versions (and the legacy unversioned name) are garbage
    // only once the new version exists; cleanup failure is harmless —
    // the next restart still picks the max version
    fs.listStatus(logDir).map(_.getPath).foreach { p =>
      val stale = versionOf(p.getName).exists(_ < next) ||
        p.getName == LogBaseName
      if (stale)
        try fs.delete(p, false)
        catch { case _: java.io.IOException => () }
    }
  }

  private def refresh(): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf.value)
    if (fs.exists(p)) {
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
            .filterNot(f => new Path(f).getName.startsWith("_")
              || new Path(f).getName.startsWith("."))
            .sorted
        else Array(p.toString)
      var added = false
      files.foreach { f =>
        if (seen.add(f)) { known += f; added = true }
      }
      if (added) persistLog()
    }
  }

  override def initialOffset(): Offset = GeoJsonlOffset(0)

  override def latestOffset(): Offset = {
    refresh()
    GeoJsonlOffset(known.size)
  }

  override def deserializeOffset(json: String): Offset =
    GeoJsonlOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[GeoJsonlOffset].n,
      end.asInstanceOf[GeoJsonlOffset].n)
    require(e <= known.size,
      s"offset $e beyond the persisted file list (${known.size}) — " +
        "file-list log missing or truncated under " + checkpointLocation)
    known.slice(s, e)
      .map(f => GeoJsonlInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonlReaderFactory(fields, permissive, conf, filters)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[geojsonl] case class GeoJsonlOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}
