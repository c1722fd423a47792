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
  * the query's checkpoint location (`<checkpoint>/graft-file-list`):
  * each `latestOffset` lists the directory, appends files not seen
  * before (sorted listing for a deterministic order within one
  * batch), and atomically rewrites the log (temp + rename). Batch
  * (start, end) reads exactly `known[start, end)`. On restart the
  * list is rebuilt FROM THE LOG, so committed offsets keep meaning
  * the same files even when later-arriving files sort before earlier
  * ones — a plain re-listing would silently remap offsets. The
  * directory is assumed append-only, the same contract as Spark's
  * own file stream source.
  */
private[geojsonl] class GeoJsonlMicroBatchStream(path: String,
    fields: Array[String], permissive: Boolean, checkpointLocation: String,
    conf: SerializableConfiguration,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends MicroBatchStream {

  private val logPath = new Path(checkpointLocation, "graft-file-list")
  private val known = scala.collection.mutable.ArrayBuffer[String]()
  private val seen = scala.collection.mutable.HashSet[String]()

  // restart: rebuild the append-ordered list from the log
  locally {
    val fs = logPath.getFileSystem(conf.value)
    if (fs.exists(logPath)) {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(logPath), StandardCharsets.UTF_8))
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
    val fs = logPath.getFileSystem(conf.value)
    fs.mkdirs(logPath.getParent)
    val tmp = new Path(logPath.getParent,
      s".${logPath.getName}.tmp-${java.util.UUID.randomUUID}")
    val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(tmp, true), StandardCharsets.UTF_8))
    try known.foreach { f => out.write(f); out.write("\n") }
    finally out.close()
    if (fs.exists(logPath)) fs.delete(logPath, false)
    if (!fs.rename(tmp, logPath))
      throw new java.io.IOException(s"rename $tmp -> $logPath failed")
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
