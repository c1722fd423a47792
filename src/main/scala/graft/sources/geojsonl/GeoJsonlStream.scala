package graft.sources.geojsonl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Micro-batch streaming over a growing directory of GeoJSONL shards —
  * `spark.readStream.format("geojsonl").load(dir)` tails the directory
  * the way the batch sink (or any external producer) appends to it.
  *
  * Offsets are positions in the stream's append-ordered file list:
  * each `latestOffset` lists the directory and appends files not seen
  * before (sorted listing for a deterministic order within one batch),
  * and batch (start, end) reads exactly `known[start, end)`. The
  * model assumes an append-only directory — the same contract as
  * Spark's own file stream source. On restart the list rebuilds from
  * a fresh sorted listing, so offsets stay monotone as long as files
  * are only ever added.
  */
private[geojsonl] class GeoJsonlMicroBatchStream(path: String,
    fields: Array[String], permissive: Boolean) extends MicroBatchStream {

  private val known = scala.collection.mutable.ArrayBuffer[String]()
  private val seen = scala.collection.mutable.HashSet[String]()

  private def refresh(): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) {
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile).map(_.getPath.toString)
            .filterNot(f => new Path(f).getName.startsWith("_")
              || new Path(f).getName.startsWith("."))
            .sorted
        else Array(p.toString)
      files.foreach { f =>
        if (seen.add(f)) known += f
      }
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
    // a restart can ask for a range beyond what this instance has
    // listed yet — refresh before slicing
    if (e > known.size) refresh()
    known.slice(s, e)
      .map(f => GeoJsonlInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonlReaderFactory(fields, permissive)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[geojsonl] case class GeoJsonlOffset(n: Int) extends Offset {
  override def json(): String = n.toString
}
