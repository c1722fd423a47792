package graft.sources.geojsonl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DoubleType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** DSv2 write path for the geojsonl format: each task renders its
  * rows (canonical full form: properties / geomType / parts) back to
  * GeoJSON Feature lines and writes one shard file — the exact
  * inverse of [[GeoJsonlPartitionReader]], so read(write(df)) is the
  * identity (pinned by spec). JSON rendering goes through Jackson
  * (proper escaping), not string concat.
  *
  * Commit protocol (crash-safe in both modes):
  *  - tasks write to HIDDEN temp names
  *    (`.part-<id>-<uuid>.jsonl.<jobId>.tmp` — invisible to the
  *    reader, which skips dot-files), and task commit renames to the
  *    visible name; a task killed without abort() leaves only an
  *    invisible temp file;
  *  - job commit deletes stray temp files OF THIS JOB ONLY (the job
  *    UUID is baked into the temp suffix, so two jobs writing the
  *    same directory concurrently cannot delete each other's
  *    in-flight temps), and — for `mode("overwrite")` — deletes the
  *    files that pre-existed the job ONLY NOW, so the previous data
  *    survives any failed write;
  *  - job abort deletes committed-task files and this job's temp
  *    files, leaving the directory as it was.
  * All filesystem access goes through the session's Hadoop conf
  * (serialized to executors), so `spark.hadoop.*` settings apply.
  */
private[geojsonl] class GeoJsonlWriteBuilder(path: String,
    schema: StructType, conf: SerializableConfiguration)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GeoJsonlBatchWrite(
      path, schema, doTruncate, conf)
  }
}

private[geojsonl] class GeoJsonlBatchWrite(path: String,
    schema: StructType, truncate: Boolean, conf: SerializableConfiguration)
    extends BatchWrite {
  require(schema.fieldNames.toSeq == Seq("properties", "geomType", "parts"),
    s"geojsonl write expects (properties, geomType, parts), got " +
      schema.fieldNames.mkString(", "))

  private val dir = new Path(path)
  private val jobId = java.util.UUID.randomUUID.toString
  // visible files present before the job — deleted only at successful
  // commit when overwriting
  private var preExisting: Array[Path] = Array.empty

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    preExisting =
      if (truncate) fs.listStatus(dir).filter(_.isFile).map(_.getPath)
        .filterNot(p => p.getName.startsWith(".")
          || p.getName.startsWith("_"))
      else Array.empty
    new GeoJsonlWriterFactory(path, jobId, conf)
  }

  private def cleanTemps(): Unit = {
    val fs = dir.getFileSystem(conf.value)
    fs.listStatus(dir).filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.startsWith(".")
        && p.getName.endsWith(s".$jobId.tmp"))
      .foreach(fs.delete(_, false))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = dir.getFileSystem(conf.value)
    preExisting.foreach { p =>
      fs.delete(p, false)
      // a stale sidecar describing a deleted file would mis-prune
      // future scans
      fs.delete(GeoJsonlBbox.sidecarPath(p), false)
    }
    cleanTemps()
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = dir.getFileSystem(conf.value)
    messages.collect { case GeoJsonlCommit(f) =>
      fs.delete(new Path(f), false)
      fs.delete(GeoJsonlBbox.sidecarPath(new Path(f)), false)
    }
    cleanTemps()
  }
}

private[geojsonl] class GeoJsonlWriterFactory(path: String, jobId: String,
    conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GeoJsonlDataWriter(path, partitionId, jobId, conf)
}

private[geojsonl] case class GeoJsonlCommit(file: String)
    extends WriterCommitMessage

private[geojsonl] class GeoJsonlDataWriter(dir: String, partitionId: Int,
    jobId: String, conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {
  private val mapper = new ObjectMapper
  private val finalName =
    f"part-$partitionId%05d-${java.util.UUID.randomUUID}.jsonl"
  private val tmpFile = new Path(dir, s".$finalName.$jobId.tmp")
  private val fs = tmpFile.getFileSystem(conf.value)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmpFile, true),
      java.nio.charset.StandardCharsets.UTF_8))

  // running file summary for the `.bbox` sidecar (posNode sees every
  // rendered position, so the bbox needs no second pass)
  private var nRows = 0L
  private var nGeom = 0L
  private var minLon = Double.MaxValue
  private var minLat = Double.MaxValue
  private var maxLon = Double.MinValue
  private var maxLat = Double.MinValue
  private val geomTypes = scala.collection.mutable.Set[String]()

  override def write(row: InternalRow): Unit = {
    val feature = mapper.createObjectNode()
    feature.put("type", "Feature")
    if (row.isNullAt(0)) feature.putNull("properties")
    else feature.set("properties", propsNode(row.getMap(0)))
    nRows += 1
    if (row.isNullAt(1) || row.isNullAt(2)) feature.putNull("geometry")
    else {
      val geomType = row.getUTF8String(1).toString
      nGeom += 1
      geomTypes += geomType
      val g = feature.putObject("geometry")
      g.put("type", geomType)
      g.set("coordinates", coordsNode(geomType, row.getArray(2)))
    }
    out.write(mapper.writeValueAsString(feature))
    out.write("\n")
  }

  private def propsNode(m: MapData): ObjectNode = {
    val node = mapper.createObjectNode()
    val keys = m.keyArray()
    val values = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      val k = keys.getUTF8String(i).toString
      if (values.isNullAt(i)) node.putNull(k)
      else node.put(k, values.getUTF8String(i).toString)
      i += 1
    }
    node
  }

  // inverse nesting of GeoJsonlPartitionReader.parts
  private def coordsNode(geomType: String, parts: ArrayData) = {
    def part(i: Int): ArrayData = parts.getArray(i)
    geomType match {
      case "Point" => posNode(part(0).getArray(0).getArray(0))
      case "LineString" => ringNode(part(0).getArray(0))
      case "Polygon" => ringsNode(part(0))
      case "MultiPoint" =>
        fill(parts.numElements())(i =>
          posNode(part(i).getArray(0).getArray(0)))
      case "MultiLineString" =>
        fill(parts.numElements())(i => ringNode(part(i).getArray(0)))
      case "MultiPolygon" =>
        fill(parts.numElements())(i => ringsNode(part(i)))
      case other => throw new IllegalArgumentException(
        s"unsupported geometry type $other")
    }
  }

  private def fill(n: Int)(f: Int => com.fasterxml.jackson.databind.JsonNode)
      : ArrayNode = {
    val a = mapper.createArrayNode()
    (0 until n).foreach(i => a.add(f(i)))
    a
  }
  private def posNode(p: ArrayData): ArrayNode = {
    if (p.numElements() >= 2) {
      val lon = p.get(0, DoubleType).asInstanceOf[Double]
      val lat = p.get(1, DoubleType).asInstanceOf[Double]
      if (lon < minLon) minLon = lon
      if (lon > maxLon) maxLon = lon
      if (lat < minLat) minLat = lat
      if (lat > maxLat) maxLat = lat
    }
    fill(p.numElements())(i =>
      mapper.getNodeFactory.numberNode(p.get(i, DoubleType)
        .asInstanceOf[Double]))
  }
  private def ringNode(r: ArrayData): ArrayNode =
    fill(r.numElements())(i => posNode(r.getArray(i)))
  private def ringsNode(rs: ArrayData): ArrayNode =
    fill(rs.numElements())(i => ringNode(rs.getArray(i)))

  override def commit(): WriterCommitMessage = {
    out.close()
    val dest = new Path(dir, finalName)
    if (!fs.rename(tmpFile, dest))
      throw new java.io.IOException(s"rename $tmpFile -> $dest failed")
    // sidecar AFTER the data rename: a crash in between leaves a data
    // file without summary (reads unpruned), never a summary without
    // data
    GeoJsonlBbox.write(fs, dest,
      FileSummary(nRows, nGeom, minLon, minLat, maxLon, maxLat,
        geomTypes.toSet))
    GeoJsonlCommit(dest.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tmpFile, false)
  }

  override def close(): Unit = ()
}
