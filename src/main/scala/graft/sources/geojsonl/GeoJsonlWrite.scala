package graft.sources.geojsonl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DoubleType, StringType, StructType}

/** DSv2 write path for the geojsonl format: each task renders its
  * rows (canonical full form: properties / geomType / parts) back to
  * GeoJSON Feature lines and writes one shard file — the exact
  * inverse of [[GeoJsonlPartitionReader]], so read(write(df)) is the
  * identity (pinned by spec). JSON rendering goes through Jackson
  * (proper escaping), not string concat.
  *
  * Commit protocol: tasks write `part-<partition>-<uuid>.jsonl`
  * directly (names are collision-free, so no temp/rename dance is
  * needed for correctness); job commit drops a `_SUCCESS` marker,
  * task abort deletes the file. `mode("overwrite")` truncates the
  * target directory via [[SupportsTruncate]].
  */
private[geojsonl] class GeoJsonlWriteBuilder(path: String,
    schema: StructType) extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GeoJsonlBatchWrite(
      path, schema, doTruncate)
  }
}

private[geojsonl] class GeoJsonlBatchWrite(path: String,
    schema: StructType, truncate: Boolean) extends BatchWrite {
  require(schema.fieldNames.toSeq == Seq("properties", "geomType", "parts"),
    s"geojsonl write expects (properties, geomType, parts), got " +
      schema.fieldNames.mkString(", "))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    if (truncate && fs.exists(p)) fs.listStatus(p)
      .foreach(st => fs.delete(st.getPath, true))
    fs.mkdirs(p)
    new GeoJsonlWriterFactory(path)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(path, "_SUCCESS")
    val fs = p.getFileSystem(new Configuration())
    fs.create(p, true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[geojsonl] class GeoJsonlWriterFactory(path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GeoJsonlDataWriter(path, partitionId)
}

private[geojsonl] case class GeoJsonlCommit(file: String)
    extends WriterCommitMessage

private[geojsonl] class GeoJsonlDataWriter(dir: String, partitionId: Int)
    extends DataWriter[InternalRow] {
  private val mapper = new ObjectMapper
  private val file = new Path(dir,
    f"part-$partitionId%05d-${java.util.UUID.randomUUID}.jsonl")
  private val fs = file.getFileSystem(new Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(file, true),
      java.nio.charset.StandardCharsets.UTF_8))

  override def write(row: InternalRow): Unit = {
    val feature = mapper.createObjectNode()
    feature.put("type", "Feature")
    if (row.isNullAt(0)) feature.putNull("properties")
    else feature.set("properties", propsNode(row.getMap(0)))
    if (row.isNullAt(1) || row.isNullAt(2)) feature.putNull("geometry")
    else {
      val geomType = row.getUTF8String(1).toString
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
  private def posNode(p: ArrayData): ArrayNode =
    fill(p.numElements())(i =>
      mapper.getNodeFactory.numberNode(p.get(i, DoubleType)
        .asInstanceOf[Double]))
  private def ringNode(r: ArrayData): ArrayNode =
    fill(r.numElements())(i => posNode(r.getArray(i)))
  private def ringsNode(rs: ArrayData): ArrayNode =
    fill(rs.numElements())(i => ringNode(rs.getArray(i)))

  override def commit(): WriterCommitMessage = {
    out.close()
    GeoJsonlCommit(file.toString)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(file, false)
  }

  override def close(): Unit = ()
}
