package graft.sources.geojsonl

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources._

/** Per-file bbox/geometry summary for scan-time FILE pruning — the
  * geojsonl analogue of a parquet footer's column statistics.
  *
  * The write path tracks, per shard: feature count, features with
  * geometry, the coordinate bbox, and the set of geometry types, and
  * commits them as a hidden `.<shard>.bbox` sidecar next to the data
  * file (hidden names are invisible to the readers and the streaming
  * tailer). `planInputPartitions` reads the sidecars and skips a file
  * when the pushed filters cannot match ANY row it could contain —
  * at 100 TB a bbox-restricted scan prunes files, not rows. A missing
  * sidecar (external producer, pre-sidecar data) simply reads
  * unpruned; pruning is a pure optimization, row-level evaluation
  * stays exact either way.
  */
private[geojsonl] case class FileSummary(
    n: Long, nGeom: Long,
    minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
    types: Set[String])

private[geojsonl] object GeoJsonlBbox {

  /** The virtual per-feature bbox columns (metadata columns on the
    * table): feature-level min/max lon/lat, null for features without
    * geometry.
    */
  val W = "bbox_w"
  val S = "bbox_s"
  val E = "bbox_e"
  val N = "bbox_n"
  val Cols: Set[String] = Set(W, S, E, N)

  def sidecarPath(data: Path): Path =
    new Path(data.getParent, s".${data.getName}.bbox")

  def write(fs: FileSystem, data: Path, s: FileSummary): Unit = {
    val m = new ObjectMapper
    val node = m.createObjectNode()
    node.put("n", s.n)
    node.put("nGeom", s.nGeom)
    if (s.nGeom > 0) {
      node.put("minLon", s.minLon)
      node.put("minLat", s.minLat)
      node.put("maxLon", s.maxLon)
      node.put("maxLat", s.maxLat)
    }
    val t = node.putArray("types")
    s.types.toSeq.sorted.foreach(t.add)
    val out = fs.create(sidecarPath(data), true)
    try out.write(m.writeValueAsBytes(node))
    finally out.close()
  }

  def read(fs: FileSystem, data: Path): Option[FileSummary] = {
    val p = sidecarPath(data)
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val node = try new ObjectMapper().readTree(in) finally in.close()
        val types = {
          val it = node.path("types").elements()
          val b = Set.newBuilder[String]
          while (it.hasNext) b += it.next().asText()
          b.result()
        }
        Some(FileSummary(node.path("n").asLong(),
          node.path("nGeom").asLong(),
          node.path("minLon").asDouble(), node.path("minLat").asDouble(),
          node.path("maxLon").asDouble(), node.path("maxLat").asDouble(),
          types))
      }
    } catch {
      // unreadable/corrupt sidecar → no pruning, never a failed scan
      case _: java.io.IOException => None
      case _: com.fasterxml.jackson.core.JacksonException => None
    }
  }

  /** Conservative satisfiability: can `f` be TRUE for at least one row
    * of a file with this summary? A per-feature bbox ordinate always
    * lies inside the file-level interval, so interval reasoning is
    * sound; anything not understood answers true (no pruning).
    */
  def mayMatch(f: Filter, s: FileSummary): Boolean = {
    def interval(col: String): Option[(Double, Double)] = col match {
      case W | E => Some((s.minLon, s.maxLon))
      case S | N => Some((s.minLat, s.maxLat))
      case _ => None
    }
    def num(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case f2: Float => Some(f2.toDouble)
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case _ => None
    }
    f match {
      case EqualTo("geomType", v: String) => s.types.contains(v)
      case In("geomType", vs) =>
        vs.exists(v => v.isInstanceOf[String] && s.types.contains(
          v.asInstanceOf[String]))
      case IsNotNull("geomType") => s.nGeom > 0
      case IsNull("geomType") => s.n > s.nGeom
      case IsNotNull(c) if Cols(c) => s.nGeom > 0
      case IsNull(c) if Cols(c) => s.n > s.nGeom
      case EqualTo(c, v) if Cols(c) =>
        (interval(c), num(v)) match {
          case (Some((lo, hi)), Some(x)) => s.nGeom > 0 && lo <= x && x <= hi
          case _ => true
        }
      case GreaterThan(c, v) if Cols(c) =>
        (interval(c), num(v)) match {
          case (Some((_, hi)), Some(x)) => s.nGeom > 0 && hi > x
          case _ => true
        }
      case GreaterThanOrEqual(c, v) if Cols(c) =>
        (interval(c), num(v)) match {
          case (Some((_, hi)), Some(x)) => s.nGeom > 0 && hi >= x
          case _ => true
        }
      case LessThan(c, v) if Cols(c) =>
        (interval(c), num(v)) match {
          case (Some((lo, _)), Some(x)) => s.nGeom > 0 && lo < x
          case _ => true
        }
      case LessThanOrEqual(c, v) if Cols(c) =>
        (interval(c), num(v)) match {
          case (Some((lo, _)), Some(x)) => s.nGeom > 0 && lo <= x
          case _ => true
        }
      case And(l, r) => mayMatch(l, s) && mayMatch(r, s)
      case Or(l, r) => mayMatch(l, s) || mayMatch(r, s)
      case _ => true // Not(...) and anything else: no pruning
    }
  }

  /** A file survives when every pushed filter (conjunction) may match. */
  def mayMatchAll(fs: Array[Filter], s: FileSummary): Boolean =
    fs.forall(mayMatch(_, s))
}
