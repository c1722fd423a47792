package graft.sources.geojsonl

import org.apache.spark.sql.sources._

/** Filter pushdown support for the geojsonl source.
  *
  * `geomType` predicates and range predicates over the virtual
  * per-feature bbox columns ([[GeoJsonlBbox.Cols]]) are accepted:
  * both are decodable before the expensive part of the decode (the
  * per-entry properties map and the nested coordinate object
  * structure), so a non-matching line skips that work, and the same
  * predicates drive FILE pruning against the `.bbox` sidecar
  * summaries. Property filters stay residual (the map-access pattern
  * never reaches the source as a `sources.Filter` anyway), and the
  * accepted filters are evaluated EXACTLY (same comparison Spark
  * would apply post-scan), so they are reported as fully pushed
  * rather than re-filtered.
  */
private[geojsonl] object GeoJsonlFilters {

  import GeoJsonlBbox.Cols

  private def numeric(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case _ => None
  }

  /** Can the reader evaluate this filter exactly? */
  def supported(f: Filter): Boolean = f match {
    case EqualTo("geomType", _: String) => true
    case In("geomType", vs) => vs.forall(v => v == null || v.isInstanceOf[String])
    case IsNotNull("geomType") => true
    case IsNull("geomType") => true
    case IsNotNull(c) if Cols(c) => true
    case IsNull(c) if Cols(c) => true
    case EqualTo(c, v) if Cols(c) => numeric(v).isDefined
    case GreaterThan(c, v) if Cols(c) => numeric(v).isDefined
    case GreaterThanOrEqual(c, v) if Cols(c) => numeric(v).isDefined
    case LessThan(c, v) if Cols(c) => numeric(v).isDefined
    case LessThanOrEqual(c, v) if Cols(c) => numeric(v).isDefined
    case Or(l, r) => supported(l) && supported(r)
    case And(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  /** Kleene three-valued evaluation against the decoded geomType and
    * per-feature bbox (both null when the feature has no geometry):
    * TRUE / FALSE / null (unknown), exactly the semantics Spark's own
    * post-scan Filter would apply — so `Not(EqualTo(...))` over a
    * null stays unknown instead of flipping to true. The scan keeps a
    * row iff the conjunction is definitely TRUE.
    */
  private def eval(f: Filter, geomType: String,
      bbox: String => java.lang.Double): java.lang.Boolean = f match {
    case EqualTo("geomType", v: String) =>
      if (geomType == null) null else java.lang.Boolean.valueOf(geomType == v)
    case In("geomType", vs) =>
      if (geomType == null) null
      else if (vs.exists(v => v.isInstanceOf[String] && v == geomType)) true
      else if (vs.contains(null)) null
      else false
    case IsNotNull("geomType") => geomType != null
    case IsNull("geomType") => geomType == null
    case IsNotNull(c) if Cols(c) => bbox(c) != null
    case IsNull(c) if Cols(c) => bbox(c) == null
    case EqualTo(c, v) if Cols(c) => cmp(bbox(c), v)(_ == _)
    case GreaterThan(c, v) if Cols(c) => cmp(bbox(c), v)(_ > _)
    case GreaterThanOrEqual(c, v) if Cols(c) => cmp(bbox(c), v)(_ >= _)
    case LessThan(c, v) if Cols(c) => cmp(bbox(c), v)(_ < _)
    case LessThanOrEqual(c, v) if Cols(c) => cmp(bbox(c), v)(_ <= _)
    case Or(l, r) =>
      (eval(l, geomType, bbox), eval(r, geomType, bbox)) match {
        case (java.lang.Boolean.TRUE, _) | (_, java.lang.Boolean.TRUE) => true
        case (java.lang.Boolean.FALSE, java.lang.Boolean.FALSE) => false
        case _ => null
      }
    case And(l, r) =>
      (eval(l, geomType, bbox), eval(r, geomType, bbox)) match {
        case (java.lang.Boolean.FALSE, _) | (_, java.lang.Boolean.FALSE) =>
          false
        case (java.lang.Boolean.TRUE, java.lang.Boolean.TRUE) => true
        case _ => null
      }
    case Not(c) => eval(c, geomType, bbox) match {
      case null => null
      case b => java.lang.Boolean.valueOf(!b.booleanValue())
    }
    case other => throw new IllegalStateException(
      s"unpushable filter reached the geojsonl reader: $other")
  }

  private def cmp(a: java.lang.Double, v: Any)(
      op: (Double, Double) => Boolean): java.lang.Boolean =
    if (a == null) null
    else numeric(v) match {
      case Some(x) => java.lang.Boolean.valueOf(op(a.doubleValue(), x))
      case None => null
    }

  /** Does any filter reference a bbox column (so the reader must
    * compute the per-feature bbox before filtering)?
    */
  def needsBbox(f: Filter): Boolean = f match {
    case Or(l, r) => needsBbox(l) || needsBbox(r)
    case And(l, r) => needsBbox(l) || needsBbox(r)
    case Not(c) => needsBbox(c)
    case other => other.references.exists(Cols)
  }

  def evalAll(fs: Array[Filter], geomType: String,
      bbox: String => java.lang.Double): Boolean =
    fs.forall(eval(_, geomType, bbox) == java.lang.Boolean.TRUE)
}
