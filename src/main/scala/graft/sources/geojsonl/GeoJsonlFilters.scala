package graft.sources.geojsonl

import org.apache.spark.sql.sources._

/** Filter pushdown support for the geojsonl source.
  *
  * Only `geomType` predicates are accepted: the field is decoded from
  * the two-level `geometry.type` JSON path before any other work, so
  * evaluating the predicate in the reader lets a non-matching line
  * skip the expensive part of decoding — the per-entry properties map
  * and the nested coordinate arrays. Property filters stay residual
  * (the map-access pattern never reaches the source as a
  * `sources.Filter` anyway), and the accepted filters are evaluated
  * EXACTLY (same string comparison Spark would apply post-scan), so
  * they are reported as fully pushed rather than re-filtered.
  */
private[geojsonl] object GeoJsonlFilters {

  /** Can the reader evaluate this filter exactly? */
  def supported(f: Filter): Boolean = f match {
    case EqualTo("geomType", _: String) => true
    case In("geomType", vs) => vs.forall(v => v == null || v.isInstanceOf[String])
    case IsNotNull("geomType") => true
    case IsNull("geomType") => true
    case Or(l, r) => supported(l) && supported(r)
    case And(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  /** Kleene three-valued evaluation against the decoded geomType
    * (null when the feature has no geometry): TRUE / FALSE / null
    * (unknown), exactly the semantics Spark's own post-scan Filter
    * would apply — so `Not(EqualTo(...))` over a null geomType stays
    * unknown instead of flipping to true. The scan keeps a row iff
    * the conjunction is definitely TRUE.
    */
  private def eval(f: Filter, geomType: String): java.lang.Boolean = f match {
    case EqualTo("geomType", v: String) =>
      if (geomType == null) null else java.lang.Boolean.valueOf(geomType == v)
    case In("geomType", vs) =>
      if (geomType == null) null
      else if (vs.exists(v => v.isInstanceOf[String] && v == geomType)) true
      else if (vs.contains(null)) null
      else false
    case IsNotNull("geomType") => geomType != null
    case IsNull("geomType") => geomType == null
    case Or(l, r) => (eval(l, geomType), eval(r, geomType)) match {
      case (java.lang.Boolean.TRUE, _) | (_, java.lang.Boolean.TRUE) => true
      case (java.lang.Boolean.FALSE, java.lang.Boolean.FALSE) => false
      case _ => null
    }
    case And(l, r) => (eval(l, geomType), eval(r, geomType)) match {
      case (java.lang.Boolean.FALSE, _) | (_, java.lang.Boolean.FALSE) => false
      case (java.lang.Boolean.TRUE, java.lang.Boolean.TRUE) => true
      case _ => null
    }
    case Not(c) => eval(c, geomType) match {
      case null => null
      case b => java.lang.Boolean.valueOf(!b.booleanValue())
    }
    case other => throw new IllegalStateException(
      s"unpushable filter reached the geojsonl reader: $other")
  }

  def evalAll(fs: Array[Filter], geomType: String): Boolean =
    fs.forall(eval(_, geomType) == java.lang.Boolean.TRUE)
}
