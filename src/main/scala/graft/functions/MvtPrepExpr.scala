package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-tile geometry preparation for the in-engine MVT path — the
  * deterministic analog of tippecanoe's per-zoom geometry handling
  * (`/root/reference/src/transforms/TilesGenerator.ts:15-97`:
  * `--simplify-only-low-zooms` plus clipping to the buffered tile
  * square, `-B 0` for ski areas, `-B 10` for spots, default 5 for
  * lifts/runs):
  *
  *  1. simplification (optional, low zooms): Douglas-Peucker over the
  *     quantized integer points with the perpendicular-to-line metric,
  *     endpoints anchored, integer-exact squared comparisons
  *     (`cross² > tol²·len2`), first-index tie-break. A polygon ring
  *     whose DP survivor set is under 3 vertices degenerates to its
  *     bbox placeholder square (min 1 px wide) — the deterministic
  *     stand-in for tippecanoe's tiny-polygon square.
  *  2. clipping to `[-B, 4096+B]²`: points are filtered; lines are
  *     Liang-Barsky-clipped per segment and contiguous survivors merge
  *     into parts (contiguity = exit t = 1 and next entry t = 0, i.e.
  *     the shared original vertex survived unclipped); rings are
  *     Sutherland-Hodgman-clipped against the four half-planes in
  *     fixed order (x≥-B, x≤4096+B, y≥-B, y≤4096+B), carried in
  *     doubles, rounded at the end, consecutive duplicates and the
  *     closing duplicate removed, dropped when fewer than 3 vertices
  *     survive.
  *
  * Every arithmetic step is mirrored operation-for-operation in the
  * DuckDB oracle CTEs (MvtTiles), so results are hash-exact across
  * engines: integer math for DP, IEEE doubles with identical formula
  * order for clip intersections, `floor(v + 0.5)` rounding.
  *
  * Output: the feature's surviving parts in this tile as
  * `array<array<struct<px,py>>>` — empty means the feature dropped
  * out of this tile entirely. Runs once per post-cap feature-tile row
  * with a static-kernel codegen passthrough, so it stays inside
  * whole-stage codegen.
  */
case class MvtPrepExpr(gtype: Expression, pts: Expression,
    simplify: Expression, buffer: Expression, tol: Long)
    extends QuaternaryExpression {

  override def first: Expression = gtype
  override def second: Expression = pts
  override def third: Expression = simplify
  override def fourth: Expression = buffer
  override def nullable: Boolean = true
  override def dataType: DataType = MvtPrepKernel.outType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (gtype.dataType, pts.dataType, simplify.dataType, buffer.dataType) match {
      case (IntegerType, ArrayType(_: StructType, _), BooleanType,
          IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_mvt_prep expects (int, array<struct>, boolean, int)," +
            s" got $other")
    }

  override protected def nullSafeEval(g: Any, p: Any, s: Any,
      b: Any): Any =
    MvtPrepKernel.prepArray(g.asInstanceOf[Int],
      p.asInstanceOf[ArrayData], s.asInstanceOf[Boolean], tol,
      b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, p, s, b) =>
      s"${ev.value} = graft.functions.MvtPrepKernel.prepArray(" +
        s"$g, $p, $s, ${tol}L, $b);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): MvtPrepExpr =
    copy(gtype = newFirst, pts = newSecond, simplify = newThird,
      buffer = newFourth)
}

object MvtPrepExpr {
  def mvtPrep(gtype: Column, pts: Column, simplify: Column,
      buffer: Column, tol: Long): Column =
    GraftExpressionBridge.column(MvtPrepExpr(
      GraftExpressionBridge.expression(gtype),
      GraftExpressionBridge.expression(pts),
      GraftExpressionBridge.expression(simplify),
      GraftExpressionBridge.expression(buffer), tol))
}

object MvtPrepKernel {

  val Extent = 4096L

  val outType: DataType = ArrayType(ArrayType(StructType(Seq(
    StructField("px", LongType, nullable = false),
    StructField("py", LongType, nullable = false)))))

  /** Douglas-Peucker keep flags: endpoints anchored, perpendicular-to-
    * line metric, integer-exact (`cross² > tol²·len2`; point distance
    * when the bracket anchors coincide), argmax split with smallest-
    * index tie-break. Equals the monotone closure the oracle unrolls.
    */
  def dpKeep(xs: Array[Long], ys: Array[Long], tol: Long): Array[Boolean] = {
    val n = xs.length
    val keep = new Array[Boolean](n)
    keep(0) = true
    keep(n - 1) = true
    def recurse(a: Int, b: Int): Unit = {
      if (b - a < 2) return
      val dx = xs(b) - xs(a)
      val dy = ys(b) - ys(a)
      val len2 = dx * dx + dy * dy
      var best = -1
      var bestM = -1L
      var k = a + 1
      while (k < b) {
        val m =
          if (len2 == 0L) {
            val ex = xs(k) - xs(a); val ey = ys(k) - ys(a)
            ex * ex + ey * ey
          } else {
            val cross = dx * (ys(k) - ys(a)) - dy * (xs(k) - xs(a))
            cross * cross
          }
        if (m > bestM) { bestM = m; best = k }
        k += 1
      }
      val over =
        if (len2 == 0L) bestM > tol * tol
        else bestM > tol * tol * len2
      if (over) { keep(best) = true; recurse(a, best); recurse(best, b) }
    }
    recurse(0, n - 1)
    keep
  }

  private def round(v: Double): Long = math.floor(v + 0.5).toLong

  /** Liang-Barsky clip of one segment to [lo,hi]² → (t0, t1) or None.
    * Formula order matches the oracle SQL exactly (greatest/least over
    * per-axis entry/exit parameters, degenerate axes reject when the
    * fixed coordinate lies outside).
    */
  private def clipSeg(x1: Long, y1: Long, x2: Long, y2: Long,
      lo: Double, hi: Double): Option[(Double, Double)] = {
    val dx = (x2 - x1).toDouble
    val dy = (y2 - y1).toDouble
    if (dx == 0.0 && (x1 < lo || x1 > hi)) return None
    if (dy == 0.0 && (y1 < lo || y1 > hi)) return None
    val txE = if (dx > 0) (lo - x1) / dx else if (dx < 0) (hi - x1) / dx
      else 0.0
    val txX = if (dx > 0) (hi - x1) / dx else if (dx < 0) (lo - x1) / dx
      else 1.0
    val tyE = if (dy > 0) (lo - y1) / dy else if (dy < 0) (hi - y1) / dy
      else 0.0
    val tyX = if (dy > 0) (hi - y1) / dy else if (dy < 0) (lo - y1) / dy
      else 1.0
    val t0 = math.max(0.0, math.max(txE, tyE))
    val t1 = math.min(1.0, math.min(txX, tyX))
    if (t0 <= t1) Some((t0, t1)) else None
  }

  /** Sutherland-Hodgman pass against one half-plane. `axisX` selects
    * the coordinate; keep side is `>= bound` when `keepGe` else
    * `<= bound`. Intersections stay doubles.
    */
  private def shPass(ring: Array[(Double, Double)], axisX: Boolean,
      keepGe: Boolean, bound: Double): Array[(Double, Double)] = {
    if (ring.isEmpty) return ring
    val out = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    val n = ring.length
    def coord(p: (Double, Double)): Double = if (axisX) p._1 else p._2
    def inside(p: (Double, Double)): Boolean =
      if (keepGe) coord(p) >= bound else coord(p) <= bound
    def inter(p: (Double, Double), c: (Double, Double)): (Double, Double) = {
      val t = (bound - coord(p)) / (coord(c) - coord(p))
      if (axisX) (bound, p._2 + t * (c._2 - p._2))
      else (p._1 + t * (c._1 - p._1), bound)
    }
    var i = 0
    while (i < n) {
      val prev = ring(if (i == 0) n - 1 else i - 1)
      val cur = ring(i)
      (inside(prev), inside(cur)) match {
        case (true, true) => out += cur
        case (true, false) => out += inter(prev, cur)
        case (false, true) => out += inter(prev, cur); out += cur
        case (false, false) =>
      }
      i += 1
    }
    out.toArray
  }

  /** Full prep: optional DP simplify (with polygon bbox-placeholder
    * fallback), then clip to [-buffer, 4096+buffer]². See class doc.
    */
  def prep(gtype: Int, xs0: Array[Long], ys0: Array[Long],
      simplify: Boolean, tol: Long, buffer: Int)
      : Array[Array[(Long, Long)]] = {
    val lo = -buffer.toDouble
    val hi = Extent.toDouble + buffer
    gtype match {
      case 1 =>
        val x = xs0(0); val y = ys0(0)
        if (x >= lo && x <= hi && y >= lo && y <= hi)
          Array(Array((x, y)))
        else Array.empty
      case 2 =>
        require(xs0.length >= 2, s"line needs >= 2 points")
        var xs = xs0; var ys = ys0
        if (simplify && xs.length > 2) {
          val keep = dpKeep(xs, ys, tol)
          val idx = keep.indices.filter(keep).toArray
          xs = idx.map(xs0); ys = idx.map(ys0)
        }
        // clip per segment; merge contiguous survivors into parts
        val parts = scala.collection.mutable.ArrayBuffer[Array[(Long, Long)]]()
        val cur = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        var prevUnclippedExit = false
        var i = 0
        while (i < xs.length - 1) {
          clipSeg(xs(i), ys(i), xs(i + 1), ys(i + 1), lo, hi) match {
            case Some((t0, t1)) =>
              val dx = (xs(i + 1) - xs(i)).toDouble
              val dy = (ys(i + 1) - ys(i)).toDouble
              val ax = round(xs(i) + t0 * dx); val ay = round(ys(i) + t0 * dy)
              val bx = round(xs(i) + t1 * dx); val by = round(ys(i) + t1 * dy)
              if (ax == bx && ay == by) {
                // degenerate after rounding: drop, break contiguity
                if (cur.nonEmpty) { parts += cur.toArray; cur.clear() }
                prevUnclippedExit = false
              } else {
                val contiguous = prevUnclippedExit && t0 == 0.0 &&
                  cur.nonEmpty
                if (!contiguous && cur.nonEmpty) {
                  parts += cur.toArray; cur.clear()
                }
                if (cur.isEmpty) cur += ((ax, ay))
                cur += ((bx, by))
                prevUnclippedExit = t1 == 1.0
              }
            case None =>
              if (cur.nonEmpty) { parts += cur.toArray; cur.clear() }
              prevUnclippedExit = false
          }
          i += 1
        }
        if (cur.nonEmpty) parts += cur.toArray
        parts.toArray
      case 3 =>
        require(xs0.length >= 3, s"ring needs >= 3 points")
        var xs = xs0; var ys = ys0
        if (simplify) {
          val keep = dpKeep(xs, ys, tol)
          val idx = keep.indices.filter(keep).toArray
          if (idx.length < 3) {
            // tiny-polygon placeholder: bbox square, min 1 px wide
            val xmin = xs0.min; val xmax = xs0.max
            val ymin = ys0.min; val ymax = ys0.max
            val x2 = math.max(xmax, xmin + 1)
            val y2 = math.max(ymax, ymin + 1)
            xs = Array(xmin, x2, x2, xmin)
            ys = Array(ymin, ymin, y2, y2)
          } else {
            xs = idx.map(xs0); ys = idx.map(ys0)
          }
        }
        var ring = xs.indices
          .map(i => (xs(i).toDouble, ys(i).toDouble)).toArray
        ring = shPass(ring, axisX = true, keepGe = true, lo)
        ring = shPass(ring, axisX = true, keepGe = false, hi)
        ring = shPass(ring, axisX = false, keepGe = true, lo)
        ring = shPass(ring, axisX = false, keepGe = false, hi)
        val rounded = ring.map(p => (round(p._1), round(p._2)))
        // consecutive-duplicate removal, then the closing duplicate
        val dedup = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        rounded.foreach { p =>
          if (dedup.isEmpty || dedup.last != p) dedup += p
        }
        if (dedup.length > 1 && dedup.head == dedup.last)
          dedup.remove(dedup.length - 1)
        if (dedup.length < 3) Array.empty
        else {
          // vector-tile-spec 2.1 §4.3.3.3: an exterior ring must have
          // POSITIVE surveyor's-formula area in tile (y-down) coords.
          // Synthesized features happen to arrive correctly wound; an
          // arbitrary input ring must be reversed, not emitted wrong.
          var out = dedup.toArray
          var area2 = 0L
          var i = 0
          while (i < out.length) {
            val (x1, y1) = out(i)
            val (x2, y2) = out(if (i + 1 == out.length) 0 else i + 1)
            area2 += x1 * y2 - x2 * y1
            i += 1
          }
          if (area2 < 0L) out = out.reverse
          Array(out)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown gtype $other")
    }
  }

  /** ArrayData adapter for the expression. */
  def prepArray(gtype: Int, pts: ArrayData, simplify: Boolean, tol: Long,
      buffer: Int): ArrayData = {
    val n = pts.numElements()
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val p = pts.getStruct(i, 2)
      xs(i) = p.getLong(0)
      ys(i) = p.getLong(1)
      i += 1
    }
    val parts = prep(gtype, xs, ys, simplify, tol, buffer)
    new GenericArrayData(parts.map { part =>
      new GenericArrayData(part.map { case (x, y) =>
        InternalRow(x, y): Any
      }): Any
    })
  }
}
