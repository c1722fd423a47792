package graft

import graft.functions.MvtPrepKernel
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel tests for the MVT simplify+clip preparation: DP keep
  * sets, Liang-Barsky line parts, Sutherland-Hodgman ring clipping,
  * the tiny-polygon placeholder, and degenerate drops.
  */
class MvtPrepSpec extends AnyFunSuite {

  private def prep(g: Int, pts: Seq[(Long, Long)], simplify: Boolean,
      tol: Long = 1L, buffer: Int = 0) =
    MvtPrepKernel.prep(g, pts.map(_._1).toArray, pts.map(_._2).toArray,
      simplify, tol, buffer).map(_.toSeq).toSeq

  // ---- Douglas-Peucker ----------------------------------------------------

  test("DP keeps a far interior point and drops a near one") {
    // (0,0) (5,4) (10,0): dist of middle to chord = 4 > tol 1 → kept
    val keep = MvtPrepKernel.dpKeep(Array(0L, 5L, 10L),
      Array(0L, 4L, 0L), 1L)
    assert(keep.toSeq === Seq(true, true, true))
    // (0,0) (5,1) (10,0): dist 1 ≤ tol 1 → dropped
    val keep2 = MvtPrepKernel.dpKeep(Array(0L, 5L, 10L),
      Array(0L, 1L, 0L), 1L)
    assert(keep2.toSeq === Seq(true, false, true))
  }

  test("DP recursion splits and keeps sub-bracket maxima") {
    // zigzag: both humps exceed tol and are kept; the middle vertex is
    // exactly collinear with the (1,3) sub-bracket chord and drops
    val xs = Array(0L, 10L, 20L, 30L, 40L)
    val ys = Array(0L, 8L, 0L, -8L, 0L)
    val keep = MvtPrepKernel.dpKeep(xs, ys, 2L)
    assert(keep.toSeq === Seq(true, true, false, true, true))
    // breaking the collinearity keeps all five
    val keep2 = MvtPrepKernel.dpKeep(xs, Array(0L, 8L, 3L, -8L, 0L), 2L)
    assert(keep2.toSeq === Seq(true, true, true, true, true))
  }

  test("DP coincident anchors fall back to point distance") {
    val keep = MvtPrepKernel.dpKeep(Array(0L, 3L, 0L),
      Array(0L, 0L, 0L), 1L)
    assert(keep.toSeq === Seq(true, true, true)) // d=3 > tol
    val keep2 = MvtPrepKernel.dpKeep(Array(0L, 1L, 0L),
      Array(0L, 0L, 0L), 1L)
    assert(keep2.toSeq === Seq(true, false, true)) // d=1 ≤ tol
  }

  // ---- points -------------------------------------------------------------

  test("point kept inside buffered square, dropped outside") {
    assert(prep(1, Seq((0L, 0L)), simplify = false) ===
      Seq(Seq((0L, 0L))))
    assert(prep(1, Seq((-1L, 0L)), simplify = false) === Seq.empty)
    assert(prep(1, Seq((-80L, 4176L)), simplify = false, buffer = 80) ===
      Seq(Seq((-80L, 4176L))))
    assert(prep(1, Seq((-81L, 0L)), simplify = false, buffer = 80) ===
      Seq.empty)
  }

  // ---- lines --------------------------------------------------------------

  test("fully-inside line passes through as one part") {
    val line = Seq((10L, 10L), (100L, 50L), (200L, 10L))
    assert(prep(2, line, simplify = false) === Seq(line))
  }

  test("line crossing the square is clipped to the boundary") {
    // horizontal line y=100 from x=-100 to x=100: enters at x=0
    assert(prep(2, Seq((-100L, 100L), (100L, 100L)), simplify = false) ===
      Seq(Seq((0L, 100L), (100L, 100L))))
  }

  test("line leaving and re-entering splits into two parts") {
    // V-shape dipping below y=0 (buffer 0): two clipped parts
    val got = prep(2, Seq((0L, 100L), (200L, -300L), (400L, 100L)),
      simplify = false)
    assert(got.length === 2)
    assert(got(0).head === ((0L, 100L)))
    assert(got(0).last._2 === 0L) // exits through y=0
    assert(got(1).head._2 === 0L) // re-enters through y=0
    assert(got(1).last === ((400L, 100L)))
  }

  test("zero-length clipped segment drops and breaks contiguity") {
    // both points quantize to the same pixel → nothing survives
    assert(prep(2, Seq((5L, 5L), (5L, 5L)), simplify = false) === Seq.empty)
  }

  test("fully-outside line drops") {
    assert(prep(2, Seq((-500L, -500L), (-400L, -400L)),
      simplify = false) === Seq.empty)
  }

  test("simplified line drops its near-chord interior vertex") {
    val got = prep(2, Seq((0L, 0L), (100L, 1L), (200L, 0L)),
      simplify = true, tol = 2L)
    assert(got === Seq(Seq((0L, 0L), (200L, 0L))))
  }

  // ---- rings --------------------------------------------------------------

  test("fully-inside ring passes through unchanged") {
    val hex = Seq((100L, 100L), (200L, 100L), (250L, 186L), (200L, 272L),
      (100L, 272L), (50L, 186L))
    assert(prep(3, hex, simplify = false) === Seq(hex))
  }

  test("ring is Sutherland-Hodgman-clipped to the square") {
    // square straddling the left edge: clipped to x >= 0
    val sq = Seq((-50L, 10L), (50L, 10L), (50L, 110L), (-50L, 110L))
    assert(prep(3, sq, simplify = false) ===
      Seq(Seq((0L, 10L), (50L, 10L), (50L, 110L), (0L, 110L))))
  }

  test("ring fully outside the square drops") {
    val sq = Seq((-300L, 10L), (-200L, 10L), (-200L, 110L), (-300L, 110L))
    assert(prep(3, sq, simplify = false) === Seq.empty)
  }

  test("tiny ring under DP tolerance becomes the placeholder square") {
    // 1-px blob at (100,100): DP keeps < 3 → bbox square, min 1 px
    val blob = Seq((100L, 100L), (101L, 100L), (101L, 101L), (100L, 101L),
      (100L, 100L), (100L, 100L))
    val got = prep(3, blob, simplify = true, tol = 4L)
    assert(got === Seq(Seq((100L, 100L), (101L, 100L), (101L, 101L),
      (100L, 101L))))
    // degenerate bbox still yields a 1-px square
    val dot = Seq((7L, 9L), (7L, 9L), (7L, 9L))
    assert(prep(3, dot, simplify = true, tol = 4L) ===
      Seq(Seq((7L, 9L), (8L, 9L), (8L, 10L), (7L, 10L))))
  }

  test("large simplified ring keeps its far vertices") {
    val hex = Seq((0L, 0L), (100L, 0L), (150L, 86L), (100L, 172L),
      (0L, 172L), (-50L, 86L))
    val got = prep(3, hex, simplify = true, tol = 2L, buffer = 80)
    assert(got.length === 1)
    assert(got(0).length >= 4) // interior vertices survive tol 2
  }

  test("a wrong-wound ring is reversed to positive surveyor area") {
    // square given counter-clockwise in screen (y-down) coords →
    // negative area → must come out reversed, same vertex set
    val ccw = Seq((10L, 10L), (10L, 110L), (110L, 110L), (110L, 10L))
    val got = prep(3, ccw, simplify = false)
    assert(got === Seq(Seq((110L, 10L), (110L, 110L), (10L, 110L),
      (10L, 10L))))
  }

  test("clip intersection rounding stays within the buffered square") {
    // steep segment crossing the corner region
    val got = prep(2, Seq((-37L, 13L), (91L, -22L)), simplify = false)
    got.flatten.foreach { case (x, y) =>
      assert(x >= 0L && x <= 4096L && y >= 0L && y <= 4096L)
    }
  }

  test("a feature beyond the DP exactness bound falls back, not fails") {
    // a line spanning >4 tiles at its zoom: |x| exceeds 2^14, where
    // the squared DP cross product would overflow Long. The feature
    // must ship UNSIMPLIFIED (identical to the simplify=false path,
    // mirrored by the oracle dp0 gate) instead of aborting the job.
    val wide = Seq((0L, 0L), (900L, 7L), (20000L, 0L))
    assert(!MvtPrepKernel.dpInBounds(
      wide.map(_._1).toArray, wide.map(_._2).toArray))
    val sim = prep(2, wide, simplify = true, tol = 64L, buffer = 80)
    val raw = prep(2, wide, simplify = false, tol = 64L, buffer = 80)
    assert(sim === raw)
    // in-bounds features still simplify (the gate is per-feature)
    val near = Seq((0L, 0L), (900L, 7L), (4000L, 0L))
    assert(prep(2, near, simplify = true, tol = 64L) !==
      prep(2, near, simplify = false, tol = 64L))
  }
}
