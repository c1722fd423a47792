package graft

import graft.functions.{MvtKernel, MvtPrepKernel}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property tests for the MVT geometry kernels over the full input
  * space (the DuckDB oracle proves parity on the synthesized feature
  * shapes; these prove the kernel's own invariants on arbitrary
  * geometry):
  *
  *  - clip containment: every emitted coordinate lies in the buffered
  *    square (end-rounding cannot escape it);
  *  - part well-formedness: line parts have ≥2 points with no
  *    zero-length steps, ring parts ≥3 points with no consecutive
  *    duplicates (including around the implicit closure);
  *  - DP fixpoint: for each adjacent kept pair, every dropped interior
  *    vertex is within tolerance of the bracket chord — the exact
  *    closure property the oracle's unrolled steps compute;
  *  - wire round-trip: geometryCmds → command-stream walk returns the
  *    exact input points and part count for every geometry type.
  */
object MvtPrepProps extends Properties("MvtPrepKernel") {

  private val coord = Gen.chooseNum(-6000L, 10000L)
  private def ptsGen(min: Int, max: Int): Gen[List[(Long, Long)]] =
    for {
      n <- Gen.chooseNum(min, max)
      xs <- Gen.listOfN(n, coord)
      ys <- Gen.listOfN(n, coord)
    } yield xs.zip(ys)
  private val bufGen = Gen.oneOf(0, 80, 160)
  private val tolGen = Gen.chooseNum(0L, 8L)
  private val boolGen = Gen.oneOf(true, false)

  private def prep(g: Int, pts: List[(Long, Long)], simp: Boolean,
      tol: Long, buf: Int) =
    MvtPrepKernel.prep(g, pts.map(_._1).toArray, pts.map(_._2).toArray,
      simp, tol, buf)

  property("interior fast path equals the general clip path exactly") =
    // geometries wholly inside the buffered square (where the fast
    // path fires) must produce bit-identical parts with the fast path
    // disabled — the identity argument in the kernel comments, proved
    // on arbitrary inputs including duplicate-vertex degeneracies and
    // boundary-touching coordinates
    Prop.forAll(Gen.oneOf(2, 3), bufGen, tolGen, boolGen,
      Gen.chooseNum(3, 9)) { (g, buf, tol, simp, n) =>
      val inb = Gen.chooseNum(-buf.toLong, 4096L + buf)
      Prop.forAll(Gen.listOfN(n, inb), Gen.listOfN(n, inb),
        // sprinkle duplicates: degenerate segments are the one
        // non-identity corner the fast path must replicate
        Gen.listOfN(n, Gen.chooseNum(0, 3))) { (xs0, ys0, dup) =>
        val xs = xs0.zip(dup).map { case (x, d) => if (d == 0) xs0.head else x }
        val ys = ys0.zip(dup).map { case (y, d) => if (d == 0) ys0.head else y }
        val fast = MvtPrepKernel.prep(g, xs.toArray, ys.toArray,
          simp, tol, buf, allowFast = true)
        val slow = MvtPrepKernel.prep(g, xs.toArray, ys.toArray,
          simp, tol, buf, allowFast = false)
        (fast.length == slow.length) :| s"parts ${fast.length} vs ${slow.length}" &&
          fast.zip(slow).forall { case (a, b) => a.sameElements(b) }
      }
    }

  property("output stays inside the buffered square") =
    Prop.forAll(Gen.oneOf(2, 3), ptsGen(3, 9), bufGen, tolGen, boolGen) {
      (g, pts, buf, tol, simp) =>
        prep(g, pts, simp, tol, buf).flatten.forall { case (x, y) =>
          x >= -buf && x <= 4096L + buf && y >= -buf && y <= 4096L + buf
        }
    }

  property("line parts: >= 2 points, no zero-length segments") =
    Prop.forAll(ptsGen(2, 9), bufGen, tolGen, boolGen) {
      (pts, buf, tol, simp) =>
        prep(2, pts, simp, tol, buf).forall { part =>
          part.length >= 2 &&
            part.sliding(2).forall(w => w(0) != w(1))
        }
    }

  property("rings: >= 3 points, no consecutive duplicates incl. closure") =
    Prop.forAll(ptsGen(3, 9), bufGen, tolGen, boolGen) {
      (pts, buf, tol, simp) =>
        prep(3, pts, simp, tol, buf).forall { ring =>
          ring.length >= 3 &&
            (ring :+ ring.head).sliding(2).forall(w => w(0) != w(1))
        }
    }

  property("ring output always has non-negative surveyor area") =
    Prop.forAll(ptsGen(3, 9), bufGen, tolGen, boolGen) {
      (pts, buf, tol, simp) =>
        prep(3, pts, simp, tol, buf).forall { ring =>
          val area2 = ring.indices.map { i =>
            val (x1, y1) = ring(i)
            val (x2, y2) = ring((i + 1) % ring.length)
            x1 * y2 - x2 * y1
          }.sum
          area2 >= 0L // vector-tile-spec 2.1: exterior ring positive
        }
    }

  property("DP kept set is a closure fixpoint (dropped within tol)") =
    Prop.forAll(ptsGen(2, 12), tolGen) { (pts, tol) =>
      val xs = pts.map(_._1).toArray
      val ys = pts.map(_._2).toArray
      val keep = MvtPrepKernel.dpKeep(xs, ys, tol)
      val kept = keep.indices.filter(keep)
      keep.head && keep.last && kept.sliding(2).forall {
        case Seq(a, b) =>
          val dx = xs(b) - xs(a); val dy = ys(b) - ys(a)
          val len2 = dx * dx + dy * dy
          ((a + 1) until b).forall { k =>
            if (len2 == 0L) {
              val ex = xs(k) - xs(a); val ey = ys(k) - ys(a)
              ex * ex + ey * ey <= tol * tol
            } else {
              val cross = dx * (ys(k) - ys(a)) - dy * (xs(k) - xs(a))
              cross * cross <= tol * tol * len2
            }
          }
        case _ => true
      }
    }

  // local command-stream walker (mirrors the spec-side decoder)
  private def walk(cmds: Array[Long]): (Int, Seq[(Long, Long)]) = {
    var i = 0; var cx = 0L; var cy = 0L; var parts = 0
    val out = Seq.newBuilder[(Long, Long)]
    def unzig(v: Long): Long = (v >>> 1) ^ -(v & 1)
    while (i < cmds.length) {
      val id = (cmds(i) & 7).toInt
      val count = (cmds(i) >> 3).toInt
      i += 1
      if (id == 1 || id == 2) {
        if (id == 1) parts += count
        for (_ <- 0 until count) {
          cx += unzig(cmds(i)); cy += unzig(cmds(i + 1)); i += 2
          out += ((cx, cy))
        }
      }
    }
    (parts, out.result())
  }

  property("command stream round-trips arbitrary multi-part lines") = {
    val partsGen = for {
      np <- Gen.chooseNum(1, 4)
      parts <- Gen.listOfN(np, ptsGen(2, 6))
    } yield parts
    Prop.forAll(partsGen) { parts =>
      val cmds = MvtKernel.geometryCmds(2, parts.map(_.toArray).toArray)
      val (np, pts) = walk(cmds)
      np == parts.length && pts == parts.flatten
    }
  }

  property("command stream round-trips rings with ClosePath") =
    Prop.forAll(ptsGen(3, 8)) { ring =>
      val cmds = MvtKernel.geometryCmds(3, Array(ring.toArray))
      val (np, pts) = walk(cmds)
      np == 1 && pts == ring && (cmds.last & 7) == 7
    }
}
