package graft

import graft.operators.Normalization
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property tests for the N3 chain stitcher: any fragmentation of a
  * path must re-linearize (direction-free), oneway chains must refuse
  * reversals, and cycles must close. Pure JVM — points are Longs, only
  * endpoint equality matters to the walk.
  */
object StitchProps extends Properties("Normalization.stitch") {

  /** A path 0..n-1 (distinct points), its cut points, and a shuffle. */
  private val pathGen: Gen[(Seq[Long], Seq[Seq[Long]])] = for {
    n <- Gen.choose(2, 30)
    path = (0L until n.toLong)
    nCuts <- Gen.choose(0, math.max(0, n - 2))
    cuts <- Gen.pick(nCuts, 1 until n - 1)
  } yield {
    val bounds = (0 +: cuts.sorted.toSeq :+ (n - 1)).distinct
    val frags = bounds.sliding(2).map(w =>
      path.slice(w(0), w(1) + 1)).toSeq
    (path, frags)
  }

  property("shuffled+reversed fragments re-linearize to the path") =
    Prop.forAll(pathGen, Gen.long) { case ((path, frags), seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(frags)
        .map(f => if (rnd.nextBoolean()) f.reverse else f)
      val got = Normalization.stitch(shuffled)
      got.contains(path) || got.contains(path.reverse)
    }

  property("oneway: shuffled original-orientation fragments keep direction") =
    Prop.forAll(pathGen, Gen.long) { case ((path, frags), seed) =>
      val rnd = new scala.util.Random(seed)
      val got = Normalization.stitch(rnd.shuffle(frags), oneway = true)
      got.contains(path) // exactly forward — never the reverse
    }

  property("oneway: any single reversed fragment refuses to merge") =
    Prop.forAll(pathGen, Gen.long) { case ((path, frags), seed) =>
      (frags.size >= 2) ==> {
        val rnd = new scala.util.Random(seed)
        val i = rnd.nextInt(frags.size)
        val broken = rnd.shuffle(
          frags.updated(i, frags(i).reverse))
        Normalization.stitch(broken, oneway = true).isEmpty
      }
    }

  property("cycles close into one loop") =
    Prop.forAll(Gen.choose(3, 20)) { n =>
      val frags = (0 until n).map(i =>
        Seq(i.toLong, ((i + 1) % n).toLong))
      val got = Normalization.stitch(frags)
      got.exists(p => p.length == n + 1 && p.head == p.last &&
        p.toSet.size == n)
    }

  property("segId packing is injective over (run, no)") =
    // same arithmetic as Normalization.segId's column expression
    // (run << 20 | no, no < 2^20 guarded there)
    Prop.forAll(Gen.choose(0L, 1L << 40), Gen.choose(0L, (1L << 20) - 1),
      Gen.choose(0L, 1L << 40), Gen.choose(0L, (1L << 20) - 1)) {
      (r1, n1, r2, n2) =>
        val id1 = (r1 << 20) | n1
        val id2 = (r2 << 20) | n2
        (id1 == id2) == (r1 == r2 && n1 == n2)
    }
}
