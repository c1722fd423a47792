package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's mid-run contamination guard, replayed against the real
  * artifacts that motivated it: BENCH_r14's mvt samples (external load
  * arrived mid-run; median read 52 s against a judge-measured 5.8 s
  * quiet) must fingerprint as contaminated, and the quiet runs' tight
  * spreads must not. The quiet-band median must recover the true
  * figure once re-run samples land.
  */
class BenchGuardSpec extends AnyFunSuite {

  // BENCH_r14.json q_tiles_mvt_bytes — the poisoned run on file
  private val r14Mvt = Seq(64.294, 58.532, 19.585, 10.371, 52.247)
  // the judge's quiet solo re-run of the same binary
  private val quietMvt = Seq(5.671, 5.822, 6.068, 5.806, 5.747)

  test("median is the midpoint for odd and even sample counts") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("the r14 poisoned spread fingerprints; quiet spreads do not") {
    assert(Bench.fingerprinted(r14Mvt),
      "the 6.2x contaminated spread must flag")
    assert(!Bench.fingerprinted(quietMvt),
      "a 1.07x quiet spread must not flag")
    // a routine JIT/GC wobble (<2x) stays unflagged
    assert(!Bench.fingerprinted(Seq(1.0, 1.4, 1.9, 1.2, 1.3)))
  }

  test("quiet-band median recovers the true figure after re-runs") {
    // the r14 scenario with one re-run round taken after the external
    // load subsided: a 50/50 poisoned/quiet mix slips UNDER the
    // fingerprint (median 8.2 s / min 5.67 = 1.45x) yet its plain
    // median would read ~1.4x high — the reported figure must come
    // from the quiet band, not the mix
    val combined = r14Mvt ++ quietMvt
    assert(!Bench.fingerprinted(combined),
      "the mixed spread slips under the fingerprint — which is WHY " +
        "reportedMedian must band unconditionally")
    val reported = Bench.reportedMedian(combined)
    assert(reported > 5.5 && reported < 6.5,
      s"quiet-band median should sit near the true ~5.8 s, got $reported")
    // clean samples report the plain median untouched
    assert(Bench.reportedMedian(quietMvt) == Bench.median(quietMvt))
    // fully-poisoned with no quiet re-runs: the band keeps the best
    // cluster and the run stays stamped suspect via fingerprinted()
    assert(Bench.fingerprinted(r14Mvt))
    assert(Bench.reportedMedian(r14Mvt) < Bench.median(r14Mvt))
  }
}
