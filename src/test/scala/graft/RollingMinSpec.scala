package graft

import graft.functions.RollingMinExpr
import org.apache.spark.sql.functions._

/** The native monotonic-deque window min must agree with the
  * declarative transform/slice/array_min form it replaced — on random
  * inputs (seeded differential sweep), ties, and null elements.
  */
class RollingMinSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(hs: Seq[java.lang.Long], w: Int): Seq[Any] =
    Seq(Tuple1(hs)).toDF("hs")
      .select(transform(
        sequence(lit(1), greatest(size(col("hs")) - w + 1, lit(0))),
        j => array_min(slice(col("hs"), j, lit(w)))).as("m"))
      .collect().head.getSeq[Any](0)

  private def native(hs: Seq[java.lang.Long], w: Int): Seq[Any] =
    Seq(Tuple1(hs)).toDF("hs")
      .select(RollingMinExpr.rollingMin(col("hs"), w).as("m"))
      .collect().head.getSeq[Any](0)

  test("matches the declarative window min on random arrays") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 60) {
      val n = 1 + rnd.nextInt(40)
      val w = 1 + rnd.nextInt(12)
      val xs = Seq.fill(n)(java.lang.Long.valueOf(rnd.nextLong() % 1000))
      if (n >= w) assert(native(xs, w) == declarative(xs, w),
        s"n=$n w=$w xs=$xs")
      else assert(native(xs, w) == Seq())
    }
  }

  test("ties and duplicates keep the window minimum") {
    val xs = Seq(5L, 5L, 1L, 1L, 5L, 0L, 0L, 9L).map(java.lang.Long.valueOf)
    assert(native(xs, 3) == Seq(1L, 1L, 1L, 0L, 0L, 0L))
  }

  test("null elements are ignored; an all-null window is null") {
    val xs = Seq[java.lang.Long](null, 7L, null, null, null, 3L)
    assert(native(xs, 2) == Seq(7L, 7L, null, null, 3L))
    assert(native(Seq[java.lang.Long](null, null), 2) == Seq(null))
  }

  test("short input yields an empty sketch, not descending windows") {
    assert(native(Seq(1L, 2L).map(java.lang.Long.valueOf), 5) == Seq())
  }

  // ---- SimHash32Expr: differential vs the replaced declarative form ----

  private def simhashDeclarative(hs: Seq[java.lang.Long]): Long =
    Seq(Tuple1(hs)).toDF("hashes")
      .select(aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) => {
        val vote = aggregate(col("hashes"), lit(0),
          (s, h) => s + when(
            call_function("shiftright", h, b).bitwiseAND(1) === 1, 1)
            .otherwise(-1))
        acc + when(vote > 0, call_function("shiftleft", lit(1L), b))
          .otherwise(0L)
      }).as("sim")).collect().head.getLong(0)

  private def simhashNative(hs: Seq[java.lang.Long]): Long =
    Seq(Tuple1(hs)).toDF("hashes")
      .select(graft.functions.SimHash32Expr.simhash32(col("hashes")))
      .collect().head.getLong(0)

  test("simhash kernel matches the declarative bit votes on random input") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 40) {
      val n = rnd.nextInt(30)
      val xs = Seq.fill(n)(
        java.lang.Long.valueOf(rnd.nextLong().abs % (1L << 32)))
      assert(simhashNative(xs) == simhashDeclarative(xs), s"xs=$xs")
    }
  }

  test("simhash: empty array is 0; null element votes like hash 0") {
    assert(simhashNative(Seq()) == 0L)
    val withNull = Seq[java.lang.Long](null, 0xFFFFFFFFL, 0xFFFFFFFFL)
    assert(simhashNative(withNull) == simhashDeclarative(withNull))
    assert(simhashNative(withNull) == 0xFFFFFFFFL) // 2-1 majority per bit
  }

  // ---- MinHashSigExpr: differential vs the replaced declarative form ----

  private def minhashDeclarative(sh: Seq[String], k: Int): Seq[Any] =
    Seq(Tuple1(sh)).toDF("sh")
      .select(transform(sequence(lit(0), lit(k - 1)), j =>
        array_min(transform(col("sh"), s =>
          graft.functions.HashFunctions.hash64(
            concat(j.cast("string"), lit(":"), s))))).as("sig"))
      .collect().head.getSeq[Any](0)

  private def minhashNative(sh: Seq[String], k: Int): Seq[Any] =
    Seq(Tuple1(sh)).toDF("sh")
      .select(graft.functions.MinHashSigExpr.minhashSig(col("sh"), k)
        .as("sig"))
      .collect().head.getSeq[Any](0)

  test("minhash kernel matches the declarative seeded-md5 minima") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 25) {
      val n = 1 + rnd.nextInt(20)
      val k = 1 + rnd.nextInt(16)
      val sh = Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(12))
        .mkString + (if (rnd.nextBoolean()) " zügig" else ""))
      assert(minhashNative(sh, k) == minhashDeclarative(sh, k),
        s"k=$k sh=$sh")
    }
  }

  test("minhash: empty shingles give k nulls; seeds differ") {
    assert(minhashNative(Seq(), 4) == Seq(null, null, null, null))
    val sig = minhashNative(Seq("alpha beta gamma"), 12)
    assert(sig.toSet.size == 12) // 12 independent seeded hashes
  }

  // ---- ShinglesExpr: differential vs the replaced declarative form ----

  private def shinglesDeclarative(toks: Seq[String], n: Int): Seq[String] =
    Seq(Tuple1(toks)).toDF("toks")
      .select(when(size(col("toks")) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("sh"))
      .collect().head.getSeq[String](0)

  private def shinglesNative(toks: Seq[String], n: Int): Seq[String] =
    Seq(Tuple1(toks)).toDF("toks")
      .select(graft.functions.ShinglesExpr.shingles(col("toks"), n).as("sh"))
      .collect().head.getSeq[String](0)

  test("shingle kernel matches the declarative windows on random input") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 40) {
      val len = rnd.nextInt(12)
      val n = 1 + rnd.nextInt(5)
      val toks = Seq.fill(len)(
        rnd.alphanumeric.take(1 + rnd.nextInt(6)).mkString)
      assert(shinglesNative(toks, n) == shinglesDeclarative(toks, n),
        s"n=$n toks=$toks")
    }
  }

  test("shingles: null tokens are skipped by the joiner, like concat_ws") {
    val toks = Seq("a", null, "c", "d")
    assert(shinglesNative(toks, 3) == shinglesDeclarative(toks, 3))
    assert(shinglesNative(toks, 3) == Seq("a c", "c d"))
  }

  // ---- GramHashExpr: differential vs the replaced declarative form ----

  private def gramsDeclarative(text: String, k: Int): Seq[Long] =
    Seq(text).toDF("text")
      .select(transform(sequence(lit(1), length(col("text")) - k + 1),
        i => graft.functions.HashFunctions.hash32(
          col("text").substr(i, lit(k)))).as("hs"))
      .collect().head.getSeq[Long](0)

  private def gramsNative(text: String, k: Int): Seq[Long] =
    Seq(text).toDF("text")
      .select(graft.functions.GramHashExpr.gramHashes(col("text"), k)
        .as("hs"))
      .collect().head.getSeq[Long](0)

  test("gram-hash kernel matches the declarative substr/md5 chain") {
    val rnd = new scala.util.Random(19)
    for (_ <- 1 to 25) {
      val len = rnd.nextInt(40)
      val k = 1 + rnd.nextInt(8)
      val text = rnd.alphanumeric.take(len).mkString
      if (len >= k)
        assert(gramsNative(text, k) == gramsDeclarative(text, k),
          s"k=$k text=$text")
      else assert(gramsNative(text, k) == Seq())
    }
  }

  test("gram-hash positions count code points, not bytes") {
    // 'ü' is 2 UTF-8 bytes but one code point — grams must align on
    // characters exactly like substr()
    val text = "über grün"
    assert(gramsNative(text, 4) == gramsDeclarative(text, 4))
  }

  // ---- VocabHitsExpr: differential vs the replaced declarative form ----

  test("vocab-hit kernel counts with multiplicity; nulls never hit") {
    val vocab = Seq("the", "a", "of")
    def declarative(toks: Seq[String]): Int =
      Seq(Tuple1(toks)).toDF("toks")
        .select(size(filter(col("toks"),
          t => t.isin(vocab.map(x => x: Any): _*))).as("n"))
        .collect().head.getInt(0)
    def native(toks: Seq[String]): Int =
      Seq(Tuple1(toks)).toDF("toks")
        .select(graft.functions.VocabHitsExpr.vocabHits(col("toks"), vocab)
          .as("n")).collect().head.getInt(0)
    val cases = Seq(
      Seq("the", "the", "cat", "of"),
      Seq("a", null, "the"),
      Seq[String](),
      Seq("dog", "fish"))
    cases.foreach { c =>
      assert(native(c) == declarative(c), s"toks=$c")
    }
    assert(native(Seq("the", "the", "cat", "of")) == 3) // multiplicity
  }
}
