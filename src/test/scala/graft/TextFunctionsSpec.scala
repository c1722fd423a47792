package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens lowercases, splits on non-alnum, drops empties") {
    val got = Seq("Hello, World! 42x").toDF("text")
      .select(tokens(col("text"))).collect().head.getSeq[String](0)
    assert(got == Seq("hello", "world", "42x"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val r = Seq("Hello, world! a-b 12").toDF("text")
      .select(wsTokenCount(col("text")), bpeTokenCount(col("text")))
      .collect().head
    assert(r.getInt(0) == 4)
    // hello , world ! a - b 12 → 8
    assert(r.getInt(1) == 8)
  }

  test("shingles builds word n-grams; short docs → empty") {
    val got = Seq("a b c d", "a b").toDF("text")
      .select(shingles(tokens(col("text")), 3)).collect()
    assert(got(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(got(1).getSeq[String](0) == Seq())
  }

  test("fingerprint is invariant to word order and duplication") {
    val fps = Seq("the quick fox", "fox the quick the")
      .toDF("text").select(fingerprint(col("text"))).collect()
    assert(fps(0).getString(0) == fps(1).getString(0))
  }

  test("minhash signature: equal shingle sets → equal signatures") {
    val sigs = Seq("a b c d e", "a b c d e").toDF("text")
      .select(minhashSignature(shingles(tokens(col("text")), 3), 12))
      .collect()
    assert(sigs(0).getSeq[Long](0) == sigs(1).getSeq[Long](0))
    assert(sigs(0).getSeq[Long](0).size == 12)
  }

  test("simhash: equal token multisets equal; disjoint texts differ") {
    val s = Seq("alpha beta gamma", "alpha beta gamma", "delta epsilon zeta")
      .toDF("text").select(simhash32(tokens(col("text")))).collect()
    assert(s(0).getLong(0) == s(1).getLong(0))
    assert(s(0).getLong(0) != s(2).getLong(0))
    assert(s(0).getLong(0) >= 0 && s(0).getLong(0) < (1L << 32))
  }

  test("qualityScore in [0,1]; long clean text scores higher than junk") {
    val r = Seq(
      ("the quick brown fox jumps over the lazy dog and runs to the hills " * 5),
      ("@@@ ### $$$ 12345 @@@"))
      .toDF("text").select(qualityScore(col("text"))).collect()
    val clean = r(0).getDouble(0); val junk = r(1).getDouble(0)
    assert(clean >= 0 && clean <= 1 && junk >= 0 && junk <= 1)
    assert(clean > junk)
  }

  test("portable hash32/hash64 match a java md5 reimplementation") {
    val got = Seq("abc").toDF("s")
      .select(graft.functions.HashFunctions.hash32(col("s")),
        graft.functions.HashFunctions.hash64(col("s")))
      .collect().head
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(got.getLong(0) == java.lang.Long.parseLong(md5hex.take(8), 16))
    assert(got.getLong(1) == java.lang.Long.parseLong(md5hex.take(15), 16))
  }
}
