package graft

import graft.operators.CorpusProfile
import org.apache.spark.sql.functions._

/** Invariant checks for the corpus-profiling operators over the
  * sf0.001 tables (oracle hash-equality is the driver gate; these pin
  * the structural properties a hash can't express).
  */
class CorpusProfileSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("vocab coverage: rates bounded, OOV nonzero with a top-16 vocab") {
    val rows = run("q_vocab_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nOov = r.getAs[Long]("n_oov")
      val rate = r.getAs[Double]("oov_rate")
      assert(nOov <= nTok)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // 31 token types vs a 16-entry vocab: some source must see OOV
    assert(rows.map(_.getAs[Long]("n_oov")).sum > 0)
  }

  test("source overlap: ordered pairs, shared bounded by set sizes") {
    val rows = run("q_source_overlap").collect()
    assert(rows.nonEmpty, "overlap matrix must not be trivially empty")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b)
      val shared = r.getAs[Long]("n_shared")
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(shared >= 1 && shared <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("split contamination: counts bounded; known leakage detected") {
    val rows = run("q_split_contamination").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_test_docs"))
      val rate = r.getAs[Double]("contam_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      if (r.getAs[Long]("n_contaminated") == 0)
        assert(r.getAs[Long]("n_shared_grams") == 0L)
    }
    // the sf0.001 corpus has exact-dup twins straddling the hash
    // split, so leakage must actually fire somewhere
    assert(rows.map(_.getAs[Long]("n_contaminated")).sum > 0)
  }

  test("mixture weights: shares and temperature weights each sum to 1") {
    val rows = run("q_mixture_weights").collect()
    assert(rows.length > 1)
    def sumOf(c: String) = rows.map(_.getAs[Double](c)).sum
    assert(math.abs(sumOf("nat_share") - 1.0) < 1e-4)
    assert(math.abs(sumOf("w_alpha") - 1.0) < 1e-4)
    // alpha=0.5 flattens: the largest source's weight must not exceed
    // its natural share, the smallest source's must not fall below it
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(byTok.last.getAs[Double]("w_alpha")
      <= byTok.last.getAs[Double]("nat_share") + 1e-9)
    assert(byTok.head.getAs[Double]("w_alpha")
      >= byTok.head.getAs[Double]("nat_share") - 1e-9)
  }

  test("quality-vs-dup: bucket ranges nest in deciles, rates bounded") {
    val rows = run("q_quality_vs_dup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 9)
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("score_min") <= r.getAs[Double]("score_max"))
      if (b < 9) assert(r.getAs[Double]("score_max") < (b + 1) / 10.0 + 1e-9)
    }
  }

  test("dup spans: coverage bounded; exact-dup documents imply full span coverage") {
    val rows = run("q_dup_spans").collect()
    assert(rows.map(_.getAs[Long]("n_dup_docs")).sum > 0,
      "corpus has exact-dup docs, so dup spans must fire")
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
    }
    // Any doc with an exact same-text twin and >= SpanGram tokens is
    // fully covered by duplicated grams; its source must report
    // dup_tokens >= that doc's token count.
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text"),
        functions.TextFunctions.wsTokenCount(col("text")).as("ntok"))
    val twin = docs.groupBy("text").count().filter(col("count") > 1)
      .join(docs, Seq("text"))
      .filter(col("ntok") >= CorpusProfile.SpanGram)
      .groupBy("source").agg(max("ntok").as("need"))
      .as[(String, Int)].collect().toMap
    val got = rows.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("dup_tokens")).toMap
    twin.foreach { case (src, need) =>
      assert(got.getOrElse(src, 0L) >= need,
        s"source $src: twin doc with $need tokens must be span-covered")
    }
  }
}
