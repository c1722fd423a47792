package graft

import org.apache.spark.sql.functions._

/** Planted-pair recall as a CI gate (VERDICT r16 #4): the ≥95%
  * LSH-recall claim previously lived only in the once-a-round
  * DedupScaleProbe runMain (500k docs, 99.49% measured) while the
  * test suite pinned just the generator's invariants — so a banding
  * or bucket-salting regression in the REGISTERED dedup queries would
  * survive `sbt test` and only surface when someone re-ran the probe.
  * This is the same planted corpus (one near-dup pair per ten docs,
  * one token of sixty substituted → shingle Jaccard ~0.9, far above
  * the 0.5 gate) at a suite-friendly 30k docs, driven through the
  * exact production entry points (`SparkEntry.queries`).
  */
class DedupPlantedRecallSpec extends SparkSpec {

  test("q_dedup_minhash_lsh recall >= 95% on 3k planted pairs; " +
      "q_dedup_exact finds 0 dup rows in the near-dup-only corpus") {
    val nDocs = 30000L
    val dir = TempDirs.scoped("graft_recalltest_").toString
    graft.operators.DedupScaleProbe.genDocuments(spark, nDocs)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // near-dups only: the normalized-text hash must collapse nothing —
    // a nonzero count is an exact-dup FALSE POSITIVE (or a generator
    // break, which DedupScaleProbeSpec pins separately)
    val exactDups = SparkEntry.queries("q_dedup_exact")(spark, dir)
      .select(col("n_dup_rows")).head().getLong(0)
    assert(exactDups == 0L,
      s"$exactDups exact-dup rows reported in a near-dup-only corpus")

    // planted pair (10g+8, 10g+9): LSH banding missing it is a bug,
    // not noise — at ~0.9 Jaccard every pair should band-collide in
    // at least one of the bands with overwhelming probability
    val planted = nDocs / 10
    val found = SparkEntry.queries("q_dedup_minhash_lsh")(spark, dir)
      .filter(col("doc_b") === col("doc_a") + 1 &&
        pmod(col("doc_a"), lit(10)) === 8)
      .count()
    assert(found >= (planted * 95) / 100,
      s"LSH recall on planted near-dups: $found of $planted < 95% — " +
        "banding/salting regression in the registered minhash path")
  }
}
