package graft

import org.apache.spark.sql.functions._

/** Pins the DedupScaleProbe generator's invariants: the probe's
  * ≥95%-LSH-recall assertion at 500k docs (99.49% measured, r16) is
  * only meaningful if the planted near-dup structure is exactly what
  * the probe asserts recall AGAINST — one pair per ten docs, one
  * token of sixty
  * substituted, languages shared within a pair, every other text
  * unique, and the whole corpus bit-deterministic across runs. */
class DedupScaleProbeSpec extends SparkSpec {

  test("documents: planted near-dup pairs differ in exactly one token") {
    val docs = graft.operators.DedupScaleProbe
      .genDocuments(spark, 500).cache()
    assert(docs.count() == 500)
    val pairs = docs.filter(pmod(col("doc_id"), lit(10)) === 8)
      .select(col("doc_id").as("a_id"), col("text").as("a_text"),
        col("lang").as("a_lang"))
      .join(docs.filter(pmod(col("doc_id"), lit(10)) === 9)
        .select((col("doc_id") - 1).as("a_id"), col("text").as("b_text"),
          col("lang").as("b_lang")), Seq("a_id"))
      .collect()
    assert(pairs.length == 50)
    pairs.foreach { r =>
      val (a, b) = (r.getAs[String]("a_text").split(" "),
        r.getAs[String]("b_text").split(" "))
      assert(a.length == 60 && b.length == 60)
      val diffs = a.zip(b).count { case (x, y) => x != y }
      assert(diffs == 1, s"planted pair ${r.getAs[Long]("a_id")} differs " +
        s"in $diffs tokens, not 1")
      assert(r.getAs[String]("a_lang") == r.getAs[String]("b_lang"),
        "planted pair must share lang (band-blocked pipelines)")
    }
  }

  test("documents: non-planted texts are unique; no exact dups anywhere") {
    val docs = graft.operators.DedupScaleProbe.genDocuments(spark, 1000)
    val distinct = docs.select("text").distinct().count()
    assert(distinct == 1000L,
      s"expected 1000 unique texts, got $distinct — exact collisions " +
        "would make q_dedup_exact nonzero and recall ill-defined")
  }

  test("generation is deterministic across invocations") {
    def fingerprint() = graft.operators.DedupScaleProbe
      .genDocuments(spark, 300)
      .select(md5(concat_ws("|", col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))).as("h"))
      .agg(md5(concat_ws("", sort_array(collect_list("h")))))
      .head().getString(0)
    assert(fingerprint() == fingerprint())
  }

  test("embeddings: 64 finite dims, bounded labels, cluster structure") {
    val e = graft.operators.DedupScaleProbe
      .genEmbeddings(spark, 400).cache()
    assert(e.count() == 400)
    val bad = e.filter(size(col("embedding")) =!= 64 ||
      exists(col("embedding"), v => isnan(v) || v.isNull) ||
      col("label") < 0 || col("label") >= 200).count()
    assert(bad == 0)
    // cluster structure: same-label vectors sit closer than the global
    // spread (centroid magnitude ~1.0, noise ~0.1) — spot-check that
    // per-label variance of the first dim is far below global variance
    val d0 = e.select(col("label"),
      element_at(col("embedding"), 1).cast("double").as("d0"))
    val globalVar = d0.agg(var_pop("d0")).head().getDouble(0)
    val withinVar = d0.groupBy("label").agg(var_pop("d0").as("v"))
      .agg(avg("v")).head().getDouble(0)
    assert(withinVar < globalVar / 10,
      f"within-label var $withinVar%.4f not well below global " +
        f"$globalVar%.4f — ANN probes would index noise")
  }
}
