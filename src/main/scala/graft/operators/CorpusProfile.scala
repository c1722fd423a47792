package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Corpus-profiling operators for the training-data pipeline: the
  * diagnostic reports a data curator runs BEFORE committing to a
  * mixture — vocabulary coverage / OOV rate against a learned top-V
  * vocabulary, the cross-source contamination matrix (which sources
  * share identical documents), and duplicate n-gram span coverage
  * (what fraction of each source's tokens sits inside a word n-gram
  * that occurs more than once in the corpus — the substring-level dup
  * signal that document-level fingerprints cannot see).
  *
  * Scale theme: every operator reduces the corpus to token- or
  * gram-keyed aggregates with map-side partial aggregation before any
  * join, joins only on equality keys, and broadcasts only
  * provably-tiny sides (a top-V vocab, a per-source count dim).
  */
object CorpusProfile {

  /** Vocabulary size for the coverage report (top-V by corpus
    * frequency, ties broken by token — a deterministic total order).
    */
  val VocabSize = 16

  // ---- vocabulary coverage / OOV rate ----------------------------------
  // Learn the top-V vocabulary from corpus token frequencies, then
  // report per-source token counts, OOV occurrences, OOV rate and
  // distinct OOV types — the pre-flight check before committing to a
  // fixed tokenizer vocabulary. Shape: word-count agg (map-side
  // combine, one shuffle on token), top-V via orderBy+limit (compiles
  // to TakeOrderedAndProject — never a global sort), then a broadcast
  // left join back onto the exploded stream and one per-source agg.
  // At 100 TB the token-count table is |types| rows (millions, not
  // billions) and everything else is map-side.
  private val qVocabCoverage = QuerySpec.of(
    "q_vocab_coverage", {
      val toks = sql.toks
      s"""WITH e AS (SELECT source, unnest($toks) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS n FROM e GROUP BY tok),
        |v AS (SELECT tok FROM c ORDER BY n DESC, tok LIMIT $VocabSize),
        |j AS (
        |  SELECT e.source, e.tok, (v.tok IS NOT NULL) AS hit
        |  FROM e LEFT JOIN v ON e.tok = v.tok)
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
        |  round(CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS DOUBLE)
        |    / count(*), 6) AS oov_rate,
        |  CAST(count(DISTINCT CASE WHEN NOT hit THEN tok END) AS BIGINT)
        |    AS n_oov_types
        |FROM j GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    val ex = Tables.fanout(Tables.documents(s, d))
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val vocab = ex.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(VocabSize)
      .select(col("tok"), lit(true).as("hit"))
    val oov = when(col("hit").isNull, 1L).otherwise(0L)
    ex.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), sum(oov).as("n_oov"),
        round(sum(oov).cast("double") / count(lit(1)), 6).as("oov_rate"),
        countDistinct(when(col("hit").isNull, col("tok")))
          .as("n_oov_types"))
      .orderBy("source")
  }

  // ---- cross-source fingerprint overlap matrix -------------------------
  // Which pairs of sources contain identical documents (by the sorted
  // token-set fingerprint), how many, and the Jaccard overlap of their
  // fingerprint sets — the "is my eval source contaminated by my
  // train source" matrix at document granularity. Shape: distinct
  // (source, fp) FIRST (the big shrink), equality self-join on fp
  // (never all-pairs of documents — only fingerprints that actually
  // collide meet), per-source set sizes join in as a broadcast dim.
  // Jaccard is integer counts + one division, so the hash compare is
  // engine-stable.
  private val qSourceOverlap = QuerySpec.of(
    "q_source_overlap", {
      val fp = sql.fingerprint
      s"""WITH f AS (SELECT DISTINCT source, $fp AS fp FROM documents),
        |n AS (SELECT source, count(*) AS nfp FROM f GROUP BY source),
        |p AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared
        |  FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, n_shared,
        |  na.nfp AS n_a, nb.nfp AS n_b,
        |  round(CAST(n_shared AS DOUBLE)
        |    / (na.nfp + nb.nfp - n_shared), 6) AS jaccard
        |FROM p
        |JOIN n na ON na.source = p.source_a
        |JOIN n nb ON nb.source = p.source_b
        |ORDER BY source_a, source_b""".stripMargin
    }) { (s, d) =>
    val f = Tables.fanout(Tables.documents(s, d))
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .distinct()
    val n = f.groupBy("source").agg(count(lit(1)).as("nfp"))
    val pairs = f.as("a")
      .join(f.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(n.select(col("source").as("source_a"), col("nfp").as("n_a"))),
        Seq("source_a"))
      .join(broadcast(n.select(col("source").as("source_b"), col("nfp").as("n_b"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        round(col("n_shared").cast("double")
          / (col("n_a") + col("n_b") - col("n_shared")), 6).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** Word-gram width for duplicate-span detection. */
  val SpanGram = 8

  // ---- duplicate n-gram span coverage ----------------------------------
  // For every document, the fraction of its tokens covered by some
  // word 8-gram that occurs more than once in the whole corpus
  // (counting repeats within one document too) — the substring-level
  // duplication profile behind "train on unique text" policies:
  // document fingerprints catch whole-doc dups, this catches shared
  // boilerplate spans inside otherwise-distinct documents.
  // Shape: gram occurrences carry (doc, pos); the occurrence count
  // aggregates with map-side combine on the gram key; only DUP grams
  // (a small minority) rejoin and fan out to their ≤8 covered
  // positions, and the distinct-position dedup collapses overlapping
  // spans before the per-doc count. The full gram stream is never
  // joined to itself — only grams that collide meet, and non-dup
  // grams die at the HAVING.
  private val qDupSpans = QuerySpec.of(
    "q_dup_spans", {
      val toks = sql.toks
      val g = SpanGram
      s"""WITH t AS (SELECT doc_id, source, $toks AS toks FROM documents),
        |b AS (
        |  SELECT doc_id, source, len(toks) AS ntok,
        |    CASE WHEN len(toks) < $g THEN [] ELSE
        |      list_transform(range(0, len(toks) - ${g - 1}),
        |        i -> array_to_string(list_slice(toks, i + 1, i + $g), ' '))
        |      END AS grams
        |  FROM t),
        |o AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, len(grams)),
        |      i -> struct_pack(pos := i, gram := grams[i + 1]))) AS u
        |  FROM b),
        |occ AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM o),
        |dupg AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) > 1),
        |cov AS (
        |  SELECT DISTINCT doc_id, cpos FROM (
        |    SELECT occ.doc_id, unnest(range(occ.pos, occ.pos + $g)) AS cpos
        |    FROM occ JOIN dupg USING (gram))),
        |cv AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY doc_id),
        |per AS (
        |  SELECT b.source, b.ntok, coalesce(cv.covered, 0) AS covered
        |  FROM b LEFT JOIN cv USING (doc_id))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN covered > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(sum(covered) AS BIGINT) AS dup_tokens,
        |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(covered) AS DOUBLE) / sum(ntok), 6)
        |    AS dup_token_frac
        |FROM per GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    val base = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), size(col("toks")).as("ntok"),
        shingles(col("toks"), SpanGram).as("grams"))
    val occ = base.select(col("doc_id"),
      posexplode(col("grams")).as(Seq("pos", "gram")))
    val dupg = occ.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("gram")
    val cov = occ.join(dupg, Seq("gram"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SpanGram - 1))).as("cpos"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("covered"))
    base.select(col("doc_id"), col("source"), col("ntok"))
      .join(cov, Seq("doc_id"), "left")
      .withColumn("covered", coalesce(col("covered"), lit(0L)))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("covered") > 0).cast("long")).as("n_dup_docs"),
        sum("covered").as("dup_tokens"),
        sum("ntok").as("total_tokens"),
        round(sum("covered").cast("double") / sum("ntok"), 6)
          .as("dup_token_frac"))
      .orderBy("source")
  }

  val specs: Seq[QuerySpec] = Seq(qVocabCoverage, qSourceOverlap, qDupSpans)
}
