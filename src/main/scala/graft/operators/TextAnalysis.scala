package graft.operators

import graft.{QuerySpec, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, language identification, fingerprinting.
  *
  * Scale notes: all are embarrassingly parallel per-row column
  * expressions (single scan, no shuffle except the final aggregations),
  * so they pipeline inside one whole-stage-codegen span per partition —
  * exactly what you want for a 100 TB document corpus. The groupBys
  * aggregate partial (map-side) before the exchange.
  */
object TextAnalysis {

  private val langs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "es" -> Seq("el", "los", "las", "es", "y", "en", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pas"))

  // Per-document token statistics (whitespace + BPE-ish + char ratios).
  private val qTokenStats = QuerySpec.of(
    "q_text_token_stats",
    """SELECT doc_id,
      |  len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS ws_tokens,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
      |  (floor((CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |    CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END) * 1e6 + 0.5) / 1e6) AS punct_ratio,
      |  (floor((CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) = 0 THEN 0.0 ELSE
      |    CAST(list_sum(list_transform(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> ''), t -> strlen(t))) AS DOUBLE)
      |      / len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) END) * 1e6 + 0.5) / 1e6) AS mean_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
    headline = true) { (s, d) =>
    val docs = Tables.fanout(Tables.documents(s, d))
    // one single-pass kernel for all four stats (TokenStatsExpr) in
    // place of four regex/array passes over the same text; the ratio
    // arithmetic on the counters is identical to the replaced
    // punctRatio/meanTokenLen forms (TokenStatsSpec pins equality)
    docs.select(col("doc_id"), tokenStats(col("text")).as("ts"))
      .select(
        col("doc_id"),
        col("ts.ws_tokens").as("ws_tokens"),
        col("ts.bpe_tokens").as("bpe_tokens"),
        (floor(when(col("ts.n_chars") === 0, 0.0)
          .otherwise(col("ts.punct").cast("double") / col("ts.n_chars"))
          * 1e6 + 0.5) / 1e6).as("punct_ratio"),
        (floor(when(col("ts.alnum_runs") === 0, 0.0)
          .otherwise(col("ts.alnum_chars").cast("double")
            / col("ts.alnum_runs"))
          * 1e6 + 0.5) / 1e6).as("mean_token_len"))
      .orderBy("doc_id")
  }

  // Quality score distribution per source.
  private val qQuality = QuerySpec.of(
    "q_text_quality_by_source",
    """WITH t AS (
      |  SELECT source,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks,
      |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |      CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
      |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
      |      CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio
      |  FROM documents),
      |s AS (
      |  SELECT source,
      |    (floor((least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.4
      |      + least(1.0, (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
      |          CAST(len(list_filter(toks, t -> t IN ('the','a','an','and','of','to','in','is','it','that'))) AS DOUBLE) / len(toks) END) * 4.0) * 0.4
      |      + (1.0 - least(1.0, (punct_ratio + digit_ratio) * 5.0)) * 0.2) * 1e6 + 0.5) / 1e6) AS score
      |  FROM t)
      |SELECT source, count(*) AS n_docs,
      |  (floor((avg(score)) * 1e6 + 0.5) / 1e6) AS avg_quality,
      |  (floor((min(score)) * 1e6 + 0.5) / 1e6) AS min_quality,
      |  (floor((max(score)) * 1e6 + 0.5) / 1e6) AS max_quality
      |FROM s GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Tables.fanout(Tables.documents(s, d))
      .select(col("source"), qualityScore(col("text")).as("score"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        (floor((avg("score")) * 1e6 + 0.5) / 1e6).as("avg_quality"),
        (floor((min("score")) * 1e6 + 0.5) / 1e6).as("min_quality"),
        (floor((max("score")) * 1e6 + 0.5) / 1e6).as("max_quality"))
      .orderBy("source")
  }

  // Language-ID confusion matrix: labeled lang vs n-gram/stopword
  // heuristic prediction (argmax hits, fixed precedence, 0 → unknown).
  private val qLangId = {
    val sqlHits = langs.map { case (l, vocab) =>
      s"len(list_filter(toks, t -> t IN ${sql.vocabIn(vocab)})) AS h_$l"
    }.mkString(",\n      |    ")
    val pred = langs.map { case (l, _) =>
      s"WHEN h_$l = best AND best > 0 THEN '$l'"
    }.mkString(" ")
    QuerySpec.of(
      "q_text_langid",
      s"""WITH t AS (
        |  SELECT lang,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
        |  FROM documents),
        |h AS (SELECT lang, $sqlHits FROM t),
        |p AS (
        |  SELECT lang, greatest(${langs.map("h_" + _._1).mkString(", ")}) AS best,
        |    ${langs.map(x => "h_" + x._1).mkString(", ")} FROM h)
        |SELECT lang, CASE $pred ELSE 'unknown' END AS lang_pred, count(*) AS n
        |FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin) { (s, d) =>
      val toks = tokens(col("text"))
      val withHits = Tables.fanout(Tables.documents(s, d))
        .select(col("lang") +: langs.map { case (l, vocab) =>
          vocabHits(toks, vocab).as(s"h_$l")
        }: _*)
      val best = greatest(langs.map(x => col("h_" + x._1)): _*)
      // foldRight so the first lang in `langs` wins ties — same
      // precedence as the oracle's CASE order.
      val pred = langs.foldRight(lit("unknown")) { case ((l, _), acc) =>
        when(col("h_" + l) === best && best > 0, lit(l)).otherwise(acc)
      }
      withHits.select(col("lang"), pred.as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "lang_pred")
    }
  }

  // Fingerprint duplicate groups (canonical token-set fingerprint).
  private val qFingerprint = QuerySpec.of(
    "q_text_fingerprint_dups",
    s"""SELECT ${sql.fingerprint} AS fp, count(*) AS n_docs,
      |  min(doc_id) AS keep_doc
      |FROM documents
      |GROUP BY fp HAVING count(*) > 1
      |ORDER BY fp""".stripMargin) { (s, d) =>
    Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("fp")
  }

  // Deterministic train/validation/test split by content-independent
  // id hash — the standard reproducible-split operator of a training
  // corpus pipeline: split membership is a pure function of doc_id
  // (stable across reruns, machines and partitionings; no sampling
  // state), 80/10/10 by hash bucket. Single scan, map-side only until
  // the 3-row aggregate.
  private val qSplit = QuerySpec.of(
    "q_split_hash", {
      val bk = graft.functions.HashFunctions.sqlHash32("doc_id")
      s"""WITH b AS (
        |  SELECT doc_id, n_chars, ($bk) % 100 AS bk FROM documents)
        |SELECT CASE WHEN bk < 80 THEN 'train'
        |  WHEN bk < 90 THEN 'validation' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin
    }) { (s, d) =>
    val bk = pmod(graft.functions.HashFunctions.hash32(col("doc_id")),
      lit(100))
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        when(bk < 80, "train").when(bk < 90, "validation")
          .otherwise("test").as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("split")
  }

  // Corpus vocabulary: top-20 bigrams by frequency, ties broken by
  // gram text. The workhorse shape of vocabulary/BPE-merge building:
  // explode grams → hash-aggregate with map-side partials → one
  // narrow (gram, count) exchange → global top-k. At 100 TB the
  // partial aggregation absorbs the explosion before the shuffle; the
  // final top-k is a TakeOrdered over the aggregated table, never a
  // full sort of the gram space.
  private val qTopNgrams = QuerySpec.of(
    "q_text_top_ngrams", {
      val toks = graft.functions.TextFunctions.sql.toks
      val grams = graft.functions.TextFunctions.sql.shingles("toks", 2)
      s"""WITH t AS (SELECT $toks AS toks FROM documents),
        |g AS (SELECT unnest($grams) AS gram FROM t)
        |SELECT gram, count(*) AS n FROM g
        |GROUP BY gram ORDER BY n DESC, gram LIMIT 20""".stripMargin
    }) { (s, d) =>
    Tables.fanout(Tables.documents(s, d))
      .select(explode(shingles(tokens(col("text")), 2)).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(20)
  }

  // Contamination / canary scan: which documents contain any of a
  // probe set of strings (benchmark canaries, PII markers, eval-set
  // fragments) — the corpus-hygiene scan every training pipeline runs
  // before a data release. Substring containment per (doc, probe),
  // grouped by probe and source. Single scan of the corpus; the probe
  // set is a literal array (broadcast-sized by construction).
  private val ContaminationProbes = Seq(
    "slow fast table", "batch window spark", "vector table fast")

  private val qContamination = QuerySpec.of(
    "q_text_contamination", {
      val probeList = ContaminationProbes.map(p => s"'$p'").mkString(", ")
      s"""SELECT probe, source, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM documents, unnest([$probeList]) AS u(probe)
        |WHERE contains(text, probe)
        |GROUP BY probe, source
        |ORDER BY probe, source""".stripMargin
    }) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        explode(array(ContaminationProbes.map(lit): _*)).as("probe"))
      .filter(col("text").contains(col("probe")))
      .groupBy("probe", "source")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .orderBy("probe", "source")
  }

  // Per-source dedup-rate profile: how much of each source survives
  // exact-fingerprint dedup — the first number a corpus report quotes.
  // One scan + one (source, fp) hash-agg; the distinct runs inside the
  // aggregate with map-side partials, never a separate shuffle.
  private val qDedupRate = QuerySpec.of(
    "q_dedup_rate_by_source",
    s"""SELECT source, count(*) AS n_docs,
      |  count(DISTINCT ${sql.fingerprint}) AS n_distinct,
      |  (floor((1.0 - CAST(count(DISTINCT ${sql.fingerprint}) AS DOUBLE)
      |    / count(*)) * 1e6 + 0.5) / 1e6) AS dup_rate
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) {
    (s, d) =>
    Tables.fanout(Tables.documents(s, d))
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"),
        (floor((lit(1.0) - countDistinct(col("fp")).cast("double")
          / count(lit(1))) * 1e6 + 0.5) / 1e6).as("dup_rate"))
      .orderBy("source")
  }

  // Inverted-index build: per-term posting-list statistics (document
  // frequency, total term frequency, first/last posting). The explode
  // fans out to |corpus tokens| rows, absorbed by map-side partial
  // aggregation before the single narrow (term) exchange — the same
  // shape an actual posting-list materialization would use, with
  // collect_list(doc_id) in place of the stats columns.
  private val qPostings = QuerySpec.of(
    "q_index_postings", {
      val toks = sql.toks
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
        |p AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
        |  GROUP BY doc_id, term)
        |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY term ORDER BY term""".stripMargin
    }) { (s, d) =>
    Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("term")
  }

  // ---- Bloom-filter contamination pre-screen -----------------------------
  // The scale path for cross-corpus membership: build an m-bit Bloom
  // filter over a held-out set's canonical fingerprints (here the
  // doc_id%17 pseudo benchmark split), probe every remaining document,
  // then confirm flagged candidates exactly — reporting true hits and
  // Bloom false positives separately. The bit set is ≤ m distinct
  // positions (m = 8192 → a few KB), so the probe is a broadcast join:
  // one corpus scan, no shuffle of document rows at any corpus size.
  // Hashing is Kirsch-Mitzenmacher-style seeded md5 (i:fingerprint),
  // identical in both engines, so the whole screen — including which
  // false positives fire — replays exactly in DuckDB. m is sized so the
  // FP path actually fires at the larger gate scales rather than
  // rounding to zero.
  private val BloomBits = 8192
  private val BloomHashes = 4

  private val qBloomScreen = QuerySpec.of(
    "q_bloom_screen", {
      val fp = sql.fingerprint
      def posSql(fpExpr: String) =
        s"CAST(('0x' || substr(md5(h.i || ':' || $fpExpr), 1, 8)) AS BIGINT) % $BloomBits"
      s"""WITH bench AS (
        |  SELECT DISTINCT $fp AS fp FROM documents WHERE doc_id % 17 = 0),
        |bits AS (
        |  SELECT DISTINCT ${posSql("fp")} AS pos
        |  FROM bench CROSS JOIN unnest([0, 1, 2, 3]) AS h(i)),
        |probe AS (
        |  SELECT doc_id, source, $fp AS fp
        |  FROM documents WHERE doc_id % 17 <> 0),
        |flagged AS (
        |  SELECT p.doc_id, p.source, p.fp
        |  FROM (SELECT pr.*, ${posSql("pr.fp")} AS pos
        |        FROM probe pr CROSS JOIN unnest([0, 1, 2, 3]) AS h(i)) p
        |  JOIN bits b ON p.pos = b.pos
        |  GROUP BY 1, 2, 3 HAVING count(*) = $BloomHashes),
        |conf AS (
        |  SELECT f.source, (b.fp IS NOT NULL) AS confirmed
        |  FROM flagged f LEFT JOIN bench b ON f.fp = b.fp)
        |SELECT source, count(*) AS n_flagged,
        |  CAST(sum(CASE WHEN confirmed THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_confirmed,
        |  CAST(sum(CASE WHEN confirmed THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_false_pos
        |FROM conf GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions.hash32
    val docs = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), col("source"),
        fingerprint(col("text")).as("fp"))
    val bench = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
      .select("fp").distinct()
    def pos(fpc: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column) =
      pmod(hash32(concat(i.cast("string"), lit(":"), fpc)), lit(BloomBits))
    val bits = bench
      .select(explode(sequence(lit(0), lit(BloomHashes - 1))).as("i"),
        col("fp"))
      .select(pos(col("fp"), col("i")).as("pos")).distinct()
    val flagged = docs.filter(pmod(col("doc_id"), lit(17)) =!= 0)
      .withColumn("i", explode(sequence(lit(0), lit(BloomHashes - 1))))
      .withColumn("pos", pos(col("fp"), col("i")))
      .join(broadcast(bits), "pos")
      .groupBy("doc_id", "source", "fp")
      .agg(count(lit(1)).as("nh"))
      .filter(col("nh") === BloomHashes)
    flagged
      .join(broadcast(bench.withColumn("confirmed", lit(true))),
        Seq("fp"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_flagged"),
        sum(when(col("confirmed"), 1).otherwise(0)).cast("long")
          .as("n_confirmed"),
        sum(when(col("confirmed"), 0).otherwise(1)).cast("long")
          .as("n_false_pos"))
      .orderBy("source")
  }

  // ---- BPE merge-pass pair statistics -------------------------------------
  // The first iteration of byte-pair-encoding vocabulary induction:
  // corpus-weighted adjacent symbol-pair frequencies. The scale trick
  // is the standard one — aggregate the corpus to its DISTINCT word
  // frequency table first (a few 100k rows no matter how many TB of
  // text), then explode each distinct word's character pairs exactly
  // once, weighted by its corpus frequency. Two hash-aggs with map-side
  // partials; the expensive per-character explode runs over the tiny
  // vocabulary, never the corpus.
  private val BpeTopK = 25

  private val qBpePairs = QuerySpec.of(
    "q_bpe_pairs", {
      val toks = sql.toks
      s"""WITH words AS (
        |  SELECT w AS word, count(*) AS freq
        |  FROM documents, unnest($toks) AS u(w)
        |  GROUP BY w),
        |pairs AS (
        |  SELECT substr(word, p.i, 2) AS pair,
        |    CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM words CROSS JOIN
        |    unnest(range(1, CAST(strlen(word) AS BIGINT))) AS p(i)
        |  WHERE strlen(word) >= 2
        |  GROUP BY 1)
        |SELECT pair, cnt FROM pairs
        |ORDER BY cnt DESC, pair LIMIT $BpeTopK""".stripMargin
    }) { (s, d) =>
    val words = Tables.fanout(Tables.documents(s, d))
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    words
      .filter(length(col("word")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(BpeTopK)
  }

  // ---- bigram-LM fluency scoring ------------------------------------------
  // The deterministic analog of perplexity-bucket quality filtering
  // (KenLM-style): train add-one-smoothed bigram transition
  // probabilities on the corpus itself, score each document by its
  // MEAN transition likelihood, and report per-source score
  // distributions. Log-free on purpose: ln() implementations differ
  // across engines, while p(b|a) = (c(a,b)+1)/(c(a·)+V) is a single
  // IEEE division of exact integers and the per-doc mean folds the
  // probabilities in position order — the same fixed-order-fold trick
  // the BM25 ranking uses — so scores hash-match bit-exactly. Scores
  // quantize to integer micro-units with explicit trunc(x*1e6 + 0.5)
  // (both engines' round() disagree on representability boundaries;
  // trunc does not).
  //
  // Scale shape — train once, score forever: the smoothed transition
  // table (a, b, c, cp, v) is a PERSISTED scaffold keyed by the
  // corpus fingerprint (|bigram types| rows, vocab²-bounded), so the
  // query path is ONE corpus scan joined (broadcast here; shuffle
  // equality join at larger vocabs) against the artifact — no
  // corpus-sized checkpoint anywhere. The per-doc fold is one
  // (doc_id) hash-agg. No global sorts, no cross-row float
  // accumulation anywhere.
  private def bigramLm(s: SparkSession, d: String): DataFrame =
    graft.Scaffold.table(s, "bigram-lm",
        graft.Scaffold.paramsKey(Tables.fingerprint(s, d, "documents"),
          "algo" -> "bigram-lm-v1", "smoothing" -> "add-one")) {
      val t = Tables.fanout(Tables.documents(s, d))
        .select(tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .localCheckpoint() // one-time build: bigram count + vocab scan
      val cnt = t
        .select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("a"),
            element_at(col("toks"), i + 1).as("b")))).as("x"))
        .groupBy("x.a", "x.b").agg(count(lit(1)).as("c"))
      val cp = cnt.groupBy("a").agg(sum("c").as("cp"))
      val v = t.select(explode(col("toks")).as("tok"))
        .agg(countDistinct("tok").as("v"))
      cnt.join(cp, "a").crossJoin(v)
    }

  private val qLmScore = QuerySpec.of(
    "q_text_lm_score", {
      val toks = sql.toks
      s"""WITH t AS (
        |  SELECT doc_id, source, $toks AS toks FROM documents),
        |pr AS (
        |  SELECT doc_id, source, u.i AS pos,
        |    toks[u.i] AS a, toks[u.i + 1] AS b
        |  FROM t, unnest(range(1, len(toks))) AS u(i)
        |  WHERE len(toks) >= 2),
        |cnt AS (SELECT a, b, count(*) AS c FROM pr GROUP BY a, b),
        |cp AS (SELECT a, CAST(sum(c) AS BIGINT) AS cp FROM cnt GROUP BY a),
        |v AS (
        |  SELECT count(DISTINCT tok) AS v
        |  FROM (SELECT unnest(toks) AS tok FROM t)),
        |sc AS (
        |  SELECT pr.doc_id, pr.source, pr.pos,
        |    CAST(cnt.c + 1 AS DOUBLE) / (cp.cp + v.v) AS p
        |  FROM pr JOIN cnt USING (a, b) JOIN cp USING (a) CROSS JOIN v),
        |d AS (
        |  SELECT doc_id, source,
        |    list_sum(list(p ORDER BY pos)) / count(*) AS score
        |  FROM sc GROUP BY doc_id, source),
        |m AS (
        |  SELECT source,
        |    CAST(trunc(score * 1000000 + 0.5) AS BIGINT) AS micro
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(micro) AS BIGINT) // count(*) AS avg_micro,
        |  min(micro) AS min_micro, max(micro) AS max_micro
        |FROM m GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    val lm = bigramLm(s, d)
    val pr = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(i.as("pos"),
            element_at(col("toks"), i).as("a"),
            element_at(col("toks"), i + 1).as("b")))).as("x"))
      .select(col("doc_id"), col("source"),
        col("x.pos"), col("x.a"), col("x.b"))
    val scored = pr
      .join(broadcast(lm), Seq("a", "b"))
      .withColumn("p",
        (col("c") + 1).cast("double")
          / (col("cp") + col("v")).cast("double"))
    scored.groupBy("doc_id", "source")
      .agg((aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("p")))),
            x => x.getField("p")),
          lit(0.0), (acc, x) => acc + x) / count(lit(1))).as("score"))
      .withColumn("micro",
        (col("score") * 1000000 + 0.5).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(micro) DIV count(*) AS BIGINT)").as("avg_micro"),
        min("micro").as("min_micro"), max("micro").as("max_micro"))
      .orderBy("source")
  }

  // ---- portable Count-Min frequency sketch -------------------------------
  // The frequency twin of the HLL cardinality sketch
  // (q_events_hll_users): d=4 seeded md5 row-hashes × w=256 counters,
  // estimate = min over rows — ALL integer arithmetic, so the sketch,
  // the probes, and the overestimate report are trivially bit-exact
  // across engines. Probed on the exact top-10 tokens; CM guarantees
  // est >= exact, and the overestimate (collision mass) is reported
  // in basis points. Shape: one (row, col) hash-agg of d·w = 1024
  // cells at any corpus size + a broadcast probe join.
  // w = 16 on a ~40-type vocabulary so collisions actually happen and
  // the min-over-rows recovery + overestimate report are exercised
  // (at w = 256 every probe came back exact and the CM guarantee was
  // untested); at corpus scale w grows with the heavy-hitter budget.
  private val CmD = 4
  private val CmW = 16
  private val CmTopK = 10

  private val qCmSketch = QuerySpec.of(
    "q_text_cm_tokens", {
      val toks = sql.toks
      // (row-expr, token-expr) → cell column; integer row exprs cast
      // to the same '0'..'3' text the Spark side concatenates
      def pos(rowE: String, tokE: String) = graft.functions.HashFunctions
        .sqlHash32(s"($rowE) || '#' || ($tokE)") + s" % $CmW"
      val rowSel = (0 until CmD).map(r =>
        s"SELECT $r AS row, ${pos(r.toString, "t")} AS col, t FROM tok")
        .mkString("\nUNION ALL\n")
      s"""WITH tok AS (
        |  SELECT unnest($toks) AS t FROM documents),
        |cells AS (
        |  SELECT row, col, count(*) AS c
        |  FROM ($rowSel) GROUP BY row, col),
        |exact AS (
        |  SELECT t, count(*) AS n FROM tok GROUP BY t
        |  ORDER BY n DESC, t LIMIT $CmTopK),
        |probe AS (
        |  SELECT e.t, e.n, min(cells.c) AS est
        |  FROM exact e, (SELECT unnest(range(0, $CmD)) AS row) r
        |  JOIN cells ON cells.row = r.row
        |   AND cells.col = ${pos("r.row", "e.t")}
        |  GROUP BY e.t, e.n)
        |SELECT t AS token, CAST(n AS BIGINT) AS n_exact,
        |  CAST(est AS BIGINT) AS n_est,
        |  (est - n) * 10000 // n AS over_bp
        |FROM probe ORDER BY n_exact DESC, token""".stripMargin
    }) { (s, d) =>
    import graft.functions.HashFunctions.hash32
    val tok = Tables.fanout(Tables.documents(s, d))
      .select(explode(tokens(col("text"))).as("t"))
      .localCheckpoint() // sketch build + exact top-k read it
    def pos(row: org.apache.spark.sql.Column) =
      pmod(hash32(concat(row.cast("string"), lit("#"), col("t"))),
        lit(CmW))
    val cells = tok
      .select(explode(sequence(lit(0), lit(CmD - 1))).as("row"), col("t"))
      .select(col("row"), pos(col("row")).as("col"))
      .groupBy("row", "col").agg(count(lit(1)).as("c"))
    val exact = tok.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t")).limit(CmTopK)
    val probes = broadcast(exact
      .withColumn("row", explode(sequence(lit(0), lit(CmD - 1))))
      .withColumn("col", pos(col("row"))))
    cells.join(probes, Seq("row", "col"))
      .groupBy("t", "n")
      .agg(min("c").as("est"))
      .select(col("t").as("token"), col("n").cast("long").as("n_exact"),
        col("est").cast("long").as("n_est"),
        expr("CAST((est - n) * 10000 DIV n AS BIGINT)").as("over_bp"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  // ---- per-source distinctive terms (tf-idf-shaped, all-integer) ---------
  // For each source, the 5 terms whose corpus occurrences concentrate
  // most heavily in that source: share_bp = this source's share of the
  // term's total occurrences (the un-logged idf analog — log() is not
  // engine-stable), score = tf × share_bp. Every quantity is an exact
  // integer, so ranking and ties (broken on the term) hash-match.
  // Shape: explode → (source, term) partial agg (map-side combine),
  // term totals keyed the same way (one exchange), and the top-k
  // window partitions by source over the already-aggregated rows —
  // no global sort, no corpus-sized window.
  private val TfidfTopK = 5

  private val qTfidf = QuerySpec.of(
    "q_text_tfidf", {
      val toks = sql.toks
      s"""WITH tok AS (
        |  SELECT source, unnest($toks) AS term FROM documents),
        |st AS (
        |  SELECT source, term, count(*) AS tf
        |  FROM tok GROUP BY source, term),
        |tt AS (
        |  SELECT term, CAST(sum(tf) AS BIGINT) AS tf_all
        |  FROM st GROUP BY term),
        |sc AS (
        |  SELECT st.source, st.term, st.tf, tt.tf_all,
        |    st.tf * 10000 // tt.tf_all AS share_bp,
        |    st.tf * (st.tf * 10000 // tt.tf_all) AS score
        |  FROM st JOIN tt USING (term)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY score DESC, term) AS rn FROM sc)
        |SELECT source, CAST(rn AS BIGINT) AS rank, term,
        |  CAST(tf AS BIGINT) AS tf, tf_all,
        |  CAST(share_bp AS BIGINT) AS share_bp,
        |  CAST(score AS BIGINT) AS score
        |FROM r WHERE rn <= $TfidfTopK ORDER BY source, rank""".stripMargin
    }) { (s, d) =>
    val st = Tables.fanout(Tables.documents(s, d))
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // vocab-sized; term totals + the ranked join
                         // both read it — one corpus explode, not two
    val tt = st.groupBy("term").agg(sum("tf").as("tf_all"))
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("term"))
    st.join(tt, "term")
      .withColumn("share_bp", expr("CAST(tf * 10000 DIV tf_all AS BIGINT)"))
      .withColumn("score", col("tf") * col("share_bp"))
      .withColumn("rn", row_number().over(byScore))
      .filter(col("rn") <= TfidfTopK)
      .select(col("source"), col("rn").cast("long").as("rank"), col("term"),
        col("tf"), col("tf_all"), col("share_bp"),
        col("score").cast("long").as("score"))
      .orderBy("source", "rank")
  }

  // ---- iterative BPE merge training ---------------------------------------
  // The actual tokenizer-training loop, not just the first pair count
  // (q_bpe_pairs): 3 rounds of count-pairs → take the top pair →
  // merge it through the vocabulary → recount. Vocabulary words are
  // space-joined symbol strings; merge application is defined as 4
  // bounded left-to-right replace passes of ' a b '→' ab ' (both
  // engines' replace() is the same non-overlapping scan, and the
  // bounded pass count makes chained occurrences deterministic
  // rather than engine-lucky). Reported per round: the merged pair,
  // its count at merge time, and the total symbol mass after — the
  // curve a tokenizer trainer monitors.
  // Scale shape — the exact shape HF-style trainers use: ONE corpus
  // exchange builds the (word, freq) vocabulary; every round after
  // that is vocabulary-sized (pair explode + top-1 TakeOrdered,
  // map-side replace), and driver state is one pair per round.
  private val BpeRounds = 3

  private val qBpeMerges = QuerySpec.of(
    "q_bpe_merges", {
      val toks = sql.toks
      def roundCte(r: Int): String = {
        val prev = s"w${r - 1}"
        val rep = (1 to 4).foldLeft("s")((e, _) =>
          s"replace($e, ' ' || (SELECT pair FROM t$r) || ' ', " +
            s"' ' || replace((SELECT pair FROM t$r), ' ', '') || ' ')")
        s"""p$r AS (
          |  SELECT syms[i] || ' ' || syms[i+1] AS pair,
          |    CAST(sum(freq) AS BIGINT) AS cnt
          |  FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '')
          |      AS syms, freq FROM $prev),
          |    unnest(range(1, len(syms))) AS u(i)
          |  GROUP BY 1),
          |t$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
          |w$r AS (SELECT $rep AS s, freq FROM $prev)""".stripMargin
      }
      val selects = (1 to BpeRounds).map(r =>
        s"""SELECT CAST($r AS BIGINT) AS rank, (SELECT pair FROM t$r) AS pair,
          |  (SELECT cnt FROM t$r) AS cnt,
          |  (SELECT CAST(sum(freq * len(list_filter(string_split(s, ' '),
          |    x -> x <> ''))) AS BIGINT) FROM w$r) AS symbols_after"""
          .stripMargin).mkString("\nUNION ALL\n")
      s"""WITH words AS (
        |  SELECT w AS word, count(*) AS freq
        |  FROM documents, unnest($toks) AS u(w) GROUP BY w),
        |w0 AS (
        |  SELECT ' ' || array_to_string(string_split(word, ''), ' ')
        |    || ' ' AS s, freq FROM words),
        |${(1 to BpeRounds).map(roundCte).mkString(",\n")}
        |$selects
        |ORDER BY rank""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    bpeTrain(s, d)._2
      .toDF("rank", "pair", "cnt", "symbols_after").orderBy("rank")
  }

  /** Runs the [[qBpeMerges]] training loop, carrying the source `word`
    * through every round: returns the final per-word symbol string
    * (the ENCODING of each vocabulary word under the learned merges)
    * plus the per-round (rank, pair, cnt, symbols_after) trace.
    */
  private def bpeTrain(s: SparkSession, d: String)
      : (DataFrame, Seq[(Long, String, Long, Long)]) = {
    var words = Tables.fanout(Tables.documents(s, d))
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word"), concat(lit(" "),
        concat_ws(" ", array_remove(split(col("word"), ""), "")),
        lit(" ")).as("s"), col("freq"))
      .localCheckpoint() // each round's recount reads the current vocab
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
    for (r <- 1 to BpeRounds) {
      val syms = array_remove(split(col("s"), " "), "")
      // size>=2 guard: Spark's sequence(1, 0) DESCENDS instead of
      // being empty (the oracle's range(1, 1) is empty)
      val top = words.withColumn("syms", syms)
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => concat(element_at(col("syms"), i), lit(" "),
              element_at(col("syms"), i + 1)))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect().head
      val (pair, cnt) = (top.getString(0), top.getLong(1))
      // pairs are alphanumeric+space by construction — safe to inline
      val merged = pair.replace(" ", "")
      val rep = (1 to 4).foldLeft("s")((e, _) =>
        s"replace($e, ' $pair ', ' $merged ')")
      words = words.select(col("word"), expr(rep).as("s"), col("freq"))
        .localCheckpoint() // next round + the mass count read it
      val symbolsAfter = words
        .agg(sum(col("freq") * size(array_remove(split(col("s"), " "), ""))))
        .collect().head.getLong(0)
      out += ((r.toLong, pair, cnt, symbolsAfter))
    }
    (words, out.toSeq)
  }

  // ---- lexical diversity (Simpson concentration, all-integer) -------------
  // Per-source vocabulary concentration without entropy's ln() (not
  // engine-stable): Simpson's index Σp² as Σc²·10⁴ DIV n² (exact —
  // the probability a random token pair repeats), its inverse (the
  // "effective vocabulary" size), and the top token's share. The
  // diversity signal repetitive/templated sources fail.
  // Shape: one (source, token) partial agg, then a |sources| rollup;
  // the top-token pick is a window over already-aggregated rows.
  private val qDiversity = QuerySpec.of(
    "q_text_diversity", {
      val toks = sql.toks
      s"""WITH tok AS (
        |  SELECT source, unnest($toks) AS t FROM documents),
        |c AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY c DESC, t) AS rk FROM c)
        |SELECT source,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(sum(c * c) * 10000 // (sum(c) * sum(c)) AS BIGINT)
        |    AS simpson_bp,
        |  CAST(sum(c) * sum(c) // sum(c * c) AS BIGINT) AS inv_simpson,
        |  max(CASE WHEN rk = 1 THEN t END) AS top_token,
        |  CAST(max(CASE WHEN rk = 1 THEN c END) * 10000 // sum(c)
        |    AS BIGINT) AS top_share_bp
        |FROM r GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    val c = Tables.fanout(Tables.documents(s, d))
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("c").desc, col("t"))
    c.withColumn("rk", row_number().over(w))
      .groupBy("source")
      .agg(sum("c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        expr("CAST(sum(c * c) * 10000 DIV (sum(c) * sum(c)) AS BIGINT)")
          .as("simpson_bp"),
        expr("CAST(sum(c) * sum(c) DIV sum(c * c) AS BIGINT)")
          .as("inv_simpson"),
        max(when(col("rk") === 1, col("t"))).as("top_token"),
        expr("CAST(max(CASE WHEN rk = 1 THEN c END) * 10000 DIV sum(c)" +
          " AS BIGINT)").as("top_share_bp"))
      .orderBy("source")
  }

  // ---- split balance audit -------------------------------------------------
  // Is each split's language mix representative of the corpus? For
  // every (split, lang): the split-internal share and its signed
  // deviation from the lang's corpus-wide share, in exact basis
  // points — the stratification check run before trusting a held-out
  // set. Shape: two tiny rollups ((split, lang) and lang) and
  // broadcast joins back; the split is the same pure doc_id hash as
  // q_split_hash, so it audits exactly the split users get.
  private val qSplitBalance = QuerySpec.of(
    "q_split_balance", {
      val bk = graft.functions.HashFunctions.sqlHash32("doc_id")
      s"""WITH b AS (
        |  SELECT lang, CASE WHEN ($bk) % 100 < 80 THEN 'train'
        |    WHEN ($bk) % 100 < 90 THEN 'validation' ELSE 'test' END
        |    AS split
        |  FROM documents),
        |sl AS (SELECT split, lang, count(*) AS n FROM b GROUP BY split, lang),
        |st AS (SELECT split, CAST(sum(n) AS BIGINT) AS sn FROM sl GROUP BY split),
        |lt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS ln FROM sl GROUP BY lang),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM b)
        |SELECT sl.split, sl.lang, sl.n,
        |  CAST(sl.n * 10000 // st.sn AS BIGINT) AS split_share_bp,
        |  CAST(lt.ln * 10000 // tot.t AS BIGINT) AS corpus_share_bp,
        |  CAST(sl.n * 10000 // st.sn
        |    - lt.ln * 10000 // tot.t AS BIGINT) AS skew_bp
        |FROM sl JOIN st USING (split) JOIN lt USING (lang), tot
        |ORDER BY split, lang""".stripMargin
    }) { (s, d) =>
    val bk = pmod(graft.functions.HashFunctions.hash32(col("doc_id")),
      lit(100))
    val b = Tables.documents(s, d)
      .select(col("lang"),
        when(bk < 80, "train").when(bk < 90, "validation")
          .otherwise("test").as("split"))
    val sl = b.groupBy("split", "lang").agg(count(lit(1)).as("n"))
      .localCheckpoint() // split totals + lang totals + output read it
    val st = sl.groupBy("split").agg(sum("n").as("sn"))
    val lt = sl.groupBy("lang").agg(sum("n").as("ln"))
    val tot = sl.agg(sum("n").as("t"))
    sl.join(broadcast(st), "split").join(broadcast(lt), "lang")
      .crossJoin(broadcast(tot))
      .select(col("split"), col("lang"), col("n"),
        expr("CAST(n * 10000 DIV sn AS BIGINT)").as("split_share_bp"),
        expr("CAST(ln * 10000 DIV t AS BIGINT)").as("corpus_share_bp"),
        expr("CAST(n * 10000 DIV sn - ln * 10000 DIV t AS BIGINT)")
          .as("skew_bp"))
      .orderBy("split", "lang")
  }

  // ---- text normalization -------------------------------------------------
  // Unicode-light cleanup pass every ingest pipeline runs before
  // hashing/dedup: lowercase, collapse all whitespace runs (spaces,
  // tabs, newlines) to a single space, trim. The shipped corpus is
  // already normalized, so — like q_text_pii — the query renders a
  // deterministically MESSY variant from each document (doc_id mod 4
  // selects uppercasing, doubled spaces, pad-with-blanks, or
  // tab-for-space substitution), normalizes it back, and proves the
  // round trip: every normalized string must equal the original text,
  // and the per-source corpus md5 over the doc-ordered normalized
  // output pins every character. Single scan, one partial-agg
  // exchange on source; the normalize expression itself is
  // whole-stage-codegen'd (lower/regexp_replace/trim builtins).
  private val qNormalize = QuerySpec.of(
    "q_text_normalize",
    """WITH raw AS (
      |  SELECT doc_id, source, text,
      |    CASE CAST(doc_id % 4 AS INTEGER)
      |      WHEN 0 THEN upper(text)
      |      WHEN 1 THEN replace(text, ' ', '  ')
      |      WHEN 2 THEN '  ' || text || '  '
      |      ELSE replace(text, ' ', chr(9)) END AS messy
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, source, text, messy,
      |    trim(regexp_replace(lower(messy), '\s+', ' ', 'g')) AS norm
      |  FROM raw)
      |SELECT source, count(*) AS n_docs,
      |  count(*) FILTER (messy <> norm) AS n_changed,
      |  count(*) FILTER (norm = text) AS n_restored,
      |  CAST(sum(len(messy)) AS BIGINT) AS chars_before,
      |  CAST(sum(len(norm)) AS BIGINT) AS chars_after,
      |  md5(string_agg(norm, '|' ORDER BY doc_id)) AS corpus_md5
      |FROM n GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val messy = when(pmod(col("doc_id"), lit(4)) === 0, upper(col("text")))
      .when(pmod(col("doc_id"), lit(4)) === 1,
        regexp_replace(col("text"), " ", "  "))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(lit("  "), col("text"), lit("  ")))
      .otherwise(regexp_replace(col("text"), " ", "\t"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"), messy.as("messy"))
      .withColumn("norm",
        trim(regexp_replace(lower(col("messy")), "\\s+", " ")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("messy") =!= col("norm"), 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("norm") === col("text"), 1L).otherwise(0L))
          .as("n_restored"),
        sum(length(col("messy"))).cast("bigint").as("chars_before"),
        sum(length(col("norm"))).cast("bigint").as("chars_after"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("norm")))),
          x => x.getField("norm")), "|")).as("corpus_md5"))
      .orderBy("source")
  }

  // ---- BPE encode-apply ---------------------------------------------------
  // The other half of q_bpe_merges: ENCODE the corpus with the learned
  // merge table. Training already produces each vocabulary word's
  // final symbol decomposition (the merges applied in rank order,
  // same 4-pass boundary-space replace rule both engines share), so
  // encoding is a broadcast word→symbol-count join against the
  // document token stream — exactly how a trained tokenizer deploys:
  // the merge table is tiny and ships to every executor; the corpus
  // scan never shuffles. Output is per-source token/char/symbol mass
  // and the integer-bp compression the merges bought.
  private val qBpeEncode = QuerySpec.of(
    "q_bpe_encode", {
      val toks = sql.toks
      def roundCte(r: Int): String = {
        val prev = s"w${r - 1}"
        val rep = (1 to 4).foldLeft("s")((e, _) =>
          s"replace($e, ' ' || (SELECT pair FROM t$r) || ' ', " +
            s"' ' || replace((SELECT pair FROM t$r), ' ', '') || ' ')")
        s"""p$r AS (
          |  SELECT syms[i] || ' ' || syms[i+1] AS pair,
          |    CAST(sum(freq) AS BIGINT) AS cnt
          |  FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '')
          |      AS syms, freq FROM $prev),
          |    unnest(range(1, len(syms))) AS u(i)
          |  GROUP BY 1),
          |t$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
          |w$r AS (SELECT word, $rep AS s, freq FROM $prev)""".stripMargin
      }
      s"""WITH words AS (
        |  SELECT w AS word, count(*) AS freq
        |  FROM documents, unnest($toks) AS u(w) GROUP BY w),
        |w0 AS (
        |  SELECT word, ' ' || array_to_string(string_split(word, ''), ' ')
        |    || ' ' AS s, freq FROM words),
        |${(1 to BpeRounds).map(roundCte).mkString(",\n")},
        |venc AS (
        |  SELECT word, CAST(len(list_filter(string_split(s, ' '),
        |    x -> x <> '')) AS BIGINT) AS nsym FROM w$BpeRounds),
        |dw AS (SELECT source, u.w AS word FROM documents,
        |       unnest($toks) AS u(w))
        |SELECT source, count(*) AS n_words,
        |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
        |  CAST(sum(nsym) AS BIGINT) AS n_symbols,
        |  CAST(sum(nsym) * 10000 // sum(len(word)) AS BIGINT)
        |    AS compression_bp
        |FROM dw JOIN venc USING (word)
        |GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
    val venc = bpeTrain(s, d)._1
      .select(col("word"),
        size(array_remove(split(col("s"), " "), "")).cast("long").as("nsym"))
    Tables.fanout(Tables.documents(s, d))
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .join(broadcast(venc), "word")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("bigint").as("n_chars"),
        sum("nsym").as("n_symbols"),
        expr("CAST(sum(nsym) * 10000 DIV sum(length(word)) AS BIGINT)")
          .as("compression_bp"))
      .orderBy("source")
  }

  // ---- greedy bigram decode -----------------------------------------------
  // Deterministic text generation from the corpus bigram model: start
  // at the most frequent token (ties → smallest) and take GenSteps
  // greedy argmax steps over the bigram transition counts (ties →
  // smallest successor). The per-token argmax successor table is one
  // window pass over the transition counts; the walk itself joins a
  // 1-row frontier GenSteps times — the corpus pays one scan, the
  // decode costs nothing at any scale. DuckDB replays the walk as a
  // RECURSIVE CTE over the same argmax table. Repetition is expected
  // (greedy decoding loops); the point is both engines loop
  // IDENTICALLY.
  private val GenSteps = 12

  private val qGenerate = QuerySpec.of(
    "q_text_generate", {
      val toks = sql.toks
      val grams = graft.functions.TextFunctions.sql.shingles("toks", 2)
      s"""WITH RECURSIVE t AS (
        |  SELECT $toks AS toks FROM documents),
        |u AS (SELECT unnest(toks) AS tok FROM t),
        |uf AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
        |start AS (SELECT tok FROM uf ORDER BY c DESC, tok LIMIT 1),
        |bg AS (
        |  SELECT string_split(g, ' ')[1] AS prev,
        |    string_split(g, ' ')[2] AS next, count(*) AS c
        |  FROM (SELECT unnest($grams) AS g FROM t)
        |  GROUP BY 1, 2),
        |nx AS (
        |  SELECT prev, next FROM (
        |    SELECT *, row_number() OVER (PARTITION BY prev
        |      ORDER BY c DESC, next) AS rk FROM bg)
        |  WHERE rk = 1),
        |walk AS (
        |  SELECT CAST(0 AS BIGINT) AS step, tok FROM start
        |  UNION ALL
        |  SELECT w.step + 1, nx.next
        |  FROM walk w JOIN nx ON nx.prev = w.tok
        |  WHERE w.step < $GenSteps)
        |SELECT step, tok FROM walk ORDER BY step""".stripMargin
    }) { (s, d) =>
    val t = Tables.fanout(Tables.documents(s, d))
      .select(tokens(col("text")).as("toks"))
      .localCheckpoint() // unigram + bigram passes read it
    val start = t.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(1)
      .select(lit(0L).as("step"), col("tok"))
    val bg = t.select(explode(shingles(col("toks"), 2)).as("g"))
      .select(split(col("g"), " ").getItem(0).as("prev"),
        split(col("g"), " ").getItem(1).as("next"))
      .groupBy("prev", "next").agg(count(lit(1)).as("c"))
    val nx = bg
      .withColumn("rk", row_number().over(
        Window.partitionBy("prev").orderBy(col("c").desc, col("next"))))
      .filter(col("rk") === 1)
      .select("prev", "next")
      .localCheckpoint() // read every walk step
    var out = start
    var frontier = start
    for (i <- 1 to GenSteps) {
      frontier = frontier
        .join(nx, frontier("tok") === nx("prev"))
        .select(lit(i.toLong).as("step"), col("next").as("tok"))
      out = out.unionByName(frontier)
    }
    out.orderBy("step")
  }

  // ---- RAKE keyphrase extraction -----------------------------------------
  // Rapid Automatic Keyword Extraction: candidate phrases are maximal
  // stopword-free token runs (capped at 6 tokens — the skew guard for
  // a pathological stopword-free document); each word scores
  // degree/freq where freq counts its occurrences in candidates and
  // degree sums the lengths of the phrases it occurs in; a phrase
  // scores the sum of its word scores. Word scores are integer
  // micro-units (degree·10⁶ DIV freq), so the ranking is hash-exact.
  // Shape: one doc_id-partitioned window segments phrases, then two
  // word-keyed partial aggs — corpus-linear, no joins wider than the
  // word vocabulary.
  private val RakeStops = Seq("the", "a", "an", "and", "of", "to", "in",
    "is", "it", "that")
  private val RakeMaxLen = 6
  private val RakeK = 20

  private val qKeyphrases = QuerySpec.of(
    "q_text_keyphrases", {
      val stops = RakeStops.map(w => s"'$w'").mkString("(", ",", ")")
      s"""WITH t AS (SELECT doc_id, ${sql.toks} AS toks FROM documents),
        |tp AS (
        |  SELECT doc_id, u.i AS pos, toks[u.i + 1] AS tok
        |  FROM t, unnest(range(0, len(toks))) AS u(i)),
        |m AS (
        |  SELECT *, CASE WHEN tok IN $stops THEN 1 ELSE 0 END AS is_stop
        |  FROM tp),
        |g AS (
        |  SELECT *, sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS grp FROM m),
        |ph AS (
        |  SELECT doc_id, grp, string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    CAST(count(*) AS BIGINT) AS plen
        |  FROM g WHERE is_stop = 0 GROUP BY doc_id, grp
        |  HAVING count(*) <= $RakeMaxLen),
        |pw AS (
        |  SELECT doc_id, grp, phrase, plen,
        |    unnest(string_split(phrase, ' ')) AS w FROM ph),
        |ws AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(plen) AS BIGINT) AS degree FROM pw GROUP BY w),
        |sc AS (SELECT w, degree * 1000000 // freq AS score_e6 FROM ws),
        |ps AS (
        |  SELECT doc_id, grp, phrase,
        |    CAST(sum(score_e6) AS BIGINT) AS score_e6
        |  FROM pw JOIN sc USING (w) GROUP BY doc_id, grp, phrase)
        |SELECT phrase, count(*) AS n_occ, max(score_e6) AS score_e6
        |FROM ps GROUP BY phrase
        |ORDER BY score_e6 DESC, phrase
        |LIMIT $RakeK""".stripMargin
    }) { (s, d) =>
    val tp = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), posexplode(tokens(col("text")))
        .as(Seq("pos", "tok")))
      .withColumn("is_stop",
        when(col("tok").isInCollection(RakeStops), 1).otherwise(0))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ph = tp
      .withColumn("grp", sum("is_stop").over(byDoc))
      .filter(col("is_stop") === 0)
      .groupBy("doc_id", "grp")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen") <= RakeMaxLen)
    val pw = ph.select(col("doc_id"), col("grp"), col("phrase"), col("plen"),
        explode(split(col("phrase"), " ")).as("w"))
      .localCheckpoint() // word stats + phrase scoring both read it
    val sc = pw.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("degree"))
      .select(col("w"),
        expr("degree * 1000000 DIV freq").as("score_e6"))
    pw.join(sc, "w")
      .groupBy("doc_id", "grp", "phrase")
      .agg(sum("score_e6").as("score_e6"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), max("score_e6").as("score_e6"))
      .orderBy(col("score_e6").desc, col("phrase"))
      .limit(RakeK)
  }

  val specs: Seq[QuerySpec] = Seq(qTokenStats, qQuality, qLangId,
    qFingerprint, qSplit, qTopNgrams, qContamination, qDedupRate,
    qPostings, qBloomScreen, qBpePairs, qLmScore, qCmSketch, qTfidf,
    qBpeMerges, qDiversity, qSplitBalance, qNormalize, qKeyphrases,
    qBpeEncode, qGenerate)
}
