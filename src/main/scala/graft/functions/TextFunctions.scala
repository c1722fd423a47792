package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline operators:
  * tokenization, token counting (whitespace + BPE-ish regex), quality
  * scoring, language-ID heuristics, shingling, fingerprinting.
  *
  * Everything is built from `org.apache.spark.sql.functions` column
  * expressions (codegen'd, no UDFs) and has an exact DuckDB-SQL twin
  * (see the oracle strings in [[graft.operators.TextAnalysis]]) — the
  * regexes are restricted to syntax shared by Java regex and RE2.
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens; empty strings dropped.
    * `array_remove` instead of a `filter` lambda: identical values on
    * split output (which never contains nulls), but array_remove is a
    * codegen'd builtin while filter is an interpreted higher-order
    * function — this keeps the whole tokenize inside the surrounding
    * WholeStageCodegen span.
    */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), "[^a-z0-9]+"), "")

  /** Whitespace token count (codegen'd; see [[tokens]]). */
  def wsTokenCount(text: Column): Column =
    size(array_remove(split(text, "\\s+"), ""))

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation/symbol chars (non-alnum, non-space) to length. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") / n)
  }

  /** Ratio of digit chars to length. */
  def digitRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / n)
  }

  /** All six per-document token counters in ONE single-pass kernel
    * ([[TokenStatsExpr]]) — struct(n_chars, ws_tokens, bpe_tokens,
    * punct, alnum_chars, alnum_runs). Replaces four independent
    * regex/array passes where a query consumes several counters of
    * the same text (q_text_token_stats); the per-counter helpers
    * below stay for single-counter callers.
    */
  def tokenStats(text: Column): Column = TokenStatsExpr.tokenStats(text)

  /** English stopword sample used for quality scoring / language ID. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Count of tokens contained in a fixed vocabulary (with
    * multiplicity). Native one-pass kernel ([[VocabHitsExpr]]); the
    * former size/filter/isin form was an interpreted higher-order
    * function walking an In-list per token.
    */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    VocabHitsExpr.vocabHits(toks, vocab)

  /** Stopword ratio over token count (0 when no tokens). */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) === 0, 0.0)
      .otherwise(vocabHits(toks, enStopwords).cast("double") / size(toks))

  /** Mean token length (0 when no tokens). Sum-of-lengths computed as
    * `length(concat_ws("", toks))` — integer-exact and equal to the
    * former per-element fold, but ConcatWs is a codegen'd builtin
    * while the aggregate lambda was interpreted.
    */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) === 0, 0.0).otherwise(
      length(concat_ws("", toks)).cast("double") / size(toks))

  /** Composite document quality score in [0,1] — length, stopword
    * density, punctuation/digit noise. Same shape as the reference-class
    * heuristics (length/punct/stopword ratios); exact formula is ours
    * and is mirrored verbatim in the oracle SQL.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(lit(1.0), size(toks).cast("double") / 50.0)
    val stopScore = least(lit(1.0), stopwordRatio(toks) * 4.0)
    val noise = least(lit(1.0), (punctRatio(text) + digitRatio(text)) * 5.0)
    (floor((lenScore * 0.4 + stopScore * 0.4 + (lit(1.0) - noise) * 0.2)
      * 1e6 + 0.5) / 1e6)
  }

  /** Word-n-gram shingles as space-joined strings ("w1 w2 w3").
    * Native one-pass kernel ([[ShinglesExpr]]); the former
    * transform/slice/concat_ws form paid an interpreted slice
    * allocation per window.
    */
  def shingles(toks: Column, n: Int): Column =
    ShinglesExpr.shingles(toks, n)

  /** Canonical fingerprint (the classic dedup "fingerprint method"):
    * md5 over the sorted distinct token set.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** MinHash signature: for seeds 0..k-1, min over shingles of the
    * seeded portable hash. Native one-pass kernel ([[MinHashSigExpr]]);
    * the former doubly-nested transform/array_min form made k
    * interpreted passes and walked an md5/conv/substring expression
    * tree for every (seed, shingle).
    */
  def minhashSignature(sh: Column, k: Int): Column =
    MinHashSigExpr.minhashSig(sh, k)

  /** 32-bit SimHash over the token multiset (±1 per bit, majority). */
  def simhash32(toks: Column): Column =
    simhash32FromHashes(transform(toks, t => HashFunctions.hash32(t)))

  /** SimHash from a pre-computed token-hash array — use with the hash
    * array materialized (e.g. behind an exchange) so the bit votes
    * don't re-evaluate the hashing. Native one-pass kernel
    * ([[SimHash32Expr]]); the former doubly-interpreted
    * aggregate-within-aggregate paid O(32·n) lambda evaluations per
    * document.
    */
  def simhash32FromHashes(hashes: Column): Column =
    SimHash32Expr.simhash32(hashes)

  /** DuckDB twins for oracle SQL composition. */
  object sql {
    val toks =
      "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    def vocabIn(vocab: Seq[String]): String =
      vocab.map(w => s"'$w'").mkString("(", ",", ")")
    def shingles(toksExpr: String, n: Int): String =
      s"CASE WHEN len($toksExpr) < $n THEN [] ELSE " +
        s"list_transform(range(0, len($toksExpr) - ${n - 1}), " +
        s"i -> array_to_string(list_slice($toksExpr, i + 1, i + $n), ' ')) END"
    val fingerprint =
      s"md5(array_to_string(list_sort(list_distinct($toks)), ' '))"
    /** Self-contained DuckDB twin of [[qualityScore]] over `text`. */
    val quality: String =
      s"(floor((least(1.0, CAST(len($toks) AS DOUBLE) / 50.0) * 0.4" +
        s" + least(1.0, (CASE WHEN len($toks) = 0 THEN 0.0 ELSE" +
        s" CAST(len(list_filter($toks, t -> t IN" +
        " ('the','a','an','and','of','to','in','is','it','that')))" +
        s" AS DOUBLE) / len($toks) END) * 4.0) * 0.4" +
        " + (1.0 - least(1.0, ((CASE WHEN length(text) = 0 THEN 0.0 ELSE" +
        " CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g'))" +
        " AS DOUBLE) / length(text) END)" +
        " + (CASE WHEN length(text) = 0 THEN 0.0 ELSE" +
        " CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))" +
        " AS DOUBLE) / length(text) END)) * 5.0)) * 0.2) * 1e6 + 0.5) / 1e6)"
  }
}
