package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The fused single-pass token-stats kernel (TokenStatsExpr) must be
  * value-identical to the four independent column forms it replaced
  * in q_text_token_stats — including the regex edge semantics
  * (leading/trailing whitespace empties, consecutive punctuation as
  * individual BPE matches, letter/digit run boundaries) and the
  * non-ASCII path's String-based lower() mirroring.
  */
class TokenStatsSpec extends SparkSpec {

  private val cases = Seq(
    "",
    " ",
    " \t\n\f\r ",
    "hello world",
    "  leading and trailing  ",
    "Hello, World! 42 times...",
    "a1b2c3",
    "ab12cd ef34",
    "!!!???",
    "one",
    "UPPER lower MiXeD",
    "tabs\tand\nnewlines\rhere",
    "digits 007 then 2024-08-18T00:00:00Z",
    "unicode: café naïve Über straße",
    "世界 hello 世界",
    "emoji 😀 mix 123",
    "punct-inside-words and_under scores",
    "a  b   c    d",
    "123 456 789",
    "ÉÈÊ accents UPPER À")

  test("fused kernel equals the replaced per-stat column forms") {
    import spark.implicits._
    val df = cases.toDF("text")
      .withColumn("ts", TextFunctions.tokenStats(col("text")))
      .select(
        col("text"),
        col("ts.n_chars").as("k_n"),
        col("ts.ws_tokens").as("k_ws"),
        col("ts.bpe_tokens").as("k_bpe"),
        col("ts.punct").as("k_punct"),
        col("ts.alnum_chars").as("k_alc"),
        col("ts.alnum_runs").as("k_alr"),
        length(col("text")).as("o_n"),
        TextFunctions.wsTokenCount(col("text")).as("o_ws"),
        TextFunctions.bpeTokenCount(col("text")).as("o_bpe"),
        length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", ""))
          .as("o_punct"),
        length(concat_ws("", TextFunctions.tokens(col("text"))))
          .as("o_alc"),
        size(TextFunctions.tokens(col("text"))).as("o_alr"))
    df.collect().foreach { r =>
      val t = r.getString(0)
      assert(r.getInt(1) == r.getInt(7), s"n_chars mismatch on '$t'")
      assert(r.getInt(2) == r.getInt(8), s"ws_tokens mismatch on '$t'")
      assert(r.getInt(3) == r.getInt(9), s"bpe_tokens mismatch on '$t'")
      assert(r.getInt(4) == r.getInt(10), s"punct mismatch on '$t'")
      assert(r.getInt(5) == r.getInt(11), s"alnum_chars mismatch on '$t'")
      assert(r.getInt(6) == r.getInt(12), s"alnum_runs mismatch on '$t'")
    }
  }

  test("derived ratios match the replaced punctRatio/meanTokenLen") {
    import spark.implicits._
    val df = cases.toDF("text")
      .withColumn("ts", TextFunctions.tokenStats(col("text")))
      .select(
        col("text"),
        (floor(when(col("ts.n_chars") === 0, 0.0)
          .otherwise(col("ts.punct").cast("double") / col("ts.n_chars"))
          * 1e6 + 0.5) / 1e6).as("k_pr"),
        (floor(when(col("ts.alnum_runs") === 0, 0.0)
          .otherwise(col("ts.alnum_chars").cast("double")
            / col("ts.alnum_runs")) * 1e6 + 0.5) / 1e6).as("k_mtl"),
        (floor((TextFunctions.punctRatio(col("text"))) * 1e6 + 0.5) / 1e6)
          .as("o_pr"),
        (floor((TextFunctions.meanTokenLen(
          TextFunctions.tokens(col("text")))) * 1e6 + 0.5) / 1e6)
          .as("o_mtl"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) == r.getDouble(3),
        s"punct_ratio mismatch on '${r.getString(0)}'")
      assert(r.getDouble(2) == r.getDouble(4),
        s"mean_token_len mismatch on '${r.getString(0)}'")
    }
  }

  test("null text propagates null like the replaced forms") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x"))
      .toDF("text")
      .withColumn("ts", TextFunctions.tokenStats(col("text")))
    val rows = df.select(col("ts")).collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(!_.isNullAt(0)))
  }
}
