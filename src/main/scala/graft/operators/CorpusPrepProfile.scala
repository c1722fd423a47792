package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.Tables

/** Dev-only stage profiler for q_corpus_prep (round 18: attribute the
  * ~10 s sf1 solo figure before touching it, the same discipline as
  * MvtProfile/NormalizeProfile). Times each pipeline stage in
  * isolation: scan+tokenize+quality vs the md5 dedup agg vs the split
  * checkpoint vs the test-gram distinct vs the train-gram
  * contamination join vs the final rollup. Not part of the bench or
  * correctness surface; run with
  * `sbt "runMain graft.operators.CorpusPrepProfile"` (honors
  * SPARK_GRAFT_SF_DIR). Same by-name re-eval caveat as the other
  * profilers: frames re-run their upstream, so read INCREMENTS.
  */
object CorpusPrepProfile {
  import graft.functions.HashFunctions

  /** The ROUND-17 split lineage (pre-optimization), kept verbatim as
    * the attribution record and as the plan-artifact source
    * (`plans/r18/phase_corpus_prep_split_r17_*.txt`): the qf⋈dd
    * dedup join-back re-derives the tokenize+quality projection on
    * BOTH sides because the checkpoint sat downstream at sp —
    * measured ~2× the 2.7 s scan cost at sf1 (frames A-C below).
    */
  private[graft] def r17B(s: SparkSession, d: String): DataFrame =
    Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), col("text"),
        tokens(col("text")).as("toks"),
        qualityScore(col("text")).as("score"))
      .withColumn("ntok", size(col("toks")).cast("long"))
  private[graft] def r17Dd(s: SparkSession, d: String): DataFrame =
    r17B(s, d).filter(col("score") >= 0.5)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
  private[graft] def r17Split(s: SparkSession, d: String): DataFrame =
    r17B(s, d).filter(col("score") >= 0.5)
      .join(r17Dd(s, d), "doc_id")
      .withColumn("h", pmod(HashFunctions.hash32(col("doc_id")), lit(100)))
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "validation")
          .otherwise("test"))
      .select("doc_id", "source", "ntok", "toks", "split")

  /** The ROUND-18 checkpointed frame's lineage (what the one eager
    * pass actually computes before the dedup runs): ONE scan pays
    * tokenize+quality+md5 and text is dropped. The dedup agg and the
    * survivor join-back read this frame's checkpoint (they appear as
    * `Scan ExistingRDD` in `q_corpus_prep_after.txt`) — composing
    * them here WITHOUT the checkpoint would just re-print the r17
    * double-derivation, because the checkpoint is the collapse.
    */
  private[graft] def r18CkFrame(s: SparkSession, d: String): DataFrame =
    Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), col("source"), col("text"),
        tokens(col("text")).as("toks"),
        qualityScore(col("text")).as("score"))
      .withColumn("ntok", size(col("toks")).cast("long"))
      .filter(col("score") >= 0.5)
      .select(col("doc_id"), col("source"), col("ntok"), col("toks"),
        md5(col("text")).as("md5h"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-corpus-prep-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.map(t => f"$t%7.2f").mkString(" ")}")
    }

    val s = spark; val d = sfDir

    println("docs (fanned out): " + Tables.fanout(Tables.documents(s, d)).count())
    time("A_scan_tok_quality")(r17B(s, d))
    time("B_dedup_agg")(r17Dd(s, d))
    time("C_join_split (no ckpt)")(r17Split(s, d))
    // checkpoint wall time (construction is eager)
    val t0 = System.nanoTime()
    val sp = r17Split(s, d).localCheckpoint()
    println(f"C2_localCheckpoint          ${(System.nanoTime() - t0) / 1e9}%7.2f")
    val gr = sp.select(col("doc_id"), col("split"),
      explode(shingles(col("toks"), CorpusProfile.SpanGram)).as("gram"))
    val teg = gr.filter(col("split") === "test").select("gram").distinct()
    println("test grams distinct: " + teg.count())
    time("D_test_grams")(teg)
    def dr = gr.filter(col("split") === "train")
      .join(teg, "gram").select("doc_id").distinct()
    println("contaminated train docs: " + dr.count())
    time("E_train_gram_join")(dr)
    time("F_rollup")(sp.join(dr, Seq("doc_id"), "left_anti")
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("doc_id")))),
          x => x.getField("doc_id").cast("string")), ","))
          .as("member_md5")))
    time("G_full_query")(
      graft.SparkEntry.queries("q_corpus_prep")(s, d))
    spark.stop()
  }
}
