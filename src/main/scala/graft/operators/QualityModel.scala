package graft.operators

import graft.QuerySpec
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-in-the-loop data filtering — the trainable analog of the
  * fixed-weight heuristic in [[graft.functions.TextFunctions#qualityScore]].
  * Reference-class pipelines train a linear quality classifier over
  * surface features and filter the crawl with it; the reference repo
  * only hard-codes heuristics, so the training loop is the engine's
  * own first-class addition.
  *
  * Gold labels: the driver's synthetic corpus carries no learnable
  * exogenous label (lang/source are statistically independent of the
  * text), so the gold set is a HELD-OUT deterministic rule — a
  * nonlinear predicate over surface statistics,
  * `(stop_bp >= 600 AND ntok >= 40) OR mtl <= 430` — that the linear
  * model can approximate but not represent (it lands at ~83-87%
  * accuracy, not 100%, at every scale). The exercise is the
  * distributed training algebra; the stand-in labeling is documented
  * here the same way as the engine's other deterministic stand-ins.
  *
  * Everything is INTEGER arithmetic end to end, so the whole training
  * trajectory is exact across engines (no float sums whose order
  * could differ between Spark and DuckDB). Two trainers:
  *
  *  - batch perceptron (`q_quality_train` / `q_quality_apply`):
  *    featurize once, then per epoch ONE map-side-combinable
  *    aggregate computes the misclassified-set gradient (exact BIGINT
  *    sums); the driver applies `w += g / (n/4)` (truncating division,
  *    mirrored in the oracle by a sign-split `//`). One 5-long row to
  *    the driver per epoch — the same bounded-collect pattern as the
  *    BPE trainer and the IVF k-means.
  *  - exact least-squares classification (`q_quality_lsc`): the
  *    single-pass scale path. ONE aggregate builds the Gram matrix
  *    XᵀX (+ unit ridge) and Xᵀy — 14 exact integer sums — and the
  *    4×4 normal equations are solved EXACTLY by integer Cramer
  *    determinants (BigInt on the driver; HUGEINT in the oracle's
  *    generated 24-term determinant SQL). No iteration, no float — at
  *    100 TB this is one scan of the corpus.
  *
  * Features (centered integers; the raw DIVs all have non-negative
  * operands so Spark DIV == DuckDB `//`): x0 = 1,
  * x1 = min(ntok,400)/4 − 13, x2 = stop_bp/100 − 6, x3 = mtl/10 − 45.
  * Centering matters: on the raw scales the full-batch perceptron
  * two-cycles between the all-positive and all-negative halfspaces.
  */
object QualityModel {

  val Epochs = 8
  private val Dim = 4

  // ---- featurization + gold rule (Spark + DuckDB twins) -------------------

  /** (doc_id, source, y, x0..x3) — all integers. */
  private[graft] def docFeatures(s: SparkSession, d: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    graft.Tables.fanout(graft.Tables.documents(s, d))
      .select(
        col("doc_id"), col("source"),
        size(toks).cast("long").as("ntok"),
        TextFunctions.vocabHits(toks, TextFunctions.enStopwords)
          .cast("long").as("nstop"),
        length(concat_ws("", toks)).cast("long").as("nletters"))
      .selectExpr(
        "doc_id", "source",
        "CASE WHEN ntok = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE nstop * 10000 DIV ntok END AS stop_bp",
        "CASE WHEN ntok = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE nletters * 100 DIV ntok END AS mtl",
        "ntok")
      .selectExpr(
        "doc_id", "source",
        "CASE WHEN (stop_bp >= 600 AND ntok >= 40) OR mtl <= 430" +
          " THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y",
        "CAST(1 AS BIGINT) AS x0",
        "LEAST(ntok, CAST(400 AS BIGINT)) DIV 4 - 13 AS x1",
        "stop_bp DIV 100 - 6 AS x2",
        "mtl DIV 10 - 45 AS x3")
  }

  private val sqlToks = TextFunctions.sql.toks
  private val sqlStopIn = TextFunctions.sql.vocabIn(TextFunctions.enStopwords)

  /** DuckDB twin of [[docFeatures]]. */
  private[operators] val oracleFeatsCte: String =
    s"""raw AS (
      |  SELECT doc_id, source,
      |    CAST(len($sqlToks) AS BIGINT) AS ntok,
      |    CASE WHEN len($sqlToks) = 0 THEN 0 ELSE
      |      CAST(len(list_filter($sqlToks, t -> t IN $sqlStopIn))
      |        AS BIGINT) * 10000 // len($sqlToks) END AS stop_bp,
      |    CASE WHEN len($sqlToks) = 0 THEN 0 ELSE
      |      CAST(length(array_to_string($sqlToks, '')) AS BIGINT) * 100
      |        // len($sqlToks) END AS mtl
      |  FROM documents),
      |feats AS MATERIALIZED (
      |  SELECT doc_id, source,
      |    CASE WHEN (stop_bp >= 600 AND ntok >= 40) OR mtl <= 430
      |      THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS y,
      |    CAST(1 AS BIGINT) AS x0,
      |    LEAST(ntok, 400) // 4 - 13 AS x1,
      |    stop_bp // 100 - 6 AS x2,
      |    mtl // 10 - 45 AS x3
      |  FROM raw)""".stripMargin

  private val xs = (0 until Dim).map(j => s"x$j")

  // ---- batch perceptron ----------------------------------------------------

  /** Unrolled epoch CTEs ending in `trajectory` (one row per epoch:
    * pre-update n_miss, post-update weights). The learning rate is
    * `g / (n/4)` with TRUNCATING division (the driver loop uses Scala
    * Long `/`), so the oracle splits by sign — DuckDB `//` floors.
    */
  private[operators] val oracleEpochCtes: String = {
    def tdiv(a: String, b: String): String =
      s"CASE WHEN $a >= 0 THEN $a // $b ELSE -((-($a)) // $b) END"
    // GREATEST(..., 1) mirrors the driver loop's max(n/4, 1): without
    // it a sub-4-row corpus trains with lr=1 in the engine but divides
    // by zero in the oracle
    val e0 = s"nn AS (SELECT GREATEST(count(*) // 4, 1) AS lr FROM feats),\n" +
      s"e0 AS (SELECT ${
        xs.map(x => s"CAST(0 AS BIGINT) AS w$x").mkString(", ")})"
    val steps = (1 to Epochs).map { t =>
      val margin = xs.map(x => s"w$x * $x").mkString("y * (", " + ", ")")
      val grads = xs.map(x =>
        s"CAST(COALESCE(sum(CASE WHEN $margin <= 0 THEN y * $x END), 0)" +
          s" AS BIGINT) AS g$x").mkString(", ")
      s"""g$t AS MATERIALIZED (
        |  SELECT CAST(COALESCE(sum(CASE WHEN $margin <= 0 THEN 1 END), 0)
        |      AS BIGINT) AS n_miss, $grads
        |  FROM feats, e${t - 1}),
        |e$t AS (
        |  SELECT ${xs.map(x =>
          s"e.w$x + ${tdiv(s"g.g$x", "nn.lr")} AS w$x").mkString(", ")}
        |  FROM e${t - 1} e, g$t g, nn)""".stripMargin
    }
    val traj = (1 to Epochs).map { t =>
      s"""SELECT $t AS epoch, g$t.n_miss, ${
        xs.map(x => s"e$t.w$x").mkString(", ")} FROM g$t, e$t"""
    }.mkString("trajectory AS (\n", "\n  UNION ALL\n", ")")
    (Seq(e0) ++ steps :+ traj).mkString(",\n")
  }

  /** Driver-side loop: each epoch ONE aggregate collecting Dim+1
    * longs. Returns the per-epoch (n_miss, post-update weights).
    */
  private[graft] def train(feats: DataFrame): Seq[(Long, Array[Long])] = {
    val n = feats.count()
    val lr = math.max(n / 4L, 1L)
    val w = Array.fill(Dim)(0L)
    (1 to Epochs).map { _ =>
      val margin = xs.zipWithIndex
        .map { case (x, j) => col(x) * w(j) }.reduce(_ + _) * col("y")
      val miss = margin <= 0L
      val aggs = sum(when(miss, 1L).otherwise(0L)) +:
        xs.map(x => sum(when(miss, col("y") * col(x)).otherwise(0L)))
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val nMiss = row.getLong(0)
      for (j <- 0 until Dim) w(j) += row.getLong(j + 1) / lr
      (nMiss, w.clone())
    }
  }

  private def checkpointedFeats(s: SparkSession, d: String): DataFrame =
    // featurize once, iterate on the compact matrix (see class doc);
    // same executor-local checkpoint tradeoff as the engine's other
    // iterative loops (clustering frontier, BPE)
    docFeatures(s, d).localCheckpoint(false)

  private val qTrain = QuerySpec.of(
    "q_quality_train",
    s"""WITH $oracleFeatsCte,
      |$oracleEpochCtes
      |SELECT epoch, n_miss, ${xs.map(x =>
        s"w$x AS ${x.replace("x", "w")}").mkString(", ")}
      |FROM trajectory ORDER BY epoch""".stripMargin) { (s, d) =>
    val traj = train(checkpointedFeats(s, d))
    import s.implicits._
    traj.zipWithIndex
      .map { case ((nMiss, w), i) => (i + 1, nMiss, w(0), w(1), w(2), w(3)) }
      .toDF("epoch", "n_miss", "w0", "w1", "w2", "w3")
      .orderBy("epoch")
  }

  // Per source: docs, predicted-keep count (margin > 0), agreement
  // with the gold rule — the sheet a pipeline reads before switching
  // its filter from heuristic to model.
  private val qApply = QuerySpec.of(
    "q_quality_apply",
    s"""WITH $oracleFeatsCte,
      |$oracleEpochCtes,
      |scored AS (
      |  SELECT f.source, f.y,
      |    CASE WHEN ${xs.map(x => s"e.w$x * f.$x").mkString(" + ")} > 0
      |      THEN 1 ELSE -1 END AS pred
      |  FROM feats f, e$Epochs e)
      |SELECT source, count(*) AS n_docs,
      |  CAST(COALESCE(sum(CASE WHEN pred = 1 THEN 1 END), 0) AS BIGINT)
      |    AS n_pred_keep,
      |  CAST(COALESCE(sum(CASE WHEN pred = y THEN 1 END), 0) AS BIGINT)
      |    AS n_agree
      |FROM scored GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val feats = checkpointedFeats(s, d)
    val w = train(feats).last._2
    val margin = (0 until Dim).map(j => col(s"x$j") * w(j)).reduce(_ + _)
    feats
      .withColumn("pred", when(margin > 0L, 1L).otherwise(-1L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === 1L, 1L).otherwise(0L)).as("n_pred_keep"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_agree"))
      .orderBy("source")
  }

  // ---- exact least-squares classification (single-pass) -------------------

  /** 4×4 integer determinant as SQL over HUGEINT-cast cells — the
    * 24-term Leibniz expansion, generated so the Spark driver's BigInt
    * Cramer solve and the oracle expand identically.
    */
  private def sqlDet4(cell: (Int, Int) => String): String = {
    val perms = Seq(0, 1, 2, 3).permutations.toSeq
    def sign(p: Seq[Int]): Int = {
      var s = 1
      for (i <- p.indices; j <- i + 1 until p.length if p(i) > p(j)) s = -s
      s
    }
    perms.map { p =>
      val term = (0 until 4)
        .map(i => s"CAST(${cell(i, p(i))} AS HUGEINT)").mkString(" * ")
      (if (sign(p) > 0) "+ " else "- ") + term
    }.mkString("(", " ", ")")
  }

  /** Exact Cramer solve of the ridged normal equations: returns
    * (detA, det₀..det₃) with wⱼ = detⱼ/detA as exact rationals.
    * Exposed for the property suite's independent-elimination check.
    */
  private[graft] def solveNormal(a: Array[Array[BigInt]],
      b: Array[BigInt]): (BigInt, IndexedSeq[BigInt]) = {
    val dA = det4(a)
    val dJ = (0 until Dim).map { jCol =>
      det4(Array.tabulate(Dim, Dim)((i, j) =>
        if (j == jCol) b(i) else a(i)(j)))
    }
    (dA, dJ)
  }

  private def det4(m: Array[Array[BigInt]]): BigInt = {
    val perms = Seq(0, 1, 2, 3).permutations.toSeq
    def sign(p: Seq[Int]): Int = {
      var s = 1
      for (i <- p.indices; j <- i + 1 until p.length if p(i) > p(j)) s = -s
      s
    }
    perms.map(p =>
      BigInt(sign(p)) * (0 until 4).map(i => m(i)(p(i))).product).sum
  }

  // The single-pass trainer: ONE aggregate builds Gram sums a_ij
  // (i <= j; + unit ridge on the diagonal) and b_i = Σ y·x_i, Cramer
  // solves exactly, and the output row carries the weights in
  // basis points (wᵢ·10000 truncated — sign of detA handled
  // explicitly) plus corpus-wide agreement counts at the exact
  // rational weights (sign(Σ detᵢ·xᵢ · sign(detA)) — no rounding in
  // the decision, so Spark and DuckDB agree bit-for-bit).
  private val qLsc = QuerySpec.of(
    "q_quality_lsc", {
      val gram = (for (i <- 0 until Dim; j <- i until Dim) yield
        s"CAST(COALESCE(sum(x$i * x$j), 0) AS BIGINT)" +
          s"${if (i == j) " + 1" else ""} AS a${i}$j").mkString(",\n      ")
      val bs = (0 until Dim).map(i =>
        s"CAST(COALESCE(sum(y * x$i), 0) AS BIGINT) AS b$i")
        .mkString(", ")
      def aCell(i: Int, j: Int): String =
        if (i <= j) s"a$i$j" else s"a$j$i"
      val detA = sqlDet4(aCell)
      val detJ = (0 until Dim).map { jCol =>
        sqlDet4((i, j) => if (j == jCol) s"b$i" else aCell(i, j))
      }
      val wbp = (0 until Dim).map { j =>
        val num = s"(CAST(d$j AS HUGEINT) * 10000)"
        s"CAST(CASE WHEN ($num >= 0) = (da >= 0)" +
          s" THEN abs($num) // abs(da)" +
          s" ELSE -(abs($num) // abs(da)) END AS BIGINT) AS w${j}_bp"
      }.mkString(",\n      ")
      val margin = (0 until Dim).map(j => s"CAST(d$j AS HUGEINT) * x$j")
        .mkString(" + ")
      s"""WITH $oracleFeatsCte,
        |gram AS MATERIALIZED (
        |  SELECT $gram,
        |      $bs,
        |      count(*) AS n
        |  FROM feats),
        |dets AS MATERIALIZED (
        |  SELECT n, $detA AS da,
        |    ${detJ.zipWithIndex.map { case (d, j) => s"$d AS d$j" }
          .mkString(",\n    ")}
        |  FROM gram),
        |summary AS (
        |  SELECT
        |    $wbp,
        |    CAST(COALESCE(sum(CASE WHEN
        |      (CASE WHEN ($margin) * (CASE WHEN da >= 0 THEN 1 ELSE -1 END)
        |            > 0 THEN 1 ELSE -1 END) = y THEN 1 END), 0) AS BIGINT)
        |      AS n_agree,
        |    max(dets.n) AS n_docs
        |  FROM feats, dets
        |  GROUP BY ${(0 until Dim).map(j => s"d$j").mkString(", ")}, da)
        |SELECT w0_bp, w1_bp, w2_bp, w3_bp, n_agree, n_docs
        |FROM summary ORDER BY w0_bp""".stripMargin
    }) { (s, d) =>
    val feats = checkpointedFeats(s, d)
    val gramAggs =
      (for (i <- 0 until Dim; j <- i until Dim)
        yield sum(col(s"x$i") * col(s"x$j"))) ++
        (0 until Dim).map(i => sum(col("y") * col(s"x$i"))) :+
        count(lit(1))
    val row = feats.agg(gramAggs.head, gramAggs.tail: _*).head()
    val a = Array.ofDim[BigInt](Dim, Dim)
    var k = 0
    for (i <- 0 until Dim; j <- i until Dim) {
      val v = BigInt(row.getLong(k)) + (if (i == j) 1 else 0)
      a(i)(j) = v; a(j)(i) = v; k += 1
    }
    val b = (0 until Dim).map(i => BigInt(row.getLong(k + i))).toArray
    val n = row.getLong(k + Dim)
    val (dA, dJ) = solveNormal(a, b)
    // the margin below casts each Cramer determinant to decimal(38,0);
    // Gram-determinant magnitude grows ~(n·x²)^4, and past 1e38 the
    // non-ANSI cast would silently NULL the margin (wrong n_agree)
    // where the oracle's HUGEINT errors loudly — fail loudly here too,
    // symmetric with the oracle (scale features down before the Gram
    // pass if a corpus ever trips this)
    val DecMax = BigInt(10).pow(38)
    (dJ :+ dA).foreach(det => require(det.abs < DecMax,
      s"Cramer determinant $det exceeds decimal(38,0); " +
        "rescale features before the Gram pass"))
    // BigInt / truncates toward zero — matches the oracle's sign-split
    val wbp = dJ.map(dj => ((dj * 10000) / dA).toLong)
    val sgn = if (dA.signum >= 0) 1L else -1L
    // decision at the exact rational weights: sign(Σ detⱼ·xⱼ)·sign(detA)
    val margin = (0 until Dim)
      .map(j => col(s"x$j") * lit(dJ(j).toString).cast("decimal(38,0)"))
      .reduce(_ + _) * sgn
    val agree = feats
      .agg(sum(when(
        when(margin > 0, 1L).otherwise(-1L) === col("y"), 1L)
        .otherwise(0L)))
      .head().getLong(0)
    import s.implicits._
    Seq((wbp(0), wbp(1), wbp(2), wbp(3), agree, n))
      .toDF("w0_bp", "w1_bp", "w2_bp", "w3_bp", "n_agree", "n_docs")
      .orderBy("w0_bp")
  }

  // ---- threshold sweep: the operating-point sheet --------------------------
  // Filtering pipelines don't ship sign(w·x) — they pick a margin
  // threshold trading corpus volume against precision. The sweep
  // evaluates the trained perceptron margin against a fixed integer
  // threshold grid in ONE corpus pass (the per-threshold counts are
  // a conditional aggregate over the broadcast grid), all-integer so
  // the sheet is exact cross-engine.
  private val Thresholds: Seq[Int] = Seq(-80, -60, -40, -20, -10, 0,
    10, 20, 40, 60, 80)

  private val qSweep = QuerySpec.of(
    "q_quality_threshold_sweep",
    s"""WITH $oracleFeatsCte,
      |$oracleEpochCtes,
      |scored AS (
      |  SELECT f.y, ${xs.map(x => s"e.w$x * f.$x").mkString(" + ")} AS m
      |  FROM feats f, e$Epochs e),
      |grid AS (SELECT unnest([${Thresholds.mkString(", ")}]) AS t)
      |SELECT t,
      |  CAST(COALESCE(sum(CASE WHEN m > t THEN 1 END), 0) AS BIGINT)
      |    AS n_keep,
      |  CAST(COALESCE(sum(CASE WHEN m > t AND y = 1 THEN 1 END), 0)
      |    AS BIGINT) AS n_true_pos,
      |  CAST(COALESCE(sum(CASE WHEN m <= t AND y = 1 THEN 1 END), 0)
      |    AS BIGINT) AS n_false_neg
      |FROM scored, grid GROUP BY t ORDER BY t""".stripMargin) { (s, d) =>
    val feats = checkpointedFeats(s, d)
    val w = train(feats).last._2
    val margin = (0 until Dim).map(j => col(s"x$j") * w(j)).reduce(_ + _)
    import s.implicits._
    feats
      .withColumn("m", margin)
      .crossJoin(broadcast(Thresholds.toDF("t")))
      .groupBy("t")
      .agg(
        sum(when(col("m") > col("t"), 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("m") > col("t") && col("y") === 1L, 1L)
          .otherwise(0L)).as("n_true_pos"),
        sum(when(col("m") <= col("t") && col("y") === 1L, 1L)
          .otherwise(0L)).as("n_false_neg"))
      .orderBy("t")
  }

  // ---- uncertainty sampling: the active-learning loop ----------------------
  // The docs the model is LEAST sure about (smallest |margin|) are the
  // ones worth human labels next. Per source, the UncertainK smallest
  // |margin| docs (doc_id tie-break) — integer margins, so the
  // selection is exact cross-engine.
  private val UncertainK = 5

  private val qUncertain = QuerySpec.of(
    "q_quality_uncertainty",
    s"""WITH $oracleFeatsCte,
      |$oracleEpochCtes,
      |scored AS (
      |  SELECT f.source, f.doc_id, f.y,
      |    ${xs.map(x => s"e.w$x * f.$x").mkString(" + ")} AS m
      |  FROM feats f, e$Epochs e),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY source
      |      ORDER BY abs(m), doc_id) AS rnk
      |  FROM scored)
      |SELECT source, CAST(rnk AS INT) AS rnk, doc_id, m AS margin, y
      |FROM rk WHERE rnk <= $UncertainK
      |ORDER BY source, rnk""".stripMargin) { (s, d) =>
    val feats = checkpointedFeats(s, d)
    val w = train(feats).last._2
    val margin = (0 until Dim).map(j => col(s"x$j") * w(j)).reduce(_ + _)
    feats
      .withColumn("m", margin)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(abs(col("m")), col("doc_id"))))
      .filter(col("rnk") <= UncertainK)
      .select(col("source"), col("rnk"), col("doc_id"),
        col("m").as("margin"), col("y"))
      .orderBy("source", "rnk")
  }

  val specs: Seq[QuerySpec] = Seq(qTrain, qApply, qLsc, qSweep, qUncertain)
}
