package graft.operators

import graft.{FrameCache, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the fastText/CCNet-style curation model
  * every production corpus pass runs: score each document against a
  * logistic model and keep/weight by the score. The reference has no ML
  * surface at all (four stock-Spark scripts, SURVEY.md §0), so this is
  * extension surface; the point here is the DISTRIBUTED TRAINING shape,
  * not the model class.
  *
  * Training is full-batch gradient descent: k iterations, each ONE
  * map-side-combined aggregate over the cached feature frame (per-row
  * gradient contributions collapse to 4 longs + a count per partition —
  * the `treeAggregate` shape MLlib's linear models use, with nothing on
  * the driver but the 4-double weight vector between jobs; the same
  * bounded-driver-state discipline as the BPE argmax rounds). At 100 TB
  * the expensive part is the feature scan, paid ONCE into the cache; each
  * GD round then reads the narrow (y, x0..x3) frame and ships ~40 bytes
  * per partition to the driver. The learned weights ride into the scoring
  * pass as literals (a broadcast model, like the trigram LM).
  *
  * Cross-engine determinism (the DuckDB oracle recomputes the identical
  * training run in chained CTEs): the sigmoid is the only transcendental,
  * so it is µ-quantized to 1e-6 BEFORE entering the gradient (an ulp of
  * `exp` cannot flip a 1e-6 grid cell except within ~1e-10 of a cell
  * edge); every per-row gradient term is then `round(x_j * (σq - y) *
  * 1e9)` on bit-identical doubles, summed EXACTLY as BIGINT — partial-sum
  * order cannot matter. The weight update is a fixed left-associative
  * double expression over those exact integers, so Spark's and DuckDB's
  * weights agree bit-for-bit; published weights are µ-quantized BIGINTs
  * (micro-units), accuracy is an integer count of `z >= 0` sign
  * agreements (no transcendental in the decision rule).
  */
object Classifier {

  private val lr = 2.0
  private val iters = 3

  /** Binary label: "long-form" (n_chars ≥ 300) — a synthetic target the
    * features genuinely encode, so the oracle can assert the training
    * MOVED (481/500 here vs a 256/500 majority-class floor; a
    * lang-derived label was tried first and the synthetic corpus's
    * features don't separate it — accuracy collapsed to the base rate,
    * which demonstrates nothing about the optimizer). In production the
    * label column comes from human/LLM quality annotations; only the
    * feature SELECT changes. Features: intercept, scaled length,
    * stopword ratio, distinct-token ratio. */
  private def feats(s: SparkSession, d: String): DataFrame =
    FrameCache.memo(s, s"clf-feats:$d") {
      Tables.documents(s, d).selectExpr(
        "CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y",
        "1.0 AS x0",
        "CAST(n_chars AS DOUBLE) / 1000.0 AS x1",
        s"CAST(size(filter(split(text, ' '), w -> w IN (${graft.functions.TextAnalysis.stopSql}))) AS DOUBLE) " +
          "/ size(split(text, ' ')) AS x2",
        "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) " +
          "/ size(split(text, ' ')) AS x3")
    }

  /** z = w·x as a left-associative Column (must mirror the oracle's
    * `b0*x0 + b1*x1 + b2*x2 + b3*x3` exactly — same op order, same
    * literal doubles). */
  private def zCol(w: Array[Double]): Column =
    lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  /** σ(z) µ-quantized to the 1e-6 grid, as a double back in [0,1]. */
  private def sigmaQ(w: Array[Double]): Column =
    round((lit(1.0) / (lit(1.0) + exp(-zCol(w)))) * lit(1000000.0))
      .cast("long") / lit(1000000.0)

  /** One full-batch GD update of `w` in place; returns the row count.
    * Shared by [[train]] and [[determinismMargins]] so the margin probe
    * replays the EXACT weight trajectory the oracle chain computes. */
  private def gdStep(f: DataFrame, w: Array[Double]): Long = {
    val sq = sigmaQ(w)
    val aggs = (0 to 3).map(j =>
      sum(round(col(s"x$j") * (sq - col("y")) * lit(1000000000.0))
        .cast("long")).as(s"g$j")) :+ count(lit(1)).as("n")
    val row = f.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n")
    for (j <- 0 to 3)
      w(j) = w(j) - lr * (row.getAs[Long](s"g$j").toDouble / 1.0e9 / n)
    n
  }

  /** Runs the k-iteration GD and returns (weights, nRows, nCorrect). */
  def train(s: SparkSession, d: String): (Array[Double], Long, Long) = {
    val f = feats(s, d)
    val w = Array(0.0, 0.0, 0.0, 0.0)
    var n = 0L
    for (_ <- 1 to iters) n = gdStep(f, w)
    val nCorrect = f
      .agg(sum(when((zCol(w) >= 0) === (col("y") === 1.0), 1L)
        .otherwise(0L)).as("nc"))
      .head().getAs[Long]("nc")
    (w, n, nCorrect)
  }

  /** The scaladoc's "~1e-10 of a cell edge" determinism caveat made
    * MEASURABLE: returns (sigMargin, zMargin) where sigMargin is the
    * smallest distance of any σ(z)·1e6 the gradient ever evaluates
    * (all rows × all iteration weight vectors, exact trajectory
    * replay) from a round() flip boundary (half-integers — the only
    * place a cross-engine exp() ulp could change the quantized cell),
    * and zMargin is the smallest |z| the final sign-decision sees (a
    * z within an ulp of 0 could flip an accuracy count the same way).
    * ClassifierSpec asserts both are orders of magnitude above ulp
    * scale on the fixture, so the bit-equality oracle rests on a
    * checked margin, not hope. */
  def determinismMargins(s: SparkSession, d: String): (Double, Double) = {
    val f = feats(s, d)
    val w = Array(0.0, 0.0, 0.0, 0.0)
    var sigMargin = Double.MaxValue
    for (_ <- 1 to iters) {
      val raw = (lit(1.0) / (lit(1.0) + exp(-zCol(w)))) * lit(1000000.0)
      val frac = raw - floor(raw)
      sigMargin = sigMargin.min(
        f.agg(min(abs(frac - lit(0.5)))).head().getDouble(0))
      gdStep(f, w)
    }
    val zMargin = f.agg(min(abs(zCol(w)))).head().getDouble(0)
    (sigMargin, zMargin)
  }

  /** One DuckDB gradient CTE + weight-update CTE pair for iteration t,
    * reading weights from CTE `$prev` (columns b0..b3). */
  private def duckIter(t: Int, prev: String): String = {
    val sig = s"(CAST(round((1.0 / (1.0 + exp(-(b0*x0 + b1*x1 + b2*x2 + b3*x3)))) * 1000000.0) " +
      "AS BIGINT) / 1000000.0)"
    val gs = (0 to 3).map(j =>
      s"SUM(CAST(round((x$j * ($sig - y)) * 1000000000.0) AS BIGINT)) AS g$j")
      .mkString(",\n    ")
    val ws = (0 to 3).map(j =>
      s"b$j - $lr * (CAST(g$j AS DOUBLE) / 1.0e9 / n) AS b$j").mkString(", ")
    s"""g$t AS (SELECT $gs,
       |    COUNT(*) AS n
       |  FROM f, $prev),
       |w$t AS (SELECT $ws FROM g$t, $prev)""".stripMargin
  }

  /** DuckDB twin of [[feats]] — shared by every oracle that replays
    * the training chain. */
  private lazy val duckFeatSql: String =
    s"""f AS (SELECT
       |  CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y,
       |  1.0 AS x0,
       |  CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
       |  CAST(len(list_filter(string_split(text, ' '),
       |       w -> w IN (${graft.functions.TextAnalysis.stopSql}))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS x2,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS x3
       |FROM documents)""".stripMargin

  /** The k-iteration GD weight chain, w0 → w$iters, as chained CTEs. */
  private lazy val duckChainSql: String = {
    val chain = (1 to iters)
      .map(t => duckIter(t, if (t == 1) "w0" else s"w${t - 1}"))
      .mkString(",\n")
    s"""w0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2, 0.0 AS b3),
       |$chain""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_quality_classifier",
      (s, d) => {
        val (w, n, nCorrect) = train(s, d)
        // exact-int publication; HALF_UP (away from zero) matches both
        // engines' round() — scala math.round floors negative halves
        val micro = w.map(x =>
          BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        import s.implicits._
        (Seq(("n_correct", nCorrect), ("n_rows", n)) ++
          micro.zipWithIndex.map { case (m, j) => (s"w$j", m) })
          .toDF("metric", "value")
          .orderBy("metric")
      },
      Some {
        s"""WITH $duckFeatSql,
           |$duckChainSql,
           |acc AS (SELECT
           |    SUM(CASE WHEN ((b0*x0 + b1*x1 + b2*x2 + b3*x3) >= 0) = (y = 1.0)
           |             THEN 1 ELSE 0 END) AS n_correct,
           |    COUNT(*) AS n
           |  FROM f, w$iters)
           |SELECT metric, value FROM (
           |  SELECT 'n_correct' AS metric, CAST(n_correct AS BIGINT) AS value FROM acc
           |  UNION ALL SELECT 'n_rows', n FROM acc
           |  UNION ALL SELECT 'w0', CAST(round(b0 * 1000000.0) AS BIGINT) FROM w$iters
           |  UNION ALL SELECT 'w1', CAST(round(b1 * 1000000.0) AS BIGINT) FROM w$iters
           |  UNION ALL SELECT 'w2', CAST(round(b2 * 1000000.0) AS BIGINT) FROM w$iters
           |  UNION ALL SELECT 'w3', CAST(round(b3 * 1000000.0) AS BIGINT) FROM w$iters)
           |ORDER BY metric""".stripMargin
      }),

    // ROC AUC of the trained classifier, computed exactly via the
    // rank-sum identity AUC = U₁ / (n₁·n₀) — the probability a random
    // positive outscores a random negative, ties at ½ (threshold-sweep
    // trapezoid integration gives the same number; the rank form needs
    // no per-threshold loop). Scores are µ-quantized BIGINTs (zq =
    // round(z·1e6) — the q_quality_classifier determinism grid), so
    // grouping keys are integers and the whole statistic is exact:
    // 2R₁ = Σ c₁·(2·C_prev + t + 1) over the score CDF (the
    // q_mannwhitney doubled-rank identity), one float division at the
    // end. The CDF is [[PrefixSums.cumulate]] — no unpartitioned
    // window over the score domain; at 100 TB the 2R₁ moment column
    // promotes to DECIMAL(38,0) as q_mannwhitney documents.
    QueryDef(
      "q_roc_auc",
      (s, d) => {
        val (w, _, _) = train(s, d)
        val grouped = feats(s, d)
          .select(round(zCol(w) * lit(1000000.0)).cast("long").as("zq"),
            col("y"))
          .groupBy("zq")
          .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("c1"),
            sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("c0"))
        graft.operators.PrefixSums.cumulate(grouped, "zq", Seq("c1", "c0"))
          .agg(max("cum_c1").as("n1"), max("cum_c0").as("n0"),
            sum(expr("c1 * (2 * (cum_c1 + cum_c0 - c1 - c0) + (c1 + c0) + 1)"))
              .as("r1x2"))
          .selectExpr("n1", "n0", "r1x2 - n1 * (n1 + 1) AS u1x2")
          .selectExpr("n1", "n0", "CAST(u1x2 AS DOUBLE) / 2 AS u1",
            "CAST(u1x2 AS DOUBLE) / (2 * CAST(n1 AS DOUBLE) * n0) AS auc")
      },
      Some(s"""WITH $duckFeatSql,
              |$duckChainSql,
              |sc AS (SELECT
              |    CAST(round((b0*x0 + b1*x1 + b2*x2 + b3*x3) * 1000000.0) AS BIGINT) AS zq,
              |    y
              |  FROM f, w$iters),
              |g AS (SELECT zq,
              |    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              |    CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS c0
              |  FROM sc GROUP BY 1),
              |c AS (SELECT zq, c1, c0,
              |    CAST(SUM(c1) OVER (ORDER BY zq) AS BIGINT) AS cum_c1,
              |    CAST(SUM(c0) OVER (ORDER BY zq) AS BIGINT) AS cum_c0
              |  FROM g),
              |m AS (SELECT CAST(MAX(cum_c1) AS BIGINT) AS n1,
              |    CAST(MAX(cum_c0) AS BIGINT) AS n0,
              |    CAST(SUM(c1 * (2 * (cum_c1 + cum_c0 - c1 - c0) + (c1 + c0) + 1))
              |      AS BIGINT) AS r1x2
              |  FROM c),
              |u AS (SELECT n1, n0, r1x2 - n1 * (n1 + 1) AS u1x2 FROM m)
              |SELECT n1, n0, CAST(u1x2 AS DOUBLE) / 2 AS u1,
              |  CAST(u1x2 AS DOUBLE) / (2 * CAST(n1 AS DOUBLE) * n0) AS auc
              |FROM u""".stripMargin)),

    // Calibration audit of the trained classifier — AUC (q_roc_auc)
    // measures ranking, not probability truth: a model can rank
    // perfectly while its scores are useless as probabilities. Per
    // predicted-probability decile: count, mean predicted probability,
    // empirical positive rate, their gap (the reliability-diagram
    // vertical), and the per-bin Brier contribution. The probability is
    // the µ-quantized sigmoid (p_micro = round(σ(z)·1e6), the
    // established determinism grid), so binning keys and both moment
    // sums are exact integers: Σ p_micro and Σ (p_micro − y_micro)²
    // accumulate as DECIMAL(38,0) (p² terms reach 1e12/row — a BIGINT
    // sum would wrap near ~9M rows; decimal is the documented 100 TB
    // promotion, same as q_mannwhitney), and each published double is
    // ONE division at the end. Scale shape: one scan of the cached
    // feature frame → 10-group agg; nothing else moves.
    QueryDef(
      "q_calibration",
      (s, d) => {
        val (w, _, _) = train(s, d)
        feats(s, d)
          .select(
            round((lit(1.0) / (lit(1.0) + exp(-zCol(w)))) * lit(1000000.0))
              .cast("long").as("p"),
            (col("y") * lit(1000000.0)).cast("long").as("ym"),
            col("y"))
          .selectExpr("least(p DIV 100000, 9) AS bin", "p", "ym", "y")
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"),
            sum(col("p").cast("decimal(38,0)")).as("sp"),
            sum(((col("p") - col("ym")) * (col("p") - col("ym")))
              .cast("decimal(38,0)")).as("se"))
          .selectExpr("CAST(bin AS BIGINT) AS bin", "n", "n_pos",
            "CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean_pred",
            "CAST(n_pos AS DOUBLE) / n AS frac_pos",
            "CAST(n_pos AS DOUBLE) / n - CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS gap",
            "CAST(se AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000000.0) AS brier")
          .orderBy("bin")
      },
      Some(s"""WITH $duckFeatSql,
              |$duckChainSql,
              |sc AS (SELECT
              |    CAST(round((1.0 / (1.0 + exp(-(b0*x0 + b1*x1 + b2*x2 + b3*x3)))) * 1000000.0) AS BIGINT) AS p,
              |    CAST(y * 1000000.0 AS BIGINT) AS ym, y
              |  FROM f, w$iters),
              |g AS (SELECT LEAST(p // 100000, 9) AS bin, COUNT(*) AS n,
              |    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
              |    SUM(CAST(p AS DECIMAL(38,0))) AS sp,
              |    SUM(CAST((p - ym) * (p - ym) AS DECIMAL(38,0))) AS se
              |  FROM sc GROUP BY 1)
              |SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
              |  CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS mean_pred,
              |  CAST(n_pos AS DOUBLE) / n AS frac_pos,
              |  CAST(n_pos AS DOUBLE) / n - CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS gap,
              |  CAST(se AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000000.0) AS brier
              |FROM g ORDER BY bin""".stripMargin)),

    // Exact distributed CART stump — the tree-family member of the
    // trained-model surface (GD logistic / Naive Bayes / Markov / kNN
    // already ship): predict returnflag='R' from three integer-domain
    // features (quantity, discount-cents, ship month). Every candidate
    // split (feature, v ≤ t) is scored in ONE pass: stack the features
    // (3 rows/row, map-side combined immediately), group to per-(feat,
    // value) class counts, cumulate per feature with a window over the
    // ≤102-point value domain, and maximize the purity functional
    // Σside (pos²+neg²)/n_side — algebraically equivalent to minimizing
    // weighted Gini, but every term is a ratio of EXACT integers
    // (squares in DECIMAL(38,0) for the 100 TB row counts), cast to
    // DOUBLE through identical expressions in both engines, and
    // milli-quantized before the argmax; ties break on (feat, v). The
    // stump's training accuracy is pure counting: majority class per
    // side. No iteration, no learning rate — a split search IS an
    // aggregation, which is why trees scale on Spark.
    QueryDef(
      "q_ml_stump",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stacked = Tables.lineitem(s, d).selectExpr(
            "CAST(l_returnflag = 'R' AS INT) AS y",
            "CAST(l_quantity AS INT) AS qty",
            "CAST(round(l_discount * 100) AS INT) AS disc",
            "CAST(month(l_shipdate) AS INT) AS mth")
          .selectExpr("y", "stack(3, 'disc', disc, 'mth', mth, 'qty', qty) AS (feat, v)")
        val grp = stacked.groupBy("feat", "v")
          .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("pos"))
        val cum = Window.partitionBy("feat").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = Window.partitionBy("feat")
        grp
          .withColumn("nl", sum("n").over(cum))
          .withColumn("posl", sum("pos").over(cum))
          .withColumn("nt", sum("n").over(tot))
          .withColumn("post", sum("pos").over(tot))
          .filter(col("nl") < col("nt"))
          .selectExpr("feat", "v", "nl", "posl", "nl - posl AS negl",
            "nt - nl AS nr", "post - posl AS posr",
            "(nt - nl) - (post - posl) AS negr", "nt", "post")
          .selectExpr("feat", "v", "nl", "posl", "negl", "nr", "posr", "negr", "nt",
            "CAST(floor((" +
              "CAST(CAST(posl AS DECIMAL(19,0)) * posl + CAST(negl AS DECIMAL(19,0)) * negl AS DOUBLE) / nl + " +
              "CAST(CAST(posr AS DECIMAL(19,0)) * posr + CAST(negr AS DECIMAL(19,0)) * negr AS DOUBLE) / nr" +
              ") / nt * 1000.0) AS BIGINT) AS purity_milli")
          .orderBy(col("purity_milli").desc, col("feat"), col("v"))
          .limit(1)
          .selectExpr("feat AS split_feature", "v AS split_threshold",
            "purity_milli", "nl AS n_left", "posl AS pos_left",
            "nr AS n_right", "posr AS pos_right",
            "greatest(posl, negl) + greatest(posr, negr) AS n_correct", "nt AS n_rows")
      },
      Some("""WITH f AS (
             |  SELECT CAST(l_returnflag = 'R' AS INT) AS y,
             |    CAST(l_quantity AS INT) AS qty,
             |    CAST(round(l_discount * 100) AS INT) AS disc,
             |    CAST(month(l_shipdate) AS INT) AS mth
             |  FROM lineitem),
             |st AS (
             |  SELECT y, 'disc' AS feat, disc AS v FROM f
             |  UNION ALL SELECT y, 'mth', mth FROM f
             |  UNION ALL SELECT y, 'qty', qty FROM f),
             |g AS (SELECT feat, v, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
             |      FROM st GROUP BY 1, 2),
             |c AS (SELECT feat, v,
             |    SUM(n) OVER (PARTITION BY feat ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             |    SUM(pos) OVER (PARTITION BY feat ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS posl,
             |    SUM(n) OVER (PARTITION BY feat) AS nt,
             |    SUM(pos) OVER (PARTITION BY feat) AS post
             |  FROM g),
             |cand AS (
             |  SELECT feat, v, nl, posl, nl - posl AS negl,
             |    nt - nl AS nr, post - posl AS posr,
             |    (nt - nl) - (post - posl) AS negr, nt
             |  FROM c WHERE nl < nt),
             |sc AS (
             |  SELECT feat, v, nl, posl, negl, nr, posr, negr, nt,
             |    CAST(floor((
             |      CAST(CAST(posl AS DECIMAL(19,0)) * posl + CAST(negl AS DECIMAL(19,0)) * negl AS DOUBLE) / nl +
             |      CAST(CAST(posr AS DECIMAL(19,0)) * posr + CAST(negr AS DECIMAL(19,0)) * negr AS DOUBLE) / nr
             |    ) / nt * 1000.0) AS BIGINT) AS purity_milli
             |  FROM cand)
             |SELECT feat AS split_feature, CAST(v AS INT) AS split_threshold,
             |  purity_milli, CAST(nl AS BIGINT) AS n_left,
             |  CAST(posl AS BIGINT) AS pos_left, CAST(nr AS BIGINT) AS n_right,
             |  CAST(posr AS BIGINT) AS pos_right,
             |  CAST(GREATEST(posl, negl) + GREATEST(posr, negr) AS BIGINT) AS n_correct,
             |  CAST(nt AS BIGINT) AS n_rows
             |FROM sc ORDER BY purity_milli DESC, feat, v LIMIT 1""".stripMargin)))
}
