package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Term-weighting and relevance ranking over the document corpus —
  * TF-IDF term extraction, BM25 query scoring, and PMI co-occurrence
  * mining: the retrieval/feature side of a training-data pipeline
  * (dedup finds what to drop; ranking finds what to keep and what a
  * query is about). No reference precedent (SURVEY.md §2.2 extension
  * surface).
  *
  * Scale design: everything reduces to token-level hash aggregates
  * (map-side combinable, one shuffle each) joined back over tiny
  * term-statistics frames that broadcast; the per-doc top-k cut ranks
  * AFTER aggregation. PMI's candidate relation is a per-document
  * self-join of distinct tokens — quadratic in DOCUMENT length, keyed
  * by doc_id, so its cost is Σ len(doc)² spread over doc partitions,
  * never corpus-quadratic.
  *
  * Determinism: `ln` is the one non-correctly-rounded primitive here;
  * every ln is quantized to integer micros BEFORE any cross-row
  * arithmetic, so all downstream sums/products are exact integer math
  * or IEEE-identical doubles derived from integers (see Quality.scala
  * for the same rule on entropy). Ranks order by integer counts with
  * lexical tie-breaks — never by a float.
  */
object Ranking {

  /** The fixed BM25 probe query, shared by both dialects. */
  private val bm25Terms = Seq("hash", "join", "stream")
  private val termsSql  = bm25Terms.map(t => s"'$t'").mkString(", ")

  /** Unique (doc_id, tok, tf) term-frequency relation. */
  private def termFreq(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .selectExpr("doc_id", "explode(split(text, ' ')) AS tok")
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))

  val defs: Seq[QueryDef] = Seq(

    // Per-document top-3 TF-IDF terms. Rank by (tf DESC, tok) — integer
    // + lexical, engine-independent; the reported tfidf score uses
    // idf = ln(N/df) quantized to micros.
    QueryDef(
      "q_tfidf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tf = termFreq(s, d)
        val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("tok"))
        tf.join(broadcast(df), "tok")
          .crossJoin(broadcast(n))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .withColumn("idf_micro",
            expr("CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1e6, 0) AS BIGINT)"))
          .withColumn("tfidf", round(col("tf") * col("idf_micro") / 1e6, 6))
          .select("doc_id", "rank", "tok", "tf", "df", "tfidf")
          .orderBy("doc_id", "rank")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
             |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
             |  GROUP BY doc_id, tok),
             |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |ranked AS (
             |  SELECT doc_id, tok, tf, df, n_docs,
             |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, tok) AS rank
             |  FROM tf JOIN df USING (tok) CROSS JOIN n)
             |SELECT doc_id, rank, tok, tf, df,
             |  round(tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1e6) AS BIGINT) / 1e6,
             |        6) AS tfidf
             |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // BM25 (k1=1.2, b=0.75) for the fixed query {hash, join, stream} —
    // top 20 documents. avgdl is the exact rational total_tokens/N
    // (bigint/bigint → identical double in both engines); idf uses the
    // ln(1 + (N-df+.5)/(df+.5)) smoothing, micro-quantized; each
    // per-term partial score is micro-quantized before the per-doc sum
    // so the sum is exact BIGINT arithmetic in any order. After
    // quantization both engines hold bit-identical doubles, so ordering
    // by score is total with the doc_id tie-break.
    QueryDef(
      "q_bm25",
      (s, d) => {
        val terms = bm25Terms
        val tf = termFreq(s, d)
        val df = tf.filter(col("tok").isin(terms: _*))
          .groupBy("tok").agg(count(lit(1)).as("df"))
        val dl = Tables.documents(s, d)
          .selectExpr("doc_id", "size(split(text, ' ')) AS dl")
        val stats = dl.agg(sum(col("dl")).cast("bigint").as("total_toks"),
          count(lit(1)).as("n_docs"))
        tf.filter(col("tok").isin(terms: _*))
          .join(broadcast(df), "tok")
          .join(dl, "doc_id")
          .crossJoin(broadcast(stats))
          .withColumn("idf_micro", expr(
            "CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * 1e6, 0) AS BIGINT)"))
          .withColumn("part_micro", expr(
            "CAST(round((idf_micro / 1e6) * tf * 2.2 / " +
              "(tf + 1.2 * (0.25 + 0.75 * dl / (CAST(total_toks AS DOUBLE) / n_docs))) * 1e6, 0) AS BIGINT)"))
          .groupBy("doc_id")
          .agg(max(col("dl")).as("dl"),
            round(sum(col("part_micro")) / 1e6, 6).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH tf AS (
              |  SELECT doc_id, tok, COUNT(*) AS tf FROM (
              |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
              |  GROUP BY doc_id, tok),
              |df AS (SELECT tok, COUNT(*) AS df FROM tf
              |       WHERE tok IN ($termsSql) GROUP BY tok),
              |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
              |stats AS (SELECT CAST(SUM(dl) AS BIGINT) AS total_toks, COUNT(*) AS n_docs FROM dl),
              |parts AS (
              |  SELECT tf.doc_id, dl.dl,
              |    CAST(round((CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * 1e6) AS BIGINT) / 1e6)
              |      * tf * 2.2
              |      / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(total_toks AS DOUBLE) / n_docs))) * 1e6) AS BIGINT) AS part_micro
              |  FROM tf JOIN df USING (tok) JOIN dl ON dl.doc_id = tf.doc_id
              |  CROSS JOIN stats
              |  WHERE tok IN ($termsSql))
              |SELECT doc_id, MAX(dl) AS dl, round(SUM(part_micro) / 1e6, 6) AS score
              |FROM parts GROUP BY doc_id
              |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    // PMI co-occurrence head: top-30 unordered token pairs by document
    // co-occurrence count (integer rank), with the pointwise mutual
    // information ln(N·c_ab / (c_a·c_b)) reported micro-quantized. The
    // pair relation is dt ⋈ dt on doc_id with tok1 < tok2 — per-doc
    // quadratic only.
    QueryDef(
      "q_pmi",
      (s, d) => {
        val dt = termFreq(s, d).select("doc_id", "tok")
        val ca = dt.groupBy("tok").agg(count(lit(1)).as("c"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        dt.as("a").join(dt.as("b"),
            col("a.doc_id") === col("b.doc_id") && col("a.tok") < col("b.tok"))
          .groupBy(col("a.tok").as("t1"), col("b.tok").as("t2"))
          .agg(count(lit(1)).as("c_ab"))
          .join(broadcast(ca.withColumnRenamed("tok", "t1").withColumnRenamed("c", "c_a")), "t1")
          .join(broadcast(ca.withColumnRenamed("tok", "t2").withColumnRenamed("c", "c_b")), "t2")
          .crossJoin(broadcast(n))
          .withColumn("pmi", round(expr(
            "CAST(round(ln(CAST(n_docs AS DOUBLE) * c_ab / (CAST(c_a AS DOUBLE) * c_b)) * 1e6, 0) AS BIGINT) / 1e6"), 6))
          .select("t1", "t2", "c_ab", "c_a", "c_b", "pmi")
          .orderBy(col("c_ab").desc, col("t1"), col("t2"))
          .limit(30)
      },
      Some("""WITH dt AS (
             |  SELECT DISTINCT doc_id, tok FROM (
             |    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)),
             |ca AS (SELECT tok, COUNT(*) AS c FROM dt GROUP BY tok),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |pairs AS (
             |  SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS c_ab
             |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
             |  GROUP BY a.tok, b.tok)
             |SELECT t1, t2, c_ab, x.c AS c_a, y.c AS c_b,
             |  round(CAST(round(ln(CAST(n_docs AS DOUBLE) * c_ab / (CAST(x.c AS DOUBLE) * y.c)) * 1e6) AS BIGINT) / 1e6, 6) AS pmi
             |FROM pairs JOIN ca x ON x.tok = t1 JOIN ca y ON y.tok = t2
             |CROSS JOIN n
             |ORDER BY c_ab DESC, t1, t2 LIMIT 30""".stripMargin))
  )
}
