package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate clustering: connected components over the verified
  * MinHash pair relation ([[Dedup.minhashPairs]]), turning pairwise
  * "A ≈ B" hits into dedup groups with one representative per group —
  * the step every production dedup pipeline runs between "find pairs"
  * and "drop copies" (pairs alone over-delete: A≈B, B≈C must keep ONE
  * of {A,B,C}, not one per pair). The reference has no graph ops; this
  * is extension surface over `documents`.
  *
  * Algorithm: iterative min-label propagation with pointer jumping —
  * the standard shuffle-based connected components (cf. the
  * "large-star/small-star" family): every vertex starts labeled with
  * itself; each round takes the min label over {self} ∪ neighbors
  * (one equi-join + combinable min-aggregate), then compresses paths by
  * looking the new label up in the same label table (second equi-join).
  * With compression the label tree halves in height every round, so
  * convergence needs O(log(diameter)) rounds, each a bounded number of
  * keyed shuffles over |V|+|E| rows — no stage ever holds a whole
  * component, which is what survives 100 TB (components can be huge;
  * vertices-per-partition stays flat). The driver-side loop carries
  * only a changed-row count per round (an aggregate, not data), and
  * each round's result is cached + the previous round released, so
  * lineage stays shallow (at cluster scale you'd checkpoint every ~10
  * rounds — noted, irrelevant at the ≤ `maxIter` depths here).
  *
  * The DuckDB oracle computes the same fixpoint declaratively with a
  * recursive CTE (min reachable vertex id per vertex) — a different
  * evaluation strategy arriving at the identical labeling is exactly
  * what the cross-engine gate is for.
  */
object Clustering {

  /** Connected components of an undirected edge list (`a`, `b`):
    * returns (v, cluster) with cluster = min vertex id reachable from v.
    * Only vertices appearing in some edge are labeled (isolated docs are
    * their own trivial cluster and never enter the graph).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Symmetric edge relation: propagation must flow both directions.
    val edges = pairs.selectExpr("a AS src", "b AS dst")
      .union(pairs.selectExpr("b AS src", "a AS dst"))
      .cache()
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("lab", col("v"))
      .cache()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min over self + neighbor labels — a keyed join and a combinable
      // aggregate; nothing materializes a whole component anywhere.
      val nbr = edges
        .join(labels.withColumnRenamed("v", "dst"), "dst")
        .select(col("src").as("v"), col("lab"))
      val minLab = labels.union(nbr).groupBy("v").agg(min("lab").as("lab"))
      // pointer jumping: lab(v) <- lab(lab(v)); halves tree height.
      val jumped = minLab.as("x")
        .join(minLab.select(col("v").as("lv"), col("lab").as("llab")).as("y"),
          col("x.lab") === col("y.lv"), "left")
        .select(col("x.v").as("v"), coalesce(col("y.llab"), col("x.lab")).as("lab"))
        .cache()
      changed = jumped.withColumnRenamed("lab", "nl")
        .join(labels.withColumnRenamed("lab", "ol"), "v")
        .filter(col("nl") =!= col("ol"))
        .count()
      labels.unpersist()
      labels = jumped
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Shared oracle text: recursive min-reachability labeling over the
    * verified pair CTEs. Ends in `cc(v, cluster)`. */
  private def duckCcCtes: String =
    s"""${Dedup.duckVerifiedPairsCtes},
       |edges AS (SELECT a AS src, b AS dst FROM verified
       |          UNION ALL SELECT b, a FROM verified),
       |reach(v, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT reach.v, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
       |cc AS (SELECT v, MIN(r) AS cluster FROM reach GROUP BY v)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Cluster assignment: every near-duplicated document with its
    // component representative (min doc_id) and the component size.
    QueryDef(
      "q_dedup_cc",
      (s, d) => {
        val cc = connectedComponents(Dedup.minhashPairs(s, d).select("a", "b"))
        val sizes = cc.groupBy("lab").agg(count(lit(1)).as("cluster_size"))
        cc.join(sizes, "lab")
          .selectExpr("v AS doc_id", "lab AS cluster", "cluster_size")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $duckCcCtes,
              |sizes AS (SELECT cluster, COUNT(*) AS cluster_size FROM cc GROUP BY cluster)
              |SELECT cc.v AS doc_id, cc.cluster AS cluster, sizes.cluster_size
              |FROM cc JOIN sizes ON cc.cluster = sizes.cluster
              |ORDER BY doc_id""".stripMargin)),

    // Corpus-level dedup outcome: keep one representative per component
    // plus every unclustered document; report how much survives. The
    // kept-id checksum pins the exact survivor SET, not just its size.
    QueryDef(
      "q_dedup_survivors",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id")
        val cc = connectedComponents(Dedup.minhashPairs(s, d).select("a", "b"))
        val removed = cc.filter(col("v") =!= col("lab")).select(col("v").as("doc_id"))
        docs.join(removed, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).cast("bigint").as("kept_checksum"))
          .crossJoin(docs.agg(count(lit(1)).as("n_total")))
          .selectExpr("n_total", "n_kept", "n_total - n_kept AS n_removed", "kept_checksum")
      },
      Some(s"""WITH RECURSIVE $duckCcCtes,
              |removed AS (SELECT v AS doc_id FROM cc WHERE v <> cluster),
              |kept AS (SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM removed))
              |SELECT (SELECT COUNT(*) FROM documents) AS n_total,
              |       COUNT(*) AS n_kept,
              |       (SELECT COUNT(*) FROM documents) - COUNT(*) AS n_removed,
              |       CAST(SUM(doc_id) AS BIGINT) AS kept_checksum
              |FROM kept""".stripMargin))
  )
}
