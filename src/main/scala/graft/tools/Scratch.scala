package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway experiment harness for plan iteration (not part of the
  * query surface; kept out of Bench/Verify). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val s = graft.GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    }

    val toksF = graft.Tables.documents(s, d)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
    val keyed = graft.Tables.documents(s, d).selectExpr(
      "doc_id",
      "substring(array_join(array_sort(split(text, ' ')), ' '), 1, 64) AS skey")
      .withColumn("blk", element_at(split(col("skey"), " "), 1))
    val w = Window.partitionBy("blk").orderBy("skey", "doc_id")
    val nb = keyed
      .withColumn("n1_id", lead(col("doc_id"), 1).over(w))
      .withColumn("n2_id", lead(col("doc_id"), 2).over(w))
    def cand = nb.filter(col("n1_id").isNotNull)
      .select(col("doc_id").as("a_id"), col("n1_id").as("b_id"))
      .unionAll(nb.filter(col("n2_id").isNotNull)
        .select(col("doc_id").as("a_id"), col("n2_id").as("b_id")))
    def joined = cand
      .join(toksF.select(col("doc_id").as("a_id"), col("toks").as("ta")), "a_id")
      .join(toksF.select(col("doc_id").as("b_id"), col("toks").as("tb")), "b_id")
    def scored = joined
      .selectExpr("a_id", "b_id",
        "CAST(size(array_intersect(ta, tb)) AS DOUBLE) " +
          "/ size(array_distinct(concat(ta, tb))) AS jac")
      .filter(col("jac") >= 0.6)

    time("keyed")(keyed.queryExecution.toRdd.count())
    time("cand")(cand.queryExecution.toRdd.count())
    time("joined")(joined.queryExecution.toRdd.count())
    time("scored")(scored.queryExecution.toRdd.count())
    time("full")(graft.SparkEntry.queries("q_dedup_sorted_neighborhood")(s, d)
      .queryExecution.toRdd.count())
    s.stop()
  }
}
