package graft.tools

import graft.Tables
import graft.operators.Similarity.sparkDot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for cross-engine expression equivalence checks. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val n = Tables.embeddings(spark, "/root/testdata/sf0.01").selectExpr(
      "vec_id", "embedding", s"sqrt(${sparkDot("embedding", "embedding")}) AS nrm")
    val q = n.filter(col("vec_id") === 36)
      .select(col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val c = n.filter(col("vec_id") === 499)
      .select(col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    q.crossJoin(c).selectExpr(
      s"${sparkDot("q_emb", "c_emb")} AS d", "q_nrm", "c_nrm",
      s"${sparkDot("q_emb", "c_emb")} / (q_nrm * c_nrm) AS cosine")
      .show(false)
    spark.stop()
  }
}
