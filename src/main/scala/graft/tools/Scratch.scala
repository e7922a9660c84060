package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad. Current check: driver-shaped vanilla session (no
  * GraftExtensions) must run entry() and every query, including the
  * cosine_sim UDF fallback path. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    println("entry rows: " + graft.SparkEntry.entry(spark).count())
    println("extension present: " + spark.catalog.functionExists("cosine_sim"))
    for (q <- Seq("q_sim_cosine", "q_sim_ivf", "q_minhash_sig", "q_agg_topk_sketch")) {
      val n = graft.SparkEntry.queries(q)(spark, sf).count()
      println(s"$q rows: $n")
    }
    spark.stop()
  }
}
