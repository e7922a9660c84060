package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // stage 1: tokens only
    time("tokens")(graft.Tables.documents(spark, d)
      .repartition(32).selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("sum(size(toks))").collect())
    // stage 2: shingle strings
    time("shingles")(graft.Tables.documents(spark, d)
      .repartition(32).selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", "array_distinct(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))) AS g")
      .selectExpr("sum(size(g))").collect())
    // stage 3: + md5 hashing
    time("hashes")(graft.operators.Dedup.shingleFrame(spark, d)
      .selectExpr("sum(size(hs))").collect())
    spark.catalog.clearCache()
    // stage 4: + 16 minhash mins
    val sigExprs = Dedup.MinhashPerms.map { case (a, b) =>
      s"array_min(transform(hs, s -> ($a * s + $b) % ${Dedup.MinhashP}))" }
    time("sigs")(graft.operators.Dedup.shingleFrame(spark, d)
      .selectExpr("doc_id", s"array(${sigExprs.mkString(", ")}) AS sig")
      .selectExpr("sum(sig[0])").collect())
    spark.catalog.clearCache()
    // full query
    time("full")(graft.SparkEntry.queries("q_dedup_minhash")(spark, d).count())
    spark.stop()
  }
}
