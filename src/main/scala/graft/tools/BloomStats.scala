package graft.tools

import graft.Tables
import graft.functions.{BloomFilterAgg, GraftFunctions}
import org.apache.spark.sql.functions._

/** Measures the bloom prune's selectivity — rows scanned vs rows
  * surviving the probe vs exact members — for the two [[graft.operators.BloomPrune]]
  * entries, at the sf dir given as arg 0. The operator's 100 TB claim
  * ("reject the non-matching majority before any exchange") must be a
  * number in BASELINE.md, not a comment; this prints it.
  */
object BloomStats {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    BloomFilterAgg.ensureRegistered(spark)
    GraftFunctions.ensureBloomProbe(spark)

    // q_join_bloom: urgent-order keys vs the lineitem scan
    val keys = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = keys.agg(expr("bloom_agg(o_orderkey)").as("bits"))
    val li = Tables.lineitem(spark, d)
    val scanned = li.count()
    val survived = li.crossJoin(broadcast(bloom))
      .filter(expr("bloom_might_contain(bits, l_orderkey)")).count()
    val exact = li.join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    println(f"[bloomstats] q_join_bloom sf=$d build=${keys.count()} " +
      f"scanned=$scanned survived=$survived exact=$exact " +
      f"pruned=${100.0 * (scanned - survived) / scanned}%.2f%% " +
      f"fp_overhead=${if (exact == 0) 0.0 else 100.0 * (survived - exact) / exact}%.2f%%")

    // q_decontaminate_bloom: eval digests vs the corpus scan
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("dg"), xxhash64(col("text")).as("k"))
    val ev = docs.filter(col("doc_id") % 97 === 0)
    val dBloom = ev.agg(expr("bloom_agg(k)").as("bits"))
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val cScanned = corpus.count()
    val cSurvived = corpus.crossJoin(broadcast(dBloom))
      .filter(expr("bloom_might_contain(bits, k)")).count()
    val cExact = corpus.join(ev.select("dg").distinct(), Seq("dg"), "left_semi").count()
    println(f"[bloomstats] q_decontaminate_bloom sf=$d build=${ev.count()} " +
      f"scanned=$cScanned survived=$cSurvived exact=$cExact " +
      f"pruned=${100.0 * (cScanned - cSurvived) / cScanned}%.2f%%")
    spark.stop()
  }
}
