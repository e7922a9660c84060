package graft

import graft.operators.Dedup
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of graft's custom MinHash-LSH against Spark ML's
  * independent implementation (`org.apache.spark.ml.feature.MinHashLSH`,
  * the built-in SURVEY.md §2.2 names as the alternative): two unrelated
  * codebases, seeds and hash families must agree on which documents are
  * near-duplicates.
  */
class MlCrossCheckSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("spark.ml MinHashLSH recovers the pairs our LSH found") {
    val ours = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ours.nonEmpty)

    val shingled = Dedup.shingleFrame(spark, sf).select("doc_id", "g")
    val tf = new HashingTF().setInputCol("g").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 18)
    val feats = tf.transform(shingled)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("sig")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(feats)
    // jaccard distance 0.5 == our jaccard >= 0.5 threshold
    val mlPairs = model.approxSimilarityJoin(feats, feats, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recovered = ours.intersect(mlPairs)
    assert(recovered.size >= (ours.size * 0.8).toInt,
      s"ml found ${mlPairs.size}, ours ${ours.size}, overlap ${recovered.size}")
  }
}
