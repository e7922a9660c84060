package graft

import org.scalatest.funsuite.AnyFunSuite

/** Trained quality classifier: the GD run must genuinely LEARN (beat the
  * majority-class floor), be deterministic across runs (the cross-engine
  * oracle depends on it), and keep driver state bounded to the weight
  * vector between jobs.
  */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("training beats the majority-class floor on the length label") {
    val rows = SparkEntry.queries("q_quality_classifier")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows("n_rows")
    val base = Tables.documents(spark, sf)
      .selectExpr("CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y")
      .groupBy("y").count().collect().map(_.getLong(1)).max
    assert(rows("n_correct") > base,
      s"n_correct ${rows("n_correct")} must beat the majority floor $base of $n")
  }

  test("the length weight is positive and dominates — the model learned the label's axis") {
    val (w, _, _) = operators.Classifier.train(spark, sf)
    assert(w(1) > 0.0, s"w1 (scaled length) must be positive, got ${w(1)}")
    assert(w.forall(x => !x.isNaN && !x.isInfinite), w.mkString(","))
    assert(math.abs(w(1)) > math.abs(w(2)),
      "length must outweigh the stopword ratio for a length label")
  }

  test("no sigmoid evaluation sits near a 1e-6 quantization cell edge") {
    // The cross-engine oracle assumes Spark's and DuckDB's exp() agree
    // within the 1e-6 sigmoid grid — true only when no σ(z)·1e6 value
    // lands within ~an ulp (~1e-10) of a round() flip boundary. Assert
    // the fixture's measured margins are ≥ 6 orders of magnitude wider,
    // and that the final sign decision is equally far from z = 0.
    val (sigMargin, zMargin) = operators.Classifier.determinismMargins(spark, sf)
    assert(sigMargin > 1e-4,
      s"σ·1e6 came within $sigMargin of a round() boundary — widen the grid")
    assert(zMargin > 1e-4,
      s"a decision z came within $zMargin of 0 — the accuracy count could flip")
  }

  test("training is bit-deterministic across runs (oracle contract)") {
    val a = operators.Classifier.train(spark, sf)
    val b = operators.Classifier.train(spark, sf)
    assert(a._1.toSeq === b._1.toSeq)
    assert((a._2, a._3) === ((b._2, b._3)))
  }
}
