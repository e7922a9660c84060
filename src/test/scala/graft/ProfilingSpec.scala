package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the approx-distinct profile's estimation contract from the
  * Scala side (the DuckDB oracle checks the same contract per engine):
  * the query's own `approx_ok` boolean must hold for every column, its
  * exact `n_distinct` (computed by the Expand-free two-level
  * aggregation) must agree with q_profile_table's countDistinct, at two
  * scale factors.
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(sf: String): Unit = {
    val exact = SparkEntry.queries("q_profile_table")(spark, sf)
      .select("col_name", "n_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("q_profile_approx")(spark, sf)
      .select("col_name", "n_distinct", "approx_ok").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rows.keySet === exact.keySet)
    exact.foreach { case (c, n) =>
      val (nd, ok) = rows(c)
      assert(nd === n, s"$sf/$c: two-level exact $nd vs countDistinct $n")
      assert(ok, s"$sf/$c: HLL estimate outside 5% of exact $n")
    }
  }

  test("approx profile distinct counts land within 5% of exact (sf0.001)") {
    check("/root/testdata/sf0.001")
  }

  test("approx profile distinct counts land within 5% of exact (sf0.01)") {
    check("/root/testdata/sf0.01")
  }

  test("per-group OLS: valid r2, positive slope, and the fit passes through the means") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_ols_group")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val means = Tables.documents(spark, sf)
      .selectExpr("lang", "CAST(size(split(text, ' ')) AS DOUBLE) AS x",
        "CAST(n_chars AS DOUBLE) AS y")
      .groupBy("lang").agg(avg("x").as("mx"), avg("y").as("my"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (lang, n, slope, intercept, r2) =>
      assert(n > 1L)
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"$lang r2=$r2")
      assert(slope > 0.0, s"$lang: chars must grow with tokens, slope=$slope")
      // OLS identity: the fitted line passes through (x̄, ȳ)
      val (mx, my) = means(lang)
      assert(math.abs(intercept + slope * mx - my) < 1e-6,
        s"$lang fit misses the means: ${intercept + slope * mx} vs $my")
    }
  }
}
