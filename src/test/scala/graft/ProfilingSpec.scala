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
}
