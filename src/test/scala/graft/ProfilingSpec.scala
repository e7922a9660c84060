package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the approx-distinct profile's estimation contract: the headline
  * q_profile_approx has no DuckDB oracle (Spark's HLL++ estimate is not
  * reproducible in DuckDB SQL), so this spec is its correctness gate —
  * every per-column estimate must land within the configured 2%-rsd
  * sketch's practical error (≤ 5%) of the exact q_profile_table counts,
  * at two scale factors.
  */
class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(sf: String): Unit = {
    val exact = SparkEntry.queries("q_profile_table")(spark, sf)
      .select("col_name", "n_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_profile_approx")(spark, sf)
      .select("col_name", "approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, n) =>
      val est = approx(c)
      assert(math.abs(est - n) <= math.max(1L, (0.05 * n).toLong),
        s"$sf/$c: approx $est vs exact $n")
    }
  }

  test("approx profile distinct counts land within 5% of exact (sf0.001)") {
    check("/root/testdata/sf0.001")
  }

  test("approx profile distinct counts land within 5% of exact (sf0.01)") {
    check("/root/testdata/sf0.01")
  }
}
