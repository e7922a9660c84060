package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental aggregation: the partial-state merge must equal the
  * single-pass recompute exactly — and do it without a join.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("merged base+delta state equals the one-pass full aggregate bit-for-bit") {
    val merged = SparkEntry.queries("q_incremental_agg")(spark, sf)
    val full = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(28,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(28,2)")).cast("double").as("sum_price"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy("l_returnflag")
    assert(merged.exceptAll(full).count() === 0L)
    assert(full.exceptAll(merged).count() === 0L)
  }

  test("the state merge is a union + combine, never a join") {
    val p = SparkEntry.queries("q_incremental_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Union"), s"plan:\n$p")
    assert(!p.contains("Join"), s"plan:\n$p")
  }

  test("chi-square emits a non-negative statistic with the right degrees of freedom") {
    val r = SparkEntry.queries("q_chi2")(spark, sf).collect()(0)
    assert(r.getDouble(0) >= 0.0)
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    val dows = Tables.events(spark, sf)
      .selectExpr("dayofweek(ts) AS d").distinct().count()
    assert(r.getLong(1) === (types - 1) * (dows - 1))
  }
}
