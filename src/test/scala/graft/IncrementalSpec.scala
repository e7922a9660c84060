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

  test("HLL sketch store survives sessions: appended by one session, unioned by another, from bytes alone") {
    // The true incremental pipeline q_agg_hll_persist's single plan
    // can't fully witness: session A stores the FIRST half of days,
    // session B (fresh) appends the rest without reading A's frames,
    // session C (fresh again) answers the global distinct from the
    // stored bytes alone. Tolerance follows the q_agg_hll_merge
    // contract (5% vs exact; union-vs-one-shot within 2%).
    val dir = s"${sys.props("java.io.tmpdir")}/graft_hll_store/spec_${TmpSlices.key(sf)}"
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val midDay = ev.selectExpr("CAST(percentile(unix_date(day), 0.5) AS INT) AS m")
      .head().getInt(0)
    ev.filter(expr(s"unix_date(day) <= $midDay"))
      .groupBy("day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val b = spark.newSession()
    Tables.events(b, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .filter(expr(s"unix_date(day) > $midDay"))
      .groupBy("day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .write.mode("append").parquet(dir)
    val c = spark.newSession()
    val est = c.read.parquet(dir)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0).toDouble
    val nExact = ev.agg(countDistinct("user_id")).head().getLong(0)
    val oneShot = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head().getLong(0).toDouble
    val nDaysStored = c.read.parquet(dir).count()
    val nDays = ev.select("day").distinct().count()
    assert(nDaysStored === nDays,
      s"store has $nDaysStored day sketches, corpus has $nDays days")
    assert(math.abs(est - nExact) <= nExact * 0.05,
      s"from-store union $est vs exact $nExact")
    assert(math.abs(est - oneShot) <= math.max(oneShot * 0.02, 1.0),
      s"from-store union $est vs one-shot $oneShot")
  }
}
