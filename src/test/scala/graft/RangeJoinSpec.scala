package graft

import org.scalatest.funsuite.AnyFunSuite

/** The custom-planned broadcast range join (graft.plans): the node must
  * actually plan to its exec (not fall back), return exactly what the
  * built-in BNLJ formulation returns, and honor the edge semantics
  * (inclusive bounds, NULL bounds match nothing, overlapping intervals
  * multiply, empty build joins nothing).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import plans.RangeJoins.broadcastRangeJoin

  test("the query plans through BroadcastRangeJoinExec, not a nested loop") {
    val win = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS lo").distinct()
      .selectExpr("lo", "lo + INTERVAL 3 DAYS AS hi")
    val probe = Tables.lineitem(spark, sf).select("l_shipdate", "l_extendedprice")
    val joined = broadcastRangeJoin(probe, win, "l_shipdate", "lo", "hi")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("custom exec returns exactly the built-in range join's rows") {
    val win = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS lo").distinct()
      .selectExpr("lo", "lo + INTERVAL 3 DAYS AS hi")
    val probe = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    val custom = broadcastRangeJoin(probe, win, "l_shipdate", "lo", "hi")
      .select("l_orderkey", "l_linenumber", "lo")
      .collect().map(_.toString).sorted
    val builtin = probe.join(win,
        org.apache.spark.sql.functions.col("l_shipdate") >= org.apache.spark.sql.functions.col("lo")
          && org.apache.spark.sql.functions.col("l_shipdate") <= org.apache.spark.sql.functions.col("hi"))
      .select("l_orderkey", "l_linenumber", "lo")
      .collect().map(_.toString).sorted
    assert(custom.length === builtin.length)
    assert(custom.sameElements(builtin))
    assert(custom.nonEmpty, "degenerate fixture: no range matches at all")
  }

  test("inclusive bounds, overlap multiplicity, and null bounds on a hand frame") {
    import spark.implicits._
    val probe = Seq(5L, 10L, 20L, 31L).toDF("p")
    val build = Seq(
      (1L, 10L),            // covers 5, 10 (both ends inclusive)
      (10L, 30L),           // covers 10, 20 — overlaps the first at 10
      (25L, 28L)            // covers nothing in the probe
    ).toDF("lo", "hi")
      .unionByName(Seq((Option.empty[Long], Option(99L))).toDF("lo", "hi"))
    val got = broadcastRangeJoin(probe, build, "p", "lo", "hi")
      .select("p", "lo").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq((5L, 1L), (10L, 1L), (10L, 10L), (20L, 10L)))
  }

  test("empty build side joins nothing") {
    import spark.implicits._
    val probe = Seq(1L, 2L).toDF("p")
    val build = Seq.empty[(Long, Long)].toDF("lo", "hi")
    assert(broadcastRangeJoin(probe, build, "p", "lo", "hi").count() === 0L)
  }

  test("asof mode picks exactly the latest version at-or-before, dropping pre-first rows") {
    import spark.implicits._
    import plans.RangeJoins.broadcastAsofJoin
    val probe = Seq(5L, 10L, 15L, 2L).toDF("p")
    val build = Seq((3L, "v1"), (10L, "v2"), (12L, "v3")).toDF("t", "ver")
    val got = broadcastAsofJoin(probe, build, "p", "t")
      .select("p", "ver").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    // 2 precedes every version and drops; 10 matches v2 exactly (<=);
    // 15 takes v3, 5 takes v1
    assert(got.toSeq === Seq((5L, "v1"), (10L, "v2"), (15L, "v3")))
  }

  test("the optimizer rule pushes single-sided filters through the node into the scan") {
    val win = Tables.orders(spark, sf)
      .selectExpr("date_trunc('month', o_orderdate) AS lo").distinct()
      .selectExpr("lo", "lo + INTERVAL 3 DAYS AS hi")
    val probe = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_shipdate", "l_quantity")
    val filtered = broadcastRangeJoin(probe, win, "l_shipdate", "lo", "hi")
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 24)
    // the probe-side predicate must cross the custom node and land in
    // the parquet scan — without RangeJoinFilterPushdown it evaluates
    // post-join and PushedFilters stays empty for l_quantity
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,24"), plan)
    // and the optimized logical plan has no Filter above the join node
    val optimized = filtered.queryExecution.optimizedPlan
    val joinIsTop = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[plans.BroadcastRangeJoin] => f
    }
    assert(joinIsTop.isEmpty, s"filter still above the range join:\n$optimized")
    // semantics unchanged: equals the unpushed formulation
    val expect = probe.filter(org.apache.spark.sql.functions.col("l_quantity") > 24)
      .join(win, org.apache.spark.sql.functions.col("l_shipdate") >= org.apache.spark.sql.functions.col("lo")
        && org.apache.spark.sql.functions.col("l_shipdate") <= org.apache.spark.sql.functions.col("hi"))
      .count()
    assert(filtered.count() === expect)
  }
}
