package graft

import org.scalatest.funsuite.AnyFunSuite

/** CDC family: the merge classes genuinely partition the key space,
  * SCD2 ranges tile each user's timeline without overlap, and
  * sessionization accounting adds back up to the event count.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("merge classifies every customer exactly once and all classes fire") {
    val rows = SparkEntry.queries("q_merge_upsert")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet.subsetOf(Set("inserted", "updated", "carried", "unchanged")))
    Seq("inserted", "updated", "carried").foreach { a =>
      assert(rows.getOrElse(a, 0L) > 0L, s"class $a never fires")
    }
    // the merged key space is exactly the customers active before the
    // batch window closes (later-only customers are future inserts)
    val n = SparkEntry.queries("q_merge_upsert")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_keys")).collect()(0).getLong(0)
    val expected = Tables.orders(spark, sf)
      .filter("o_orderdate < DATE '1997-01-01'")
      .select("o_custkey").distinct().count()
    assert(n === expected)
  }

  test("scd2 segments tile each user's history: versions dense, ranges ordered, one open segment") {
    val rows = SparkEntry.queries("q_scd2")(spark, sf).collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, segs) =>
      val sorted = segs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to segs.length), s"user $u versions")
      // adjacent segments: valid_to of one IS valid_from of the next
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) === b.getTimestamp(3), s"user $u gap/overlap")
          assert(a.getString(2) !== b.getString(2), s"user $u non-change segment")
        case _ =>
      }
      assert(sorted.last.isNullAt(4), s"user $u open segment missing")
      assert(sorted.init.forall(!_.isNullAt(4)), s"user $u extra open segment")
    }
  }

  test("sessionization accounting: len×sessions sums back to the event count") {
    val rows = SparkEntry.queries("q_sessionize")(spark, sf).collect()
    val total = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(total === Tables.events(spark, sf).count())
    // durations are non-negative and bounded by len-1 × the 30-min gap
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L)
      assert(r.getLong(2) <= r.getLong(1) * (r.getLong(0) - 1) * 1800L)
    }
  }

  test("merge latest-row selection and join both shuffle on the entity key only") {
    val p = SparkEntry.queries("q_merge_upsert")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"plan:\n$p")
    // rank-window survivor selection plans as WindowGroupLimit pushdown
    assert(p.contains("WindowGroupLimit"), s"plan:\n$p")
  }

  test("snapshot diff: all four planted classes fire and partition the key space") {
    val rows = SparkEntry.queries("q_snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set("added", "removed", "changed", "unchanged"))
    rows.foreach { case (k, (n, cks)) =>
      assert(n > 0L, s"class $k empty — the planted fixture broke")
      assert(cks > 0L, s"class $k carries no key checksum")
    }
    // the classes partition doc_id space: %10∈{7}→added, {4}→removed,
    // {3}→changed, rest unchanged — totals must sum to the table
    val total = Tables.documents(spark, sf).count()
    assert(rows.values.map(_._1).sum === total)
  }
}
