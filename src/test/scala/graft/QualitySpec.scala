package graft

import org.scalatest.funsuite.AnyFunSuite

/** Data-quality audit family: value assertions on the planted
  * violations (counts probed independently via DuckDB during design)
  * plus the plan shapes that make the audits scan-shaped at 100 TB.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("constraint audit finds the planted violations and pins them by checksum") {
    val rows = SparkEntry.queries("q_dq_audit")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // customer acctbal genuinely goes negative in the generator data
    assert(rows("customer_acctbal_nonneg")._1 > 0)
    // a firing rule must carry a non-zero key checksum (pins WHICH rows)
    assert(rows("customer_acctbal_nonneg")._2 > 0)
    // events.value is strictly positive — the rule fires zero times
    assert(rows("events_value_positive") === ((0L, 0L)))
  }

  test("orphan audit: childless orders exist; lineitem and custkey FKs hold") {
    val rows = SparkEntry.queries("q_dq_orphans")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("orders_without_lineitem") > 0)
    assert(rows("lineitem_orphan_order") === 0L)
    assert(rows("orders_orphan_customer") === 0L)
  }

  test("uniqueness audit: single-column PKs hold; the composite lineitem key is genuinely violated") {
    val rows = SparkEntry.queries("q_dq_unique")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    Seq("orders_pk", "events_pk", "documents_pk").foreach { k =>
      val (n, keys, dups, mult) = rows(k)
      assert(dups === 0L && n === keys && mult === 1L, s"$k: ${rows(k)}")
    }
    // the generator reuses linenumbers within an order — the audit's job
    // is to surface exactly this kind of silent key-contract breach
    val (n, keys, dups, mult) = rows("lineitem_pk")
    assert(dups > 0L && keys < n && mult >= 2L, s"lineitem_pk: ${rows("lineitem_pk")}")
  }

  test("entropy is bounded by ln(n_distinct) and top_share is a valid majority bound") {
    SparkEntry.queries("q_dq_entropy")(spark, sf).collect().foreach { r =>
      val (nd, h, top) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-6, s"H=$h nd=$nd")
      assert(top >= 1.0 / nd - 1e-9 && top <= 1.0)
    }
  }

  test("orphan anti-join shuffles distinct child keys, not child rows") {
    val p = SparkEntry.queries("q_dq_orphans")(spark, sf)
      .queryExecution.executedPlan.toString
    // the distinct() aggregate must sit below the anti join
    assert(p.contains("HashAggregate"), s"plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"plan:\n$p")
  }

  test("constraint audit fuses all rules per table into one scan each") {
    val p = SparkEntry.queries("q_dq_audit")(spark, sf)
      .queryExecution.executedPlan.toString
    // three audited tables → exactly three parquet scans in the plan
    assert("Scan parquet".r.findAllIn(p).size === 3, s"plan:\n$p")
  }

  test("dp counts: bounded deterministic noise, correct release arithmetic") {
    val rows = SparkEntry.queries("q_dp_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, t, noise, noisy) =>
      assert(math.abs(noise) <= 40, s"$lang noise $noise outside the truncated support")
      assert(noisy === t + noise)
    }
    // the mechanism genuinely perturbs (all-zero noise on 5 langs has
    // probability ~3e-4 — and the fixture is fixed, so this is a pin,
    // not a flake)
    assert(rows.exists(_._3 != 0), "no lang drew non-zero noise")
    // threshold table is a valid CDF: strictly increasing, spans 2^60
    val t = operators.Quality.dpThresholds
    assert(t === t.sorted && t.distinct.size === t.size)
    assert(t.last <= (1L << 60) - 1 && t.head > 0L)
    val rerun = SparkEntry.queries("q_dp_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq === rerun.toSeq)
  }
}
