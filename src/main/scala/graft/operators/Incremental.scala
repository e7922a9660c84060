package graft.operators

import graft.{Parity, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Incremental aggregation — the snapshot-plus-delta pattern that turns
  * a 100 TB nightly recompute into a delta-sized merge: keep per-group
  * PARTIAL aggregate state (sum/count/min/max — the combinable half of
  * any algebraic aggregate), aggregate only the new partition, and
  * merge states. The reference's incremental producer
  * (`04_temincrementaltem.py`) re-reads and re-ships the whole CSV
  * every cycle — this is the operator it was missing.
  *
  * The merge is a unionByName of two partial-state frames followed by
  * the combining aggregate — no join, one shuffle of |groups| rows.
  * The oracle is the definition itself: merged state must equal the
  * full recompute bit-for-bit (decimal sums make that exact), which is
  * also the invariant an incremental pipeline must re-certify after
  * every schema or logic change.
  */
object Incremental {

  val defs: Seq[QueryDef] = Seq(

    // Split lineitem into a 6-year "base" and a final-years "delta" on
    // ship date, aggregate each independently, merge the partial
    // states, and emit the merged per-flag totals. The DuckDB oracle
    // computes the same totals in ONE pass over the union — equality
    // proves the state merge is lossless.
    QueryDef(
      "q_incremental_agg",
      (s, d) => {
        val cut = "DATE '1999-01-01'"
        def partial(pred: String) = Tables.lineitem(s, d)
          .filter(expr(pred))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("p_n"),
            // partial decimal sums stay in the exact domain until the
            // final cast — merging quantized doubles would NOT be exact
            sum(col("l_quantity").cast("decimal(28,2)")).as("p_qty"),
            sum(col("l_extendedprice").cast("decimal(28,2)")).as("p_price"),
            min(col("l_shipdate")).as("p_min_d"),
            max(col("l_shipdate")).as("p_max_d"))
        val base  = partial(s"l_shipdate <  $cut")
        val delta = partial(s"l_shipdate >= $cut")
        base.unionByName(delta)
          .groupBy("l_returnflag")
          .agg(sum(col("p_n")).cast("bigint").as("n"),
            sum(col("p_qty")).cast("double").as("sum_qty"),
            sum(col("p_price")).cast("double").as("sum_price"),
            min(col("p_min_d")).as("first_ship"),
            max(col("p_max_d")).as("last_ship"))
          .orderBy("l_returnflag")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
              |  ${Parity.sqlDsum("l_quantity", 2)} AS sum_qty,
              |  ${Parity.sqlDsum("l_extendedprice", 2)} AS sum_price,
              |  MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Chi-square independence screen: is event_type independent of the
    // day-of-week? The contingency table is one count aggregate; the
    // statistic folds per-cell (observed−expected)²/expected with each
    // cell's contribution micro-quantized (expected = row·col/N is an
    // exact double over integer marginals, so quantization is the only
    // cross-engine degree of freedom). Emits the statistic with its
    // degrees of freedom — the profiling pass that flags drifting
    // event mixes at ingest time.
    QueryDef(
      "q_chi2",
      (s, d) => {
        val obs = Tables.events(s, d)
          .selectExpr("event_type", "dayofweek(ts) AS dow")
          .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
        val rowTot = obs.groupBy("event_type").agg(sum(col("o")).cast("bigint").as("rt"))
        val colTot = obs.groupBy("dow").agg(sum(col("o")).cast("bigint").as("ct"))
        val n = obs.agg(sum(col("o")).cast("bigint").as("n_tot"))
        obs.join(broadcast(rowTot), "event_type")
          .join(broadcast(colTot), "dow")
          .crossJoin(broadcast(n))
          .withColumn("cell_micro", expr(
            "CAST(round(pow(o - CAST(rt AS DOUBLE) * ct / n_tot, 2) " +
              "/ (CAST(rt AS DOUBLE) * ct / n_tot) * 1e6, 0) AS BIGINT)"))
          .agg(round(sum(col("cell_micro")) / 1e6, 6).as("chi2"),
            ((countDistinct(col("event_type")) - 1) *
              (countDistinct(col("dow")) - 1)).as("dof"))
      },
      Some("""WITH obs AS (
             |  SELECT event_type, dayofweek(ts) AS dow, COUNT(*) AS o
             |  FROM events GROUP BY 1, 2),
             |rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
             |ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
             |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n_tot FROM obs)
             |SELECT
             |  round(SUM(CAST(round(pow(o - CAST(rt AS DOUBLE) * ct / n_tot, 2)
             |    / (CAST(rt AS DOUBLE) * ct / n_tot) * 1e6) AS BIGINT)) / 1e6, 6) AS chi2,
             |  (COUNT(DISTINCT obs.event_type) - 1) * (COUNT(DISTINCT obs.dow) - 1) AS dof
             |FROM obs JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN n""".stripMargin))
  )
}
