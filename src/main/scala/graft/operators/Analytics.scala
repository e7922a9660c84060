package graft.operators

import graft.{Parity, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Composed multi-join analytics in classic TPC-H shapes (Q3/Q5/Q6
  * adapted to the synthetic star schema) — the "whole queries a user
  * actually runs" layer over the per-operator surface, and the shapes
  * that exercise Catalyst's join ordering, semi-join reduction and
  * scan pruning together.
  *
  * Scale notes: Q3/Q5 join fact←dim chains — dims broadcast, the two
  * fact tables shuffle once on the join key each; Q6 is the pure
  * scan-predicate-aggregate shape whose entire cost is the pruned
  * parquet scan (PushedFilters + 4-column ReadSchema).
  */
object Analytics {
  import Parity._

  val defs: Seq[QueryDef] = Seq(

    // Q3: shipping-priority revenue — segment-filtered customers' orders
    // not yet shipped at the cutoff, top-10 by revenue.
    QueryDef(
      "q_tpch_q3",
      (s, d) => Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey")
            && col("o_orderdate") < lit("1996-06-01").cast("timestamp"))
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") > lit("1996-06-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some(s"""SELECT l_orderkey, o_orderdate,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey AND o_orderdate < TIMESTAMP '1996-06-01'
              |JOIN lineitem ON o_orderkey = l_orderkey AND l_shipdate > TIMESTAMP '1996-06-01'
              |WHERE c_mktsegment = 'BUILDING'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // Q5: local-supplier revenue by nation within one region and year —
    // the 6-table chain with the customer-nation = supplier-nation
    // equality that prunes cross-nation pairs.
    QueryDef(
      "q_tpch_q5",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey")
            && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some(s"""SELECT n_name,
              |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              |JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // Q6: forecasting revenue change — the pure pruned-scan aggregate.
    QueryDef(
      "q_tpch_q6",
      (s, d) => Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_discount").between(0.05, 0.07)
            && col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
          count(lit(1)).as("n")),
      Some(s"""SELECT ${sqlDsum("l_extendedprice * l_discount", 4)} AS revenue, COUNT(*) AS n
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // Q17: small-quantity-order revenue — the CORRELATED-subquery
    // shape (per-part threshold 0.2·avg(l_quantity)), decorrelated the
    // way Catalyst/every MPP engine does it: the inner aggregate
    // becomes a grouped frame joined back on the correlation key. Plan
    // discipline at 100 TB: the brand filter prunes part FIRST and the
    // surviving keys broadcast into both fact passes (threshold agg +
    // probe), so the FACT ROWS NEVER SHUFFLE — the only exchange
    // anywhere is the map-side-combined per-part avg (~parts-per-brand
    // rows), which broadcasts back as the threshold. Two pruned scans
    // beat one windowed pass here: a window over l_partkey would push
    // every branded fact row through a shuffle to attach its
    // threshold. No per-row subquery re-execution anywhere.
    // Decimal-exact avg (Parity) keeps the threshold bit-equal to
    // DuckDB's correlated evaluation.
    QueryDef(
      "q_tpch_q17",
      (s, d) => {
        val branded = Tables.part(s, d)
          .filter(col("p_brand") === "Brand#12").select("p_partkey")
        val li = Tables.lineitem(s, d)
          .join(broadcast(branded), col("l_partkey") === col("p_partkey"))
        val thr = li.groupBy("l_partkey")
          .agg((lit(0.2) * davg(col("l_quantity"), 2)).as("q_thr"))
          .withColumnRenamed("l_partkey", "t_partkey")
        li.join(broadcast(thr), col("l_partkey") === col("t_partkey"))
          .filter(col("l_quantity") < col("q_thr"))
          .agg((dsum(col("l_extendedprice"), 2) / 7.0).as("avg_yearly"))
      },
      Some(s"""SELECT ${sqlDsum("l_extendedprice", 2)} / 7.0 AS avg_yearly
              |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              |WHERE p.p_brand = 'Brand#12'
              |  AND l.l_quantity < (
              |    SELECT 0.2 * ${sqlDavg("l2.l_quantity", 2)}
              |    FROM lineitem l2 JOIN part p2 ON p2.p_partkey = l2.l_partkey
              |    WHERE l2.l_partkey = p.p_partkey AND p2.p_brand = 'Brand#12')""".stripMargin)),

    // Q18: large-volume customers — the group-HAVING-semi-join
    // composition (orders whose lineitems sum past a quantity
    // threshold, joined back to customer detail). Plan discipline: the
    // HAVING aggregate runs FIRST and produces a qualifying-key frame
    // (map-side-combined sum over l_orderkey, then the filter) that
    // joins back into the detail chain — the fact table is aggregated
    // once and never re-scanned for the detail rows' quantities (the
    // per-order sum rides the qualifying frame). No broadcast hint:
    // the threshold decides the qualifying cardinality, so AQE picks
    // broadcast only when the runtime size actually fits.
    QueryDef(
      "q_tpch_q18",
      (s, d) => {
        val qualifying = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(dsum(col("l_quantity"), 2).as("total_qty"))
          .filter(col("total_qty") > 150)
        Tables.orders(s, d)
          .join(qualifying, col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some(s"""WITH q AS (
              |  SELECT l_orderkey, ${sqlDsum("l_quantity", 2)} AS total_qty
              |  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150)
              |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
              |FROM orders JOIN q ON o_orderkey = q.l_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // Audience overlap: |users(A) ∩ users(B)| for every unordered pair
    // of event types — the segment-intersection matrix a growth team
    // reads before targeting (do purchasers also view? do errors hit
    // signups?). The distinct (user, type) relation self-joins on
    // user_id with ta < tb, so the quadratic term is per-USER (≤ 5
    // types → ≤ 10 pairs per user), keyed by user — never cross-user.
    // Sizes ride along; jaccard = inter / (na + nb − inter) is one
    // exact integer division published as double.
    QueryDef(
      "q_audience_overlap",
      (s, d) => {
        val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
        val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
        val pairs = ut.as("a")
          .join(ut.as("b"),
            col("a.user_id") === col("b.user_id")
              && col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
          .agg(count(lit(1)).as("inter"))
        pairs
          .join(broadcast(sizes.select(col("event_type").as("ta"), col("n").as("na"))), "ta")
          .join(broadcast(sizes.select(col("event_type").as("tb"), col("n").as("nb"))), "tb")
          .selectExpr("ta", "tb", "na", "nb", "inter",
            "CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard")
          .orderBy("ta", "tb")
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
             |sizes AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
             |pairs AS (
             |  SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS inter
             |  FROM ut a JOIN ut b
             |    ON a.user_id = b.user_id AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT ta, tb, sa.n AS na, sb.n AS nb, inter,
             |  CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
             |FROM pairs JOIN sizes sa ON sa.event_type = ta
             |           JOIN sizes sb ON sb.event_type = tb
             |ORDER BY ta, tb""".stripMargin)),

    // -- behavioral / growth analytics over the event log ----------------
    // The query family every event pipeline runs at scale; all three
    // reduce the raw log with a per-user aggregate FIRST (one keyed
    // shuffle over users, not events), then operate on the ≪-sized
    // user/day/cohort frames. Global windows only ever sit on
    // aggregates (the PlanSpec rule).

    // New users per day + cumulative growth curve.
    QueryDef(
      "q_first_seen_daily",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, d)
          .groupBy("user_id").agg(min(col("ts")).as("first_ts"))
          .select(to_date(col("first_ts")).as("d"))
          .groupBy("d").agg(count(lit(1)).as("n_new"))
          .withColumn("cum_users", sum(col("n_new")).over(w))
          .orderBy("d")
      },
      Some("""WITH firsts AS (
             |  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
             |daily AS (
             |  SELECT CAST(first_ts AS DATE) AS d, COUNT(*) AS n_new
             |  FROM firsts GROUP BY 1)
             |SELECT d, n_new,
             |  CAST(SUM(n_new) OVER (ORDER BY d
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM daily ORDER BY d""".stripMargin)),

    // Weekly cohort retention: users bucketed by first-seen week; how
    // many of each cohort are active k weeks later.
    QueryDef(
      "q_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
        val firsts = ev.groupBy("user_id").agg(min(col("week")).as("cohort"))
        ev.join(firsts, "user_id")
          .withColumn("k", (datediff(col("week"), col("cohort")) / 7).cast("int"))
          .groupBy("cohort", "k")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort", "k")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
             |firsts AS (SELECT user_id, MIN(week) AS cohort FROM ev GROUP BY user_id)
             |SELECT cohort, CAST(date_diff('day', cohort, week) / 7 AS INT) AS k,
             |  COUNT(DISTINCT ev.user_id) AS n_active
             |FROM ev JOIN firsts USING (user_id)
             |GROUP BY 1, 2 ORDER BY cohort, k""".stripMargin)),

    // Ordered conversion funnel view → click → purchase: one conditional
    // per-user aggregate pass, then a strict time-order predicate per
    // stage (a user converts at stage n only through the ordered chain).
    QueryDef(
      "q_funnel",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("tv"),
          min(when(col("event_type") === "click", col("ts"))).as("tc"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        .agg(
          count(lit(1)).as("n_users"),
          sum(when(col("tv").isNotNull, 1L).otherwise(0L)).cast("bigint").as("n_view"),
          sum(when(col("tv").isNotNull && col("tc") > col("tv"), 1L).otherwise(0L))
            .cast("bigint").as("n_view_click"),
          sum(when(col("tv").isNotNull && col("tc") > col("tv") && col("tp") > col("tc"), 1L)
            .otherwise(0L)).cast("bigint").as("n_full_funnel")),
      Some("""WITH u AS (
             |  SELECT user_id,
             |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv,
             |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS tc,
             |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
             |  FROM events GROUP BY user_id)
             |SELECT COUNT(*) AS n_users,
             |  CAST(SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
             |  CAST(SUM(CASE WHEN tv IS NOT NULL AND tc > tv THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
             |  CAST(SUM(CASE WHEN tv IS NOT NULL AND tc > tv AND tp > tc THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
             |FROM u""".stripMargin)),

    // Last-touch attribution — the oracle-checked batch twin of the
    // watermarked stream-stream join ([[graft.streaming.EventStreams
    // .purchaseAttribution]], same 24-hour window): each purchase is
    // attributed to the user's LATEST signup in (p_ts - 24h, p_ts],
    // chosen deterministically (max (s_ts, signup_id) struct — ids
    // break timestamp ties). The band join is an equi-join on user_id
    // with a range residual, so it shuffles each side once on the user
    // key — per-user event counts bound the pair fan-out, never N².
    // Latencies subtract truncated epoch seconds (DuckDB's
    // boundary-crossing date_diff, same equivalence q_sessionize pins).
    QueryDef(
      "q_attrib_last_touch",
      (s, d) => {
        val ev = Tables.events(s, d)
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
            col("event_id").as("signup_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
            col("event_id").as("purchase_id"), col("value"))
        val last = purchases.join(signups,
            col("p_user") === col("s_user")
              && col("s_ts") <= col("p_ts")
              && col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
          .groupBy("purchase_id")
          .agg(max(struct(col("s_ts"), col("signup_id"))).as("m"))
          .select(col("purchase_id"), col("m.signup_id").as("signup_id"),
            col("m.s_ts").as("s_ts"))
        purchases.join(last, Seq("purchase_id"), "left")
          .groupBy(to_date(col("p_ts")).as("day"))
          .agg(count(lit(1)).as("n_purchases"),
            count(col("signup_id")).as("n_attributed"),
            sum(col("signup_id")).cast("bigint").as("signup_checksum"),
            sum(col("p_ts").cast("long") - col("s_ts").cast("long"))
              .cast("bigint").as("total_latency_s"),
            dsum(col("value")).as("sum_value"))
          .orderBy("day")
      },
      Some(s"""WITH s AS (SELECT user_id AS s_user, ts AS s_ts, event_id AS signup_id
              |          FROM events WHERE event_type = 'signup'),
              |p AS (SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id, value
              |      FROM events WHERE event_type = 'purchase'),
              |last AS (
              |  SELECT purchase_id, signup_id, s_ts FROM (
              |    SELECT purchase_id, signup_id, s_ts,
              |      ROW_NUMBER() OVER (PARTITION BY purchase_id
              |        ORDER BY s_ts DESC, signup_id DESC) AS rn
              |    FROM p JOIN s ON p_user = s_user
              |      AND s_ts <= p_ts AND s_ts >= p_ts - INTERVAL 24 HOURS)
              |  WHERE rn = 1)
              |SELECT CAST(p_ts AS DATE) AS day, COUNT(*) AS n_purchases,
              |  COUNT(signup_id) AS n_attributed,
              |  CAST(SUM(signup_id) AS BIGINT) AS signup_checksum,
              |  CAST(SUM(date_diff('second', s_ts, p_ts)) AS BIGINT) AS total_latency_s,
              |  ${sqlDsum("value")} AS sum_value
              |FROM p LEFT JOIN last USING (purchase_id)
              |GROUP BY CAST(p_ts AS DATE) ORDER BY day""".stripMargin)),

    // Market-basket co-occurrence: the top-20 part pairs bought in the
    // same order — the support-counting core of frequent-itemset
    // mining. The self-join keys on l_orderkey, so BOTH sides shuffle
    // on the same key (one exchange, reused) and the quadratic term is
    // per-BASKET, not per-table: an order with B distinct parts emits
    // B(B-1)/2 pairs (~6 here; a production run caps pathological
    // baskets first, the q_dedup_substring frequency-cap move). The
    // pair counts aggregate map-side; TakeOrdered keeps 20.
    QueryDef(
      "q_basket_pairs",
      (s, d) => {
        val items = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val x = items.select(col("l_orderkey"), col("l_partkey").as("pa"))
        val y = items.select(col("l_orderkey").as("ok2"), col("l_partkey").as("pb"))
        x.join(y, col("l_orderkey") === col("ok2") && col("pa") < col("pb"))
          .groupBy("pa", "pb")
          .agg(count(lit(1)).as("support"))
          .orderBy(col("support").desc, col("pa"), col("pb"))
          .limit(20)
      },
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             |SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS support
             |FROM items x JOIN items y
             |  ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
             |GROUP BY 1, 2
             |ORDER BY support DESC, pa, pb LIMIT 20""".stripMargin))
  )
}
