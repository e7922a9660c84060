package graft.operators

import graft.{Parity, QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Time-series regularization: resample to a fixed grid with gap fill —
  * the step between raw event logs and anything windowed/learned on
  * them (a rolling feature over a series with silent gaps is wrong;
  * the gaps must become explicit zero/carried rows first). The
  * reference replays streams but never regularizes them
  * (`temDataRead.py:61-72` ships rows as they come); extension surface
  * over `events`.
  *
  * Scale design: bucketing is a stateless per-row truncation
  * (epoch-aligned `window()`, same grid as the streaming twins); the
  * spine is generated per-entity from its own [min, max] span
  * (`sequence()` explode — rows ∝ buckets actually needed, never
  * |entities| × global-span); the gap join is a keyed left join on
  * (entity, bucket); forward fill is a per-entity ordered window. Every
  * stage partitions by entity — no global anything.
  */
object TimeSeries {

  val defs: Seq[QueryDef] = Seq(

    // 6-hour resample per user: zero-filled counts and forward-carried
    // last observed bucket sum over each user's active span.
    QueryDef(
      "q_ts_resample",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val agg = Tables.events(s, d)
          .groupBy(col("user_id"), window(col("ts"), "6 hours").getField("start").as("bucket"))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("value"), 2).as("sum_value"))
        val spine = agg.groupBy("user_id")
          .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
          .selectExpr("user_id", "explode(sequence(b0, b1, interval 6 hours)) AS bucket")
        val w = Window.partitionBy("user_id").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0)
        spine.join(agg, Seq("user_id", "bucket"), "left")
          .withColumn("n", coalesce(col("n"), lit(0L)))
          .withColumn("ffill_value", last(col("sum_value"), ignoreNulls = true).over(w))
          .select("user_id", "bucket", "n", "ffill_value")
          .orderBy("user_id", "bucket")
      },
      Some(s"""WITH agg AS (
              |  SELECT user_id, time_bucket(INTERVAL 6 HOUR, ts) AS bucket,
              |    COUNT(*) AS n, ${Parity.sqlDsum("value", 2)} AS sum_value
              |  FROM events GROUP BY 1, 2),
              |spine AS (
              |  SELECT user_id, UNNEST(generate_series(b0, b1, INTERVAL 6 HOUR)) AS bucket
              |  FROM (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
              |        FROM agg GROUP BY user_id))
              |SELECT spine.user_id, spine.bucket, COALESCE(agg.n, 0) AS n,
              |  last_value(agg.sum_value IGNORE NULLS) OVER (
              |    PARTITION BY spine.user_id ORDER BY spine.bucket
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
              |FROM spine LEFT JOIN agg
              |  ON agg.user_id = spine.user_id AND agg.bucket = spine.bucket
              |ORDER BY spine.user_id, spine.bucket""".stripMargin))
  )
}
