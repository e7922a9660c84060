package graft.streaming

import graft.Parity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The live Structured Streaming surface (SURVEY.md §2.2 "Streaming" —
  * everything the reference's stateless stream lacks: watermarks,
  * event-time windows, sessionization, streaming dedup).
  *
  * Each transform takes an unbounded (or bounded — the expressions are
  * mode-agnostic) events frame with columns (event_id, ts, user_id,
  * event_type, value) and returns the aggregated frame; sources/sinks
  * stay outside so tests drive them with `MemoryStream` + memory sink
  * and production wires Kafka/files. The ScalaTest harness asserts each
  * streamed result equals its batch twin in
  * [[StreamingTwins]] — same `window()` expression, same data.
  *
  * State-size notes for the 100 TB mindset: every operator below keys
  * its state by (window × key) with a watermark bound, so state is
  * O(active windows × keys), never O(events); the watermark is what lets
  * Spark drop closed windows — without it a streaming groupBy grows
  * unboundedly and complete-mode recomputes everything per trigger.
  */
object EventStreams {

  /** Tumbling 1-hour event-time aggregation; late data beyond 1 hour is
    * dropped once the watermark passes the window end. */
  def tumblingAgg(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), Parity.dsum(col("value"), 2).as("sum_value"))
      .select(col("window.start").as("wstart"), col("n"), col("sum_value"))

  /** Sliding (1 hour, every 30 min) variant. */
  def slidingAgg(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), Parity.dsum(col("value"), 2).as("sum_value"))
      .select(col("window.start").as("wstart"), col("n"), col("sum_value"))

  /** Per-user session windows with a 2-hour inactivity gap. */
  def sessionAgg(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "2 hours"))
      .agg(count(lit(1)).as("n"), Parity.dsum(col("value"), 2).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n"), col("sum_value"))

  /** Streaming dedup: first record per (user_id, event_type) within the
    * watermark horizon — `dropDuplicates` keeps the first arrival, which
    * equals the batch first-by-event-time twin when the source replays
    * in event-time order. */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"),
        col("event_id").as("first_event_id"), col("ts").as("first_ts"))

  /** Stream-stream inner join with event-time bounds: each purchase
    * joins the signups of the same user within the preceding 24 hours.
    * Both sides carry watermarks, and the time-bound condition is what
    * lets Spark expire join state — an unbounded-condition
    * stream-stream join would buffer forever. Works identically on
    * bounded frames (the batch twin the test compares against).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("signup_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(signups,
      col("p_user") === col("s_user")
        && col("s_ts") <= col("p_ts")
        && col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
      .select(col("purchase_id"), col("signup_id"), col("p_user").as("user_id"),
        col("p_ts"), col("s_ts"))
  }

  /** Stream-static enrichment: the streaming fact joins a bounded
    * dimension snapshot — the most common production join (enrich
    * clickstream with the user/account table). Stateless on the stream
    * side (no watermark needed, append passes through); the static side
    * broadcasts per micro-batch, so dimension updates between batches
    * are picked up and no join state accumulates — at scale this is a
    * map-side hash join inside every micro-batch.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"))

  /** Streaming corpus admission (batch twin: q_stream_admit): digest
    * each arriving document, keep only the first occurrence of a digest
    * within the stream, then admit digests absent from the static base
    * corpus via a stream-static LEFT ANTI join. The base side is a
    * precomputed digest index at scale; the anti join holds no stream
    * state, so the only per-record cost is one hash probe — the same
    * admission decision q_dedup_incremental makes in batch, emitted per
    * micro-batch.
    *
    * First-occurrence state is keyed flatMapGroupsWithState rather than
    * `dropDuplicates`: dropDuplicates keeps an ARBITRARY row per digest
    * when two same-text docs land in one micro-batch (partition order),
    * while the batch twin keeps the min-doc_id row — this picks the
    * min-doc_id row within each batch, so the admitted doc_id is
    * deterministic and the stream/batch parity is exact, not
    * order-lucky. State per digest is one boolean (production bounds it
    * with a TTL'd state store, as dropDuplicates would need a watermark
    * for the same reason). */
  def admitDocs(delta: DataFrame, baseDigests: DataFrame): DataFrame = {
    import delta.sparkSession.implicits._
    val firsts = delta.withColumn("dg", sha2(col("text"), 256))
      .select(col("dg"), col("doc_id").cast("long").as("doc_id"),
        col("lang"), col("source"))
      .as[(String, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long, String, String)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(rows.minBy(_._2)) }
      }
    firsts.toDF("dg", "doc_id", "lang", "source")
      .join(baseDigests, Seq("dg"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Restart-idempotent streaming MERGE sink (a `foreachBatch` body):
    * micro-batch `b` reconciles its rows against the latest COMMITTED
    * state version strictly below `b` and overwrites `v<b>`.
    *
    * The restart discipline, all structural — no driver memory:
    *  - batch ids are monotonic across checkpoint restarts, so the
    *    latest committed version below the incoming id IS the pre-crash
    *    state (an in-memory "current version" variable would reset to
    *    nothing on restart and silently drop all accumulated state);
    *  - a recovered query may REPLAY its last uncommitted batch
    *    (at-least-once delivery): the replay reads the same prev
    *    (versions < b are untouched by b's own write) and
    *    deterministically overwrites its own output — duplicate effects
    *    are impossible by construction, not by dedup bookkeeping;
    *  - `_SUCCESS` gates committed versions, so a crash mid-write is
    *    never read back as state.
    *
    * Merge rule: latest row per user_id by (ts, event_id). StreamingSpec
    * kills and resumes the query mid-stream from the checkpoint and then
    * replays a full duplicate batch; the state must equal the batch
    * latest-per-key twin throughout.
    */
  def latestPerKeyMerge(base: String)(
      batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val incoming = batch.select(cols.map(col): _*)
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sessionState.newHadoopConf())
    val prevVersion =
      if (!fs.exists(basePath)) None
      else fs.listStatus(basePath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("v")
          && fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .flatMap(st => scala.util.Try(st.getPath.getName.drop(1).toLong).toOption)
        .filter(_ < batchId)
        .sorted.lastOption
    val prev = prevVersion.fold(incoming.limit(0))(v =>
      spark.read.parquet(s"$base/v$v").select(cols.map(col): _*))
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    incoming.unionByName(prev)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
      .write.mode("overwrite").parquet(s"$base/v$batchId")
    ()
  }

  /** Arbitrary keyed state via flatMapGroupsWithState (SURVEY.md §2.2:
    * "arbitrary state — only if a declared op needs it"): per-user
    * running totals that survive across micro-batches. The monetary sum
    * accumulates as floor-quantized cents so the result is independent
    * of intra-batch iteration order — the same discipline as the
    * oracle-checked aggregates. State is one small record per user;
    * each batch emits that user's updated snapshot (append mode).
    */
  def runningTotals(events: org.apache.spark.sql.Dataset[StreamEvent]):
      org.apache.spark.sql.Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[StreamEvent],
         state: org.apache.spark.sql.streaming.GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0L))
          val upd = it.foldLeft(prev) { (acc, e) =>
            UserTotals(uid, acc.n_events + 1,
              acc.total_cents + math.floor(e.value * 100).toLong)
          }
          state.update(upd)
          Iterator.single(upd)
      }
  }
}

/** Typed event row for the stateful operators. */
final case class StreamEvent(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Per-user running state snapshot emitted by
  * [[EventStreams.runningTotals]]. */
final case class UserTotals(user_id: Long, n_events: Long, total_cents: Long)
