package graft

import java.sql.Timestamp

import graft.streaming.{EventStreams, StreamingTwins}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class EventRow(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

final case class DocRow(doc_id: Long, text: String, lang: String, source: String)

/** Live Structured Streaming behavior, driven with MemoryStream and
  * asserted against the batch twins (SURVEY.md §5: streaming tests via
  * MemoryStream "asserting window/watermark/late-data behavior against
  * batch twins").
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** events table rows in event-time order, as case classes. */
  private lazy val orderedEvents: Seq[EventRow] = {
    Tables.events(spark, sf)
      .orderBy("ts", "event_id")
      .collect()
      .map(r => EventRow(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSeq
  }

  /** Far-future sentinel that pushes every real window past the
    * watermark so append mode emits them all. */
  private def sentinel: EventRow =
    EventRow(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0)

  /** Run a streaming transform over the ordered events + sentinel via
    * MemoryStream, return the collected sink minus sentinel artifacts. */
  private def runStream(name: String, transform: DataFrame => DataFrame,
      chunks: Int = 3): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = transform(mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val n = orderedEvents.size
      val step = math.max(1, n / chunks)
      orderedEvents.grouped(step).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      mem.addData(Seq(sentinel))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  test("tumbling windows: streamed append result equals the batch twin") {
    val streamed = runStream("t_tumble", EventStreams.tumblingAgg)
      .filter(col("wstart") < "2029-01-01")
    val batch = StreamingTwins.defs.find(_.name == "q_stream_tumble").get
      .fn(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("sliding windows: streamed append result equals the batch twin") {
    val streamed = runStream("t_slide", EventStreams.slidingAgg)
      .filter(col("wstart") < "2029-01-01")
    val batch = StreamingTwins.defs.find(_.name == "q_stream_slide").get
      .fn(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("session windows: streamed append result equals the batch twin") {
    val streamed = runStream("t_session", EventStreams.sessionAgg)
      .filter(col("user_id") >= 0)
    val batch = StreamingTwins.defs.find(_.name == "q_stream_session").get
      .fn(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
  }

  test("session windows hold under the RocksDB state store provider") {
    // the production state backend at 100 TB: keyed state spills to
    // local RocksDB instead of living on the JVM heap (heap state is
    // bounded by executor memory; RocksDB state is bounded by disk).
    // The provider must be a pure swap — identical results to the
    // default HDFS-backed heap provider on the same input.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamed = runStream("t_session_rocks", EventStreams.sessionAgg)
        .filter(col("user_id") >= 0)
      val batch = StreamingTwins.defs.find(_.name == "q_stream_session").get
        .fn(spark, sf)
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0L)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming dedup keeps the first arrival per (user, type)") {
    val streamed = runStream("t_dedup", EventStreams.dedupStream)
      .filter(col("user_id") >= 0)
    val batch = StreamingTwins.defs.find(_.name == "q_stream_dedup").get
      .fn(spark, sf)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
  }

  test("stream-stream join: purchase attribution equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.purchaseAttribution(mem.toDF())
      .writeStream.format("memory").queryName("t_ssjoin").outputMode("append").start()
    try {
      val n = orderedEvents.size
      orderedEvents.grouped(math.max(1, n / 3)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
      mem.addData(Seq(sentinel))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_ssjoin").filter(col("user_id") >= 0)
    val batch = graft.streaming.EventStreams.purchaseAttribution(
      Tables.events(spark, sf))
    assert(batch.count() > 0L)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("flatMapGroupsWithState keeps running per-user totals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = graft.streaming.EventStreams.runningTotals(
        mem.toDF().as[graft.streaming.StreamEvent])
      .writeStream.format("memory").queryName("t_state").outputMode("append").start()
    try {
      val n = orderedEvents.size
      orderedEvents.grouped(math.max(1, n / 4)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    // last emission per user == batch aggregate (quantized cents)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    val finalTotals = spark.table("t_state")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "n_events", "total_cents")
    val batch = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("total_cents"))
    assert(finalTotals.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(finalTotals).count() === 0L)
  }

  test("watermark drops late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val q = EventStreams.tumblingAgg(mem.toDF())
      .writeStream.format("memory").queryName("t_late").outputMode("append").start()
    try {
      mem.addData(Seq(
        EventRow(1, Timestamp.valueOf("2024-01-01 00:10:00"), 1, "click", 1.0),
        EventRow(2, Timestamp.valueOf("2024-01-01 00:20:00"), 1, "click", 2.0)))
      q.processAllAvailable()
      // advance the watermark far past the first window...
      mem.addData(Seq(EventRow(3, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "click", 3.0)))
      q.processAllAvailable()
      // ...then send an event 12h late into the closed window: dropped.
      mem.addData(Seq(EventRow(4, Timestamp.valueOf("2024-01-01 00:30:00"), 1, "late", 99.0)))
      q.processAllAvailable()
      mem.addData(Seq(sentinel))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_late")
      .filter(col("wstart") === "2024-01-01 00:00:00").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("n") === 2L) // the late event never counted
  }

  test("checkpointed query restarts with no loss and no duplication") {
    // The production concern behind the reference's forever-running EMR
    // stream: kill the query mid-stream, restart from the checkpoint,
    // and the union of emitted batches must still equal the batch twin.
    // The sink keys captured rows by batchId — the standard idempotent-
    // sink discipline, since a recovered query MAY replay its last
    // uncommitted batch.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mem = MemoryStream[EventRow]
    val captured = scala.collection.mutable.Map.empty[Long, Seq[(Timestamp, Long, Double)]]
    def start() = EventStreams.tumblingAgg(mem.toDF())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val rows = batch.collect().toSeq
          .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
        captured.synchronized { captured(id) = rows }
        ()
      }
      .start()

    val (firstHalf, secondHalf) = orderedEvents.splitAt(orderedEvents.size / 2)
    val q1 = start()
    try { mem.addData(firstHalf); q1.processAllAvailable() } finally q1.stop()
    // restart from the checkpoint: offsets + watermark come back from the
    // commit log, the source replays anything uncommitted
    val q2 = start()
    try {
      mem.addData(secondHalf)
      q2.processAllAvailable()
      mem.addData(Seq(sentinel))
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = captured.synchronized {
      captured.values.flatten.toSeq
    }.toDF("wstart", "n", "sum_value")
      .filter(col("wstart") < "2029-01-01") // drop sentinel artifacts
    val batchTwin = EventStreams.tumblingAgg(
      Tables.events(spark, sf)).filter(col("wstart") < "2029-01-01")
    assert(streamed.count() === batchTwin.count())
    assert(streamed.exceptAll(batchTwin).count() === 0L)
    assert(batchTwin.exceptAll(streamed).count() === 0L)
  }

  test("foreachBatch streaming merge converges to the batch latest-per-key state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The streaming MERGE pattern: each micro-batch reconciles the
    // incoming changes against the previous state version and writes
    // the next — versioned paths, no read-modify-write on one dir (a
    // lazy read over the path being overwritten would corrupt it).
    // After the stream drains, the maintained state must equal the
    // batch latest-row-per-key selection over the same events.
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val base = java.nio.file.Files.createTempDirectory("graft_cdc_state").toString
    @volatile var version = -1L
    val mem = MemoryStream[EventRow]
    val q = mem.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val incoming = batch.select(cols.map(col): _*)
        val prev =
          if (version < 0) incoming.limit(0)
          else spark.read.parquet(s"$base/v$version").select(cols.map(col): _*)
        incoming.unionByName(prev)
          .withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
          .write.mode("overwrite").parquet(s"$base/v$batchId")
        version = batchId
        ()
      }
      .start()
    try {
      orderedEvents.grouped(math.max(1, orderedEvents.size / 4)).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(version >= 0)
    val streamed = spark.read.parquet(s"$base/v$version")
    val batchTruth = Tables.events(spark, sf).select(cols.map(col): _*)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
    assert(streamed.count() === batchTruth.count())
    assert(streamed.exceptAll(batchTruth).count() === 0L)
    assert(batchTruth.exceptAll(streamed).count() === 0L)
  }

  test("versioned merge sink survives stop/restart from checkpoint and batch replay with no duplicate effects") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val base = java.nio.file.Files.createTempDirectory("graft_merge_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_merge_ckpt").toString
    val mem = MemoryStream[EventRow]
    def start() = mem.toDF().writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        EventStreams.latestPerKeyMerge(base)(b, id)
      }
      .start()
    def latestVersion: Long = new java.io.File(base).listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.drop(1).toLong).max

    val chunks = orderedEvents.grouped(math.max(1, orderedEvents.size / 4)).toSeq
    // half the stream, then a forced stop mid-flight
    val q1 = start()
    try {
      chunks.take(2).foreach { c => mem.addData(c); q1.processAllAvailable() }
    } finally q1.stop()
    // resume from the checkpoint: batch ids continue, the sink recovers
    // its state version from durable markers (not driver memory)
    val q2 = start()
    try {
      chunks.drop(2).foreach { c => mem.addData(c); q2.processAllAvailable() }
    } finally q2.stop()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val truth = Tables.events(spark, sf).select(cols.map(col): _*)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
    val vFinal = latestVersion
    val streamed = spark.read.parquet(s"$base/v$vFinal")
    assert(streamed.count() === truth.count())
    assert(streamed.exceptAll(truth).count() === 0L)
    assert(truth.exceptAll(streamed).count() === 0L)

    // at-least-once redelivery: merge a full duplicate of every event as
    // a later batch — latest-per-key state must be byte-identical
    EventStreams.latestPerKeyMerge(base)(
      orderedEvents.toDF().select(cols.map(col): _*), vFinal + 1)
    val replayed = spark.read.parquet(s"$base/v${vFinal + 1}")
    assert(replayed.count() === truth.count())
    assert(replayed.exceptAll(truth).count() === 0L)
    assert(truth.exceptAll(replayed).count() === 0L)
  }

  test("rate-limited replay: the reference's 2 msg/s producer envelope through streamConsume") {
    // The reference's incremental producer emits ~2 msg/s
    // (04_temincrementaltem.py:19, 500 ms sleep). Twin it as a rate
    // source — the unbounded analogue of the throttled driver loop —
    // shaped to the sensor wire format and fed through the real
    // streamConsume pipeline (parse → Tem(Avg) → coalesce(1) → append
    // sink) with a 1 s trigger standing in for the reference's 1 min.
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "2").load()
      .selectExpr("CAST(value AS STRING) AS key",
        "to_json(named_struct('id', CAST(value AS INT))) AS value")
    val q = graft.reference.TemPipelines.streamConsume(
      rate,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      format = "memory",
      queryName = "t_rate_replay",
      options = Map.empty)
    try {
      val deadline = System.currentTimeMillis() + 8000
      while (System.currentTimeMillis() < deadline &&
             spark.table("t_rate_replay").count() < 8L) Thread.sleep(250)
      val rows = spark.table("t_rate_replay")
      // ids survive the wire round-trip in order 0,1,2,...
      val got = rows.select("id").collect().map(_.getInt(0)).sorted
      assert(got.length >= 8, s"only ${got.length} rows after 8s at 2 msg/s")
      assert(got.toSeq === (0 until got.length), "replay lost or reordered ids")
      // pacing evidence without wall-clock sensitivity (a GC pause can
      // legitimately make one batch drain several seconds of backlog):
      // the rows arrived spread across multiple micro-batches, not in
      // one burst — the throttled-replay property itself.
      val batches = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batches.length >= 3,
        s"expected a paced multi-batch stream, got batches ${batches.mkString(",")}")
      assert(batches.max < got.length,
        s"one batch carried the whole replay: ${batches.mkString(",")}")
    } finally q.stop()
  }

  test("streaming latency: micro-batch processing stays inside the reference's trigger envelope") {
    // The reference's one published envelope is 2 msg/s into 60 s
    // micro-batches ≈ 120 rows per trigger (04_temincrementaltem.py:19,
    // 03_temStreamEveryMin.py:97); it never measured the processing
    // side. This does: same ~120 rows/batch through the real
    // streamConsume pipeline at a 60×-compressed 1 s trigger, reading
    // per-batch triggerExecution from the progress log. Steady-state
    // batches must complete inside the 1 s trigger — i.e. the engine
    // keeps up with the envelope at 60× the reference's pressure; the
    // measured numbers are committed to BASELINE.md (streaming-latency
    // row).
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "120").load()
      .selectExpr("CAST(value AS STRING) AS key",
        "to_json(named_struct('id', CAST(value AS INT))) AS value")
    val q = graft.reference.TemPipelines.streamConsume(
      rate,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      format = "memory",
      queryName = "t_latency",
      options = Map.empty)
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (System.currentTimeMillis() < deadline &&
             q.recentProgress.count(_.numInputRows > 0) < 6) Thread.sleep(250)
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      assert(prog.length >= 4, s"only ${prog.length} non-empty batches in 20 s")
      val durs = prog.flatMap(p => Option(p.durationMs.get("triggerExecution")).map(_.toLong))
      // first batch pays plan compile + sink init; steady state is the claim
      val steady = durs.drop(1)
      assert(steady.nonEmpty)
      val sorted = steady.sorted
      val median = sorted(sorted.length / 2)
      info(s"triggerExecution ms per batch: ${durs.mkString(",")} (median $median)")
      assert(steady.forall(_ < 1000),
        s"a steady-state micro-batch overran the 1 s trigger: ${durs.mkString(",")}")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join and holds no stream state") {
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val streamed = runStream("t_enrich", EventStreams.enrichWithDim(_, dim))
      .filter(col("event_type") =!= "sentinel")
    val batch = EventStreams.enrichWithDim(Tables.events(spark, sf), dim)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("streaming corpus admission equals the batch twin across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
    // delta fed in doc_id order — the stream's first-arrival-wins then
    // matches the twin's first-by-doc_id-wins exactly
    val delta = docs.filter(col("doc_id") % 10 === 7)
      .select("doc_id", "text", "lang", "source")
      .orderBy("doc_id")
      .collect()
      .map(r => DocRow(r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq
    val base = docs.filter(col("doc_id") % 10 =!= 7)
      .select(sha2(col("text"), 256).as("dg")).distinct()
    val mem = MemoryStream[DocRow]
    val q = EventStreams.admitDocs(mem.toDF(), base)
      .writeStream.format("memory").queryName("t_admit").outputMode("append").start()
    try {
      val step = math.max(1, delta.size / 3)
      delta.grouped(step).foreach { chunk =>
        mem.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("t_admit")
    val batch = StreamingTwins.defs.find(_.name == "q_stream_admit").get.fn(spark, sf)
      .select("doc_id", "lang", "source")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }
}
