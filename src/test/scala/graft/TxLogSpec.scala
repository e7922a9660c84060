package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import operators.TxLog
import operators.TxLog.Act

/** The transactional commit protocol under REAL concurrency: the
  * oracle entry q_tx_commit scripts its interleaving for determinism;
  * these tests race actual threads over the atomic slot claim and the
  * full optimistic-commit loop.
  */
class TxLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshLog(tag: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_txlog/spec_$tag"
    val p = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.isDirectory(p)) {
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally st.close()
    }
    dir
  }

  test("slot claim is atomic: 16 threads race one version, exactly one wins") {
    val log = freshLog("race_slot")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(16)
    val threads = (0 until 16).map { i =>
      new Thread(() => {
        barrier.await()
        if (TxLog.tryCommit(log, 0, Seq(Act("add", "p", s"f$i")))) wins.incrementAndGet()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() === 1, "create-exclusive must admit exactly one winner")
    assert(TxLog.versions(log) === Seq(0))
    // the winner's manifest is intact (no torn write from the losers)
    assert(TxLog.readActs(log, 0).length === 1)
  }

  test("concurrent append storm: every blind-append writer lands, zero aborts, all files visible") {
    val log = freshLog("race_storm")
    assert(TxLog.tryCommit(log, 0, Seq(Act("add", "base", "f_base"))))
    val n = 12
    val committed = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val aborted = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        // every writer snapshots the SAME stale version 0 and appends
        // its own partition — disjoint, so the rebase loop must carry
        // all of them through whatever interleaving the race produces
        TxLog.commit(log, 0, Seq(Act("add", s"part_$i", s"f_$i")), Set(s"part_$i")) match {
          case Some(v) => committed.add(v)
          case None    => aborted.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(aborted.get() === 0, "disjoint appends must never abort")
    import scala.jdk.CollectionConverters._
    val versions = committed.iterator().asScala.toSeq.sorted
    assert(versions === (1 to n), s"expected dense version slots 1..$n, got $versions")
    val snap = TxLog.snapshotFiles(log)
    assert((0 until n).forall(i => snap.get(s"part_$i").exists(_.contains(s"f_$i"))),
      s"snapshot missing appended files: $snap")
  }

  test("conflicting concurrent rewriters of ONE partition: exactly one commits, the rest abort") {
    val log = freshLog("race_conflict")
    assert(TxLog.tryCommit(log, 0, Seq(Act("add", "hot", "f0"))))
    val n = 8
    val committed = new java.util.concurrent.atomic.AtomicInteger(0)
    val aborted = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        TxLog.commit(log, 0,
          Seq(Act("remove", "hot", "f0"), Act("add", "hot", s"f_new_$i")),
          Set("hot")) match {
          case Some(_) => committed.incrementAndGet()
          case None    => aborted.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(committed.get() === 1,
      s"exactly one rewriter of the same partition may win, got ${committed.get()}")
    assert(aborted.get() === n - 1)
    // and the snapshot holds exactly the winner's file
    val snap = TxLog.snapshotFiles(log)
    assert(snap("hot").length === 1)
    assert(snap("hot").head.startsWith("f_new_"))
  }

  test("snapshot isolation: an as-of read at an old version ignores later commits") {
    val log = freshLog("asof")
    assert(TxLog.tryCommit(log, 0, Seq(Act("add", "p", "f0"))))
    assert(TxLog.commit(log, 0, Seq(Act("remove", "p", "f0"), Act("add", "p", "f1")),
      Set("p")).contains(1))
    assert(TxLog.snapshotFiles(log, asOf = 0)("p") === Seq("f0"))
    assert(TxLog.snapshotFiles(log, asOf = 1)("p") === Seq("f1"))
  }

  test("checkpoint + tail replay equals the full log replay, including commits after the checkpoint") {
    val log = freshLog("ckpt")
    assert(TxLog.tryCommit(log, 0, Seq(Act("add", "a", "f0"), Act("add", "b", "g0"))))
    assert(TxLog.commit(log, 0, Seq(Act("remove", "a", "f0"), Act("add", "a", "f1")),
      Set("a")).contains(1))
    TxLog.writeCheckpoint(log, 1)
    // two commits AFTER the checkpoint — the tail the reader must replay
    assert(TxLog.commit(log, 1, Seq(Act("add", "c", "h0")), Set("c")).contains(2))
    assert(TxLog.commit(log, 2, Seq(Act("remove", "b", "g0")), Set("b")).contains(3))
    val fromCk = TxLog.readCheckpoint(log).get
    // compare against the FULL replay — snapshotFiles consults the
    // checkpoint by default now, which would make this vacuous
    assert(fromCk === TxLog.snapshotFiles(log, useCheckpoint = false))
    assert(fromCk === Map("a" -> Vector("f1"), "c" -> Vector("h0")))
  }

  test("zombie-writer fencing: concurrent duplicate (appId, batchId) deliveries commit exactly once") {
    // the check-then-act window idempotentCommit's fencing closes: two
    // deliveries of the SAME batch race the duplicate check — without
    // the appId in the touched set both pass it and double-append
    (0 until 20).foreach { round =>
      val log = freshLog(s"zombie_$round")
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Either[String, Int]]()
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          barrier.await()
          results.add(TxLog.idempotentCommit(log,
            TxLog.versions(log).lastOption.getOrElse(-1),
            Seq(Act("add", "all", s"delivery_$i")), Set.empty, "zombie", 7L))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val rs = results.iterator().asScala.toSeq
      assert(rs.count(_.isRight) === 1,
        s"round $round: exactly one delivery of batch 7 may land, got $rs")
      // the table carries exactly one delivery's file
      assert(TxLog.snapshotFiles(log)("all").length === 1)
    }
  }

  test("retryingCommit: conflicted rewriters re-run against fresh snapshots and ALL land") {
    val log = freshLog("retry_race")
    assert(TxLog.tryCommit(log, 0, Seq(Act("add", "hot", "f_v0"))))
    val n = 8
    val landed = new java.util.concurrent.atomic.AtomicInteger(0)
    val absorbed = new java.util.concurrent.atomic.AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        // each writer's transaction: replace whatever file currently
        // lives in 'hot' with its own — re-derived from the snapshot
        // it re-reads on every attempt, exactly the re-run contract
        TxLog.retryingCommit(log, 0, maxAttempts = 4 * n) { rv =>
          val cur = TxLog.snapshotFiles(log, rv)("hot")
          Some((cur.map(f => Act("remove", "hot", f)) :+
            Act("add", "hot", s"f_w$i"), Set("hot")))
        } match {
          case Some((_, aborts)) => landed.incrementAndGet(); absorbed.addAndGet(aborts)
          case None              => ()
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(landed.get() === n, s"every retrying rewriter must eventually land")
    assert(absorbed.get() >= n - 1,
      "conflicting rewrites of one partition must have absorbed aborts on the way")
    // the final state is exactly ONE file: the last committed rewrite
    val snap = TxLog.snapshotFiles(log)
    assert(snap("hot").length === 1, s"snap: $snap")
    assert(snap("hot").head.startsWith("f_w"))
  }

  test("compactor races appenders: maintenance commits without losing any concurrent append") {
    val log = freshLog("race_mixed")
    assert(TxLog.tryCommit(log, 0, (0 until 4).map(q => Act("add", "hot", s"frag$q"))))
    val appenderAborts = new java.util.concurrent.atomic.AtomicInteger(0)
    val compactorResult = new java.util.concurrent.atomic.AtomicReference[Option[Int]](None)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val compactor = new Thread(() => {
      barrier.await()
      compactorResult.set(TxLog.commit(log, 0,
        (0 until 4).map(q => Act("remove", "hot", s"frag$q")) :+
          Act("add", "hot", "compacted"), Set("hot")))
    })
    val appenders = (0 until 7).map { i =>
      new Thread(() => {
        barrier.await()
        if (TxLog.commit(log, 0, Seq(Act("add", s"p$i", s"f$i")), Set(s"p$i")).isEmpty)
          appenderAborts.incrementAndGet()
      })
    }
    (appenders :+ compactor).foreach(_.start())
    (appenders :+ compactor).foreach(_.join())
    // nothing else touched 'hot', so the compactor must have landed,
    // and no disjoint appender may have been starved into an abort
    assert(compactorResult.get().isDefined, "compactor must commit")
    assert(appenderAborts.get() === 0)
    val snap = TxLog.snapshotFiles(log)
    assert(snap("hot") === Vector("compacted"))
    assert((0 until 7).forall(i => snap(s"p$i") === Vector(s"f$i")), s"snap: $snap")
  }

  test("sink restart: same checkpoint re-run commits nothing; fresh source data commits exactly once") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_txsink/spec_${TmpSlices.key(sf)}"
    val p = java.nio.file.Paths.get(base)
    if (java.nio.file.Files.isDirectory(p)) {
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally st.close()
    }
    val srcDir = s"$base/src"
    val dataDir = s"$base/data"
    val logDir = s"$base/_log"
    val docs = Tables.documents(spark, sf).select("doc_id").limit(100)
    docs.repartition(2).write.mode("overwrite").parquet(srcDir)
    val sch = spark.read.parquet(srcDir).schema
    def runSink(): Unit = {
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .writeStream
        .option("checkpointLocation", s"$base/_ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val file = f"batch_$batchId%06d"
          df.write.mode("overwrite").parquet(s"$dataDir/$file")
          TxLog.idempotentCommit(logDir,
            TxLog.versions(logDir).lastOption.getOrElse(-1),
            Seq(Act("add", "all", file)), Set.empty, "spec_sink", batchId)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runSink()
    val committedAfterFirst = TxLog.versions(logDir).length
    assert(committedAfterFirst >= 2, "two source files must yield at least two batches")
    // restart against the SAME checkpoint: source exhausted, no commits
    runSink()
    assert(TxLog.versions(logDir).length === committedAfterFirst,
      "a checkpoint-resumed sink over an exhausted source must commit nothing")
    // one fresh source file: exactly one new commit, rows visible once
    Tables.documents(spark, sf).selectExpr("doc_id + 5000000 AS doc_id").limit(10)
      .coalesce(1).write.mode("append").parquet(srcDir)
    runSink()
    assert(TxLog.versions(logDir).length === committedAfterFirst + 1)
    val files = TxLog.snapshotFiles(logDir).values.flatten.toSeq.map(f => s"$dataDir/$f")
    assert(spark.read.parquet(files: _*).count() === 110L)
  }

  test("idempotent commits: duplicate (appId, batchId) deliveries are dropped, progress still commits") {
    val log = freshLog("txn")
    assert(TxLog.idempotentCommit(log, -1, Seq(Act("add", "p", "b0")),
      Set.empty, "app", 0L).isRight)
    // exact redelivery of batch 0 — must skip
    assert(TxLog.idempotentCommit(log, TxLog.versions(log).last,
      Seq(Act("add", "p", "b0_dup")), Set.empty, "app", 0L) === Left("duplicate"))
    // a LATE redelivery of an older batch after newer ones committed
    assert(TxLog.idempotentCommit(log, TxLog.versions(log).last,
      Seq(Act("add", "p", "b1")), Set.empty, "app", 1L).isRight)
    assert(TxLog.idempotentCommit(log, TxLog.versions(log).last,
      Seq(Act("add", "p", "b0_late")), Set.empty, "app", 0L) === Left("duplicate"))
    // a DIFFERENT appId is its own sequence
    assert(TxLog.idempotentCommit(log, TxLog.versions(log).last,
      Seq(Act("add", "q", "other0")), Set.empty, "other", 0L).isRight)
    // snapshot carries exactly the non-duplicate files; txn markers add no state
    assert(TxLog.snapshotFiles(log) ===
      Map("p" -> Vector("b0", "b1"), "q" -> Vector("other0")))
    assert(TxLog.txnVersion(log, "app") === Some(1L))
    assert(TxLog.txnVersion(log, "other") === Some(0L))
    assert(TxLog.txnVersion(log, "absent") === None)
  }

  test("manifest data skipping never loses rows: pruned read equals the unpruned read") {
    val r = SparkEntry.queries("q_tx_dataskip")(spark, sf).collect().head
    // unpruned truth over the same band
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS n_chars").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val width = docs.map(_._1).max / 8 + 1
    val (lo, hi) = (width * 5 / 2, width * 9 / 2 - 1)
    val band = docs.filter { case (id, _) => id >= lo && id <= hi }
    assert(r.getAs[Long]("n_rows") === band.length.toLong)
    assert(r.getAs[Long]("key_checksum") === band.map(_._1 * 7).sum)
    assert(r.getAs[Long]("chars_sum") === band.map(_._2).sum)
    // and it actually skipped: 3 of 8 bucket files opened
    assert(r.getAs[Long]("files_scanned") === 3L)
    assert(r.getAs[Long]("files_skipped") === 5L)
  }

  test("manifest bloom index prunes point lookups on a non-layout key without false negatives") {
    val r = SparkEntry.queries("q_tx_bloom_index")(spark, sf).collect().head
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS n_chars").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val k = docs.map(_._2).min
    val hits = docs.filter(_._2 == k)
    assert(r.getAs[Long]("n_rows") === hits.length.toLong)
    assert(r.getAs[Long]("key_checksum") === hits.map(_._1 * 7).sum)
    // the prune actually bit: probe the committed manifest blooms the
    // same way the reader does — candidates must be a strict subset of
    // the live files AND must cover every file truly containing k
    import operators.TxLog
    val log = s"${sys.props("java.io.tmpdir")}/graft_txbli/${TmpSlices.key(sf)}/_log"
    val blooms = TxLog.versions(log).flatMap(TxLog.readActs(log, _)).collect {
      case TxLog.Act("bloom", f, bs) => (f, bs.split(",").map(_.toLong).toSeq)
    }
    assert(blooms.length === 8)
    val candidates = blooms.filter { case (_, bits) =>
      functions.BloomHash.mightContainBoxed(bits, k) }.map(_._1).toSet
    val width = docs.map(_._1).max / 8 + 1
    val truly = hits.map(h => s"buckets/bucket=${h._1 / width}").toSet
    assert(truly.subsetOf(candidates), "bloom produced a false negative")
    assert(candidates.size < 8, s"prune was vacuous: $candidates")
  }

  test("compaction carries zone-map stats: the pruned read stays exact over the new layout") {
    val r = SparkEntry.queries("q_tx_dataskip_compact")(spark, sf).collect().head
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS n_chars").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val width = docs.map(_._1).max / 8 + 1
    val (lo, hi) = (width * 5 / 2, width * 9 / 2 - 1)
    val band = docs.filter { case (id, _) => id >= lo && id <= hi }
    assert(r.getAs[Long]("n_rows") === band.length.toLong)
    assert(r.getAs[Long]("key_checksum") === band.map(_._1 * 7).sum)
    assert(r.getAs[Long]("chars_sum") === band.map(_._2).sum)
    // post-compaction layout: 7 live files, band overlaps bucket2 +
    // the compacted [3w,5w) file — 2 scanned where pre-maintenance
    // pruning opened 3
    assert(r.getAs[Long]("files_scanned") === 2L)
    assert(r.getAs[Long]("files_skipped") === 5L)
  }

  test("restore is a metadata-only diff commit: state rewinds, history stays queryable") {
    val log = freshLog("restore")
    assert(TxLog.tryCommit(log, 0, Seq(Act("add", "a", "f0"), Act("add", "b", "g0"))))
    assert(TxLog.commit(log, 0,
      Seq(Act("remove", "a", "f0"), Act("add", "a", "f1")), Set("a")).contains(1))
    assert(TxLog.commit(log, 1, Seq(Act("add", "b", "g1")), Set("b")).contains(2))
    // restore to v0 — a new commit, not a log truncation
    assert(TxLog.restore(log, toVersion = 0).contains(3))
    assert(TxLog.snapshotFiles(log) === TxLog.snapshotFiles(log, asOf = 0))
    assert(TxLog.snapshotFiles(log) === Map("a" -> Vector("f0"), "b" -> Vector("g0")))
    // the bad window is STILL visible as-of its versions
    assert(TxLog.snapshotFiles(log, asOf = 2) ===
      Map("a" -> Vector("f1"), "b" -> Vector("g0", "g1")))
    // restoring to the current state is a no-op, not an empty commit
    assert(TxLog.restore(log, toVersion = 3).isEmpty)
    assert(TxLog.versions(log) === Seq(0, 1, 2, 3))
  }

  test("change data feed classifies the edit script exactly and skips untouched partitions") {
    val rows = SparkEntry.queries("q_tx_cdf")(spark, sf).collect()
      .map(r => r.getAs[String]("change_type") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("key_checksum"))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val langs = docs.map(_._2).distinct.sorted
    val (lmin, lmax) = (langs.head, langs.last)
    val del = docs.filter(x => x._2 == lmax && x._1 % 9 == 4).map(_._1)
    val upd = docs.filter(x => x._2 == lmax && x._1 % 10 == 0 && x._1 % 9 != 4).map(_._1)
    val ins = docs.filter(_._2 == lmin).map(_._1 + 2000000000L)
    assert(rows("delete") === ((del.length.toLong, del.map(_ * 7).sum)))
    assert(rows("update") === ((upd.length.toLong, upd.map(_ * 7).sum)))
    assert(rows("insert") === ((ins.length.toLong, ins.map(_ * 7).sum)))
    assert(rows.size === 3)
    // the feed's file diff never touches unchanged partitions: only
    // the rewritten lang_max file and the insert file differ
    val base = s"${sys.props("java.io.tmpdir")}/graft_txcdf/${TmpSlices.key(sf)}"
    val from = TxLog.snapshotFiles(s"$base/_log", asOf = 0)
    val to = TxLog.snapshotFiles(s"$base/_log", asOf = 2)
    val changed = (from.keySet ++ to.keySet).filter(p =>
      from.getOrElse(p, Seq.empty) != to.getOrElse(p, Seq.empty))
    assert(changed === Set(lmin, lmax),
      s"only the edited partitions may appear in the diff: $changed")
  }

  test("join pruning opens fewer files and loses no matches: pruned join equals the full join") {
    val r = SparkEntry.queries("q_tx_join_prune")(spark, sf).collect().head
    // unpruned truth: the same join over the raw table
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS n_chars").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val width = docs.map(_._1).max / 8 + 1
    val (lo, hi) = (width * 7 / 2, width * 9 / 2 - 1)
    val dim = docs.map(_._1).filter(id => id >= lo && id <= hi && id % 5 == 2).toSet
    val joined = docs.filter { case (id, _) => dim(id) }
    assert(r.getAs[Long]("n_rows") === joined.length.toLong)
    assert(r.getAs[Long]("key_checksum") === joined.map(_._1 * 7).sum)
    assert(r.getAs[Long]("chars_sum") === joined.map(_._2).sum)
    // and the metadata join actually pruned: strictly fewer than all 8
    // files opened, with the scanned set sized by the dim bounds
    val expScanned = dim.max / width - dim.min / width + 1
    assert(r.getAs[Long]("files_scanned") === expScanned)
    assert(r.getAs[Long]("files_skipped") === 8L - expScanned)
    assert(r.getAs[Long]("files_scanned") < 8L, "prune was vacuous")
  }

  test("quarantine gate conserves the source: main + quarantine = every event, disjointly") {
    val rows = SparkEntry.queries("q_tx_quarantine")(spark, sf).collect()
      .map(r => r.getAs[String]("dest") ->
        (r.getAs[Long]("n_rows"), Option(r.getAs[java.lang.Long]("key_checksum")).map(_.toLong)))
      .toMap
    val ev = Tables.events(spark, sf).selectExpr("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val (good, bad) = ev.partition(_._2 > 0)
    assert(rows("main")._1 === good.length.toLong)
    assert(rows("quarantine")._1 === bad.length.toLong)
    assert(rows("main")._2 === (if (good.isEmpty) None else Some(good.map(_._1 * 7).sum)))
    assert(rows("quarantine")._2 === (if (bad.isEmpty) None else Some(bad.map(_._1 * 7).sum)))
  }

  test("merge updates exactly the targeted rows and inserts land; nothing else moves") {
    val rows = SparkEntry.queries("q_tx_merge")(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "lang", "CAST(n_chars AS BIGINT) AS n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val langs = docs.map(_._2).distinct.sorted
    val (lmin, lmax) = (langs.head, langs.last)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val base = docs.filter(_._2 == lang)
      val expChars = base.map { case (id, _, nc) =>
        nc + (if (lang == lmax && id % 10 == 0) 1000L else 0L)
      }.sum + (if (lang == lmin) base.map(_._3).sum else 0L)
      val expRows = base.length.toLong * (if (lang == lmin) 2 else 1)
      assert(r.getAs[Long]("n_rows") === expRows, s"lang=$lang")
      assert(r.getAs[Long]("chars_sum") === expChars, s"lang=$lang")
      assert(r.getAs[Long]("n_partitions_rewritten") === 2L)
    }
    // ONE write job per transaction: a single partitionBy pass leaves
    // exactly one _SUCCESS at the merged ROOT with lang= dirs beside it
    // — a per-partition write loop would leave one marker per dir
    val mergedRoot = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_txmerge/${TmpSlices.key(sf)}/data/merged")
    assert(java.nio.file.Files.exists(mergedRoot.resolve("_SUCCESS")),
      "merged/ must be the output of ONE partitionBy job")
    val st = java.nio.file.Files.list(mergedRoot)
    val entries = try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString).toVector
    } finally st.close()
    assert(entries.count(_.startsWith("lang=")) === 2, s"entries: $entries")
    assert(entries.count(_ == "_SUCCESS") === 1)
  }

  test("deletion vectors hide deleted keys from reads before any rewrite happens") {
    val rows = SparkEntry.queries("q_tx_delete_vectors")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val survivors = docs.filterNot { case (id, _) => id % 7 == 0 || id % 11 == 3 }
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val exp = survivors.filter(_._2 == lang)
      assert(r.getAs[Long]("n_rows") === exp.length.toLong, s"lang=$lang")
      assert(r.getAs[Long]("key_checksum") === exp.map(_._1 * 7).sum, s"lang=$lang")
      assert(r.getAs[Long]("dvs_before_purge") === 2L)
      assert(r.getAs[Long]("dvs_after_purge") === 0L)
    }
    assert(survivors.length < docs.length, "fixture deleted nothing — vacuous")
    // purge is ONE partitionBy job, not a per-partition write loop
    val purgedRoot = java.nio.file.Paths.get(
      s"${sys.props("java.io.tmpdir")}/graft_txdv/${TmpSlices.key(sf)}/data/purged")
    assert(java.nio.file.Files.exists(purgedRoot.resolve("_SUCCESS")),
      "purged/ must be the output of ONE partitionBy job")
  }

  test("q_tx_commit end-to-end: manifest read-back equals the logical edit replay") {
    val out = SparkEntry.queries("q_tx_commit")(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val langs = docs.map(_._2).distinct.sorted
    val (lmin, lmax) = (langs.head, langs.last)
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val expected: Seq[Long] = lang match {
        case `lmin` => docs.collect { case (id, `lmin`) if id % 2 == 0 => id }.toSeq
        // C's RETRIED rewrite keeps evens of (base ∪ A's re-keyed
        // appends) — the 1e9 offset preserves parity
        case `lmax` => docs.collect { case (id, `lmax`) if id % 2 == 0 => id }.toSeq ++
          docs.collect { case (id, `lmax`) if id % 2 == 0 => id + 1000000000L }.toSeq
        case _ => docs.collect { case (id, l) if l == lang => id }.toSeq
      }
      assert(r.getAs[Long]("n_rows") === expected.length.toLong, s"lang=$lang")
      assert(r.getAs[Long]("key_checksum") === expected.map(_ * 7).sum, s"lang=$lang")
      assert(r.getAs[Long]("n_versions") === 4L)
      assert(r.getAs[Long]("n_aborted") === 1L)
    }
    assert(out.map(_.getAs[String]("lang")).toSeq === langs)
  }
}
