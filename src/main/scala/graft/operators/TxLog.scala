package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Delta-style transactional commit protocol over a file manifest —
  * the multi-writer lake-lifecycle capability the compaction /
  * retention / dynamic-overwrite write paths don't model on their own:
  * several writers, each holding a STALE snapshot, concurrently adding
  * and removing files of a partitioned table, with optimistic
  * concurrency deciding who commits and who must abort.
  *
  * The design follows the public Delta Lake / Iceberg commit model:
  *
  *  - A table is data files plus an ordered log of version manifests
  *    (`_log/v%06d.tsv`, one line per action: add/remove, partition,
  *    file). A snapshot is the log replayed in order: files added and
  *    not later removed. Readers NEVER list the data directory — the
  *    manifest is the source of truth, so concurrent writers can stage
  *    data files freely (staged-but-uncommitted files are invisible).
  *  - A writer reads a snapshot at version R, stages its data files,
  *    then tries to commit at the lowest free slot v > R. Before every
  *    attempt it re-reads the log tail (R, v): if any committed-later
  *    version TOUCHES one of its partitions, the writer's snapshot was
  *    stale in a way that matters — it aborts (real engines re-run the
  *    transaction). Disjoint-partition writers rebase silently and
  *    take the next slot — blind appends always win eventually.
  *  - The slot claim is an ATOMIC CREATE-EXCLUSIVE of the manifest
  *    file (POSIX O_CREAT|O_EXCL via `Files.createFile`; HDFS `create`
  *    overwrite=false has the same semantics — the primitive public
  *    log stores use there). Object stores without atomic create need
  *    a coordinating log store in front; that substitution is config,
  *    not protocol.
  *
  * At 100 TB the data writes are ordinary distributed parquet jobs;
  * the log is metadata — bytes per commit, independent of data volume.
  * Only the manifest lines pass through the driver.
  *
  * TxLogSpec races REAL threads over the create-exclusive slot claim
  * (exactly one winner per slot) and runs a genuinely concurrent
  * multi-writer append storm (all writers land, every file visible,
  * zero aborts). The oracle entry `q_tx_commit` executes a
  * deterministic three-writer script — append vs disjoint rewrite vs
  * conflicting rewrite, all from the SAME stale snapshot — and proves
  * the outcome by reading the final table THROUGH the manifest.
  */
object TxLog {

  final case class Act(action: String, part: String, file: String)

  /** Atomic slot claim with the manifest content ALREADY COMPLETE:
    * stage the lines into a hidden temp file, then publish by hard
    * link — POSIX link() fails with EEXIST if the slot is taken, and
    * the linked name carries the fully-written content, so a
    * concurrent reader can never observe a torn manifest (a bare
    * create-then-write would expose an empty slot file mid-commit).
    * HDFS substitutes its server-side atomic create(overwrite=false);
    * object stores need a coordinating log store — config, not
    * protocol. Returns false iff the slot was already taken. */
  def tryCommit(logDir: String, version: Int, acts: Seq[Act]): Boolean = {
    val dir = java.nio.file.Paths.get(logDir)
    java.nio.file.Files.createDirectories(dir)
    val path = dir.resolve(f"v$version%06d.tsv")
    val stage = dir.resolve(
      s".stage_${Thread.currentThread().getId}_${System.nanoTime()}")
    java.nio.file.Files.write(stage,
      acts.map(a => s"${a.action}\t${a.part}\t${a.file}")
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    try {
      java.nio.file.Files.createLink(path, stage) // link() — atomic, EEXCL
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally java.nio.file.Files.deleteIfExists(stage)
  }

  /** Committed versions in order. */
  def versions(logDir: String): Seq[Int] = {
    val dir = java.nio.file.Paths.get(logDir)
    if (!java.nio.file.Files.isDirectory(dir)) return Seq.empty
    val st = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".tsv"))
        .map(n => n.stripPrefix("v").stripSuffix(".tsv").toInt)
        .toSeq.sorted
    } finally st.close()
  }

  def readActs(logDir: String, version: Int): Seq[Act] = {
    val path = java.nio.file.Paths.get(logDir, f"v$version%06d.tsv")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(path).asScala.toSeq
      .filter(_.nonEmpty).map { l =>
        val Array(a, p, f) = l.split("\t", 3); Act(a, p, f)
      }
  }

  /** Snapshot at (up to and including) `asOf`: live files per
    * partition after replaying the log in version order. `txn` marker
    * lines (writer-identity bookkeeping, see [[idempotentCommit]])
    * carry no file state and are skipped. */
  def snapshotFiles(logDir: String, asOf: Int = Int.MaxValue): Map[String, Seq[String]] = {
    val live = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
    versions(logDir).filter(_ <= asOf).foreach { v =>
      readActs(logDir, v).foreach {
        case Act("add", p, f)    => live(p) = live.getOrElse(p, Vector.empty) :+ f
        case Act("remove", p, f) => live(p) = live.getOrElse(p, Vector.empty).filterNot(_ == f)
        case Act("txn", _, _)    => ()
        case Act("stats", _, _)  => ()
        case Act(other, _, _)    => sys.error(s"unknown manifest action: $other")
      }
    }
    live.toMap.filter(_._2.nonEmpty)
  }

  /** Highest transaction id committed by `appId`, from the `txn`
    * marker lines — the Delta txnAppId/txnVersion pattern that makes a
    * retried writer idempotent. */
  def txnVersion(logDir: String, appId: String): Option[Long] =
    versions(logDir).flatMap(readActs(logDir, _)).collect {
      case Act("txn", `appId`, b) => b.toLong
    }.sorted.lastOption

  /** Exactly-once commit for replayable writers (a streaming
    * foreachBatch sink retrying a failed microbatch, a restarted
    * backfill job): the commit carries a (appId, batchId) marker line,
    * and a commit whose batchId is <= the highest already-committed
    * marker for the same appId is dropped as a duplicate delivery.
    * Returns Right(version) on commit, Left("duplicate") on an
    * idempotent skip, Left("conflict") on an OCC abort. */
  def idempotentCommit(logDir: String, readVer: Int, acts: Seq[Act],
                       touched: Set[String], appId: String,
                       batchId: Long): Either[String, Int] = {
    if (txnVersion(logDir, appId).exists(_ >= batchId)) return Left("duplicate")
    commit(logDir, readVer, acts :+ Act("txn", appId, batchId.toString), touched)
      .toRight("conflict")
  }

  /** Optimistic commit: stage was already written; claim the next free
    * slot unless a version committed after `readVer` touched one of
    * `touched` partitions. Returns the committed version, or None on
    * logical conflict (caller must re-run its transaction). */
  def commit(logDir: String, readVer: Int, acts: Seq[Act],
             touched: Set[String]): Option[Int] = {
    var attempt = math.max(readVer + 1, versions(logDir).lastOption.getOrElse(-1) + 1)
    while (true) {
      val committedSince = versions(logDir).filter(v => v > readVer && v < attempt)
      val touchedSince = committedSince.flatMap(readActs(logDir, _)).map(_.part).toSet
      if (touchedSince.intersect(touched).nonEmpty) return None
      if (tryCommit(logDir, attempt, acts)) return Some(attempt)
      attempt += 1 // slot raced away — rebase against the new tail
    }
    None // unreachable
  }

  val defs: Seq[QueryDef] = Seq(

    // Three writers, one stale snapshot, deterministic outcome:
    //   v0     base commit — one file per lang partition;
    //   A(@v0) blind append of re-keyed duplicates into lang_max
    //          → commits v1 (no one committed since v0);
    //   B(@v0) rewrite of lang_min (remove base file, add evens-only)
    //          → finds v1 taken, sees A touched only lang_max,
    //            DISJOINT → rebases, commits v2;
    //   C(@v0) rewrite of lang_max → sees A's v1 touched lang_max,
    //            CONFLICT → aborts (n_aborted = 1).
    // The result is read exclusively THROUGH the final manifest (the
    // remove must actually hide the base lang_min file; the append
    // must be visible) and pinned per-lang: count + key checksum, with
    // the log shape (n_versions, n_aborted) on every row. DuckDB
    // replays the same logical edits over `documents` directly.
    QueryDef(
      "q_tx_commit",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txlog/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        // idempotent re-run: the protocol twin starts from an empty table
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)

        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        val langs = docs.select("lang").distinct()
          .collect().map(_.getString(0)).sorted // bounded: #langs
        val (lmin, lmax) = (langs.head, langs.last)

        // v0: base commit, one staged file per partition
        langs.foreach { l =>
          docs.filter(col("lang") === l)
            .write.mode("overwrite").parquet(s"$dataDir/base_$l")
        }
        val v0 = commit(logDir, -1,
          langs.map(l => Act("add", l, s"base_$l")), langs.toSet)
        require(v0.contains(0), s"base commit landed at $v0, expected 0")

        // all three writers snapshot NOW — each holds readVer = 0
        val snapVer = versions(logDir).last

        // writer A: blind append into lmax (re-keyed duplicates)
        docs.filter(col("lang") === lmax)
          .withColumn("doc_id", col("doc_id") + lit(1000000000L))
          .write.mode("overwrite").parquet(s"$dataDir/appendA_$lmax")
        val vA = commit(logDir, snapVer,
          Seq(Act("add", lmax, s"appendA_$lmax")), Set(lmax))
        require(vA.isDefined, "append A must never conflict")

        // writer B: stale rewrite of lmin — disjoint from A, must rebase
        docs.filter(col("lang") === lmin && col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$dataDir/rewriteB_$lmin")
        val vB = commit(logDir, snapVer,
          Seq(Act("remove", lmin, s"base_$lmin"),
            Act("add", lmin, s"rewriteB_$lmin")), Set(lmin))
        require(vB.isDefined, "disjoint rewrite B must rebase, not abort")

        // writer C: stale rewrite of lmax — A got there first, must abort
        docs.filter(col("lang") === lmax && col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$dataDir/rewriteC_$lmax")
        val vC = commit(logDir, snapVer,
          Seq(Act("remove", lmax, s"base_$lmax"),
            Act("add", lmax, s"rewriteC_$lmax")), Set(lmax))
        require(vC.isEmpty, s"conflicting rewrite C must abort, committed $vC")
        val nAborted = 1L

        // read the final table THROUGH the manifest
        val liveFiles = snapshotFiles(logDir).values.flatten.toSeq.sorted
          .map(f => s"$dataDir/$f")
        val nVersions = versions(logDir).length.toLong
        s.read.parquet(liveFiles: _*)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id") * 7).cast("bigint").as("key_checksum"))
          .withColumn("n_versions", lit(nVersions))
          .withColumn("n_aborted", lit(nAborted))
          .orderBy("lang")
      },
      Some("""WITH l AS (
             |  SELECT MIN(lang) AS lmin, MAX(lang) AS lmax FROM documents),
             |fin AS (
             |  -- survivors of B's rewrite: evens only in lmin
             |  SELECT lang, doc_id FROM documents, l
             |  WHERE lang = lmin AND doc_id % 2 = 0
             |  UNION ALL
             |  -- untouched partitions
             |  SELECT lang, doc_id FROM documents, l
             |  WHERE lang <> lmin AND lang <> lmax
             |  UNION ALL
             |  -- lmax: base survives (C aborted) plus A's re-keyed appends
             |  SELECT lang, doc_id FROM documents, l WHERE lang = lmax
             |  UNION ALL
             |  SELECT lang, doc_id + 1000000000 FROM documents, l
             |  WHERE lang = lmax)
             |SELECT lang, COUNT(*) AS n_rows,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum,
             |  CAST(3 AS BIGINT) AS n_versions,
             |  CAST(1 AS BIGINT) AS n_aborted
             |FROM fin GROUP BY lang ORDER BY lang""".stripMargin)),

    // TIME TRAVEL through the manifest — the read-side dividend of
    // logging removes instead of deleting: an as-of read replays the
    // log only up to the requested version, so every historical
    // snapshot stays queryable for free until vacuum reclaims its
    // files. Three versions of the lang_min partition (base → rewrite
    // evens → append re-keyed odds), then ONE output row per version
    // with that snapshot's count + checksum — each row read through
    // `snapshotFiles(asOf = v)`. The oracle replays the same edit
    // script over `documents` directly; a reader that leaks a future
    // file into an old snapshot (or loses a past one) hash-mismatches
    // on the exact checksum.
    QueryDef(
      "q_tx_timetravel",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txtt/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        val lmin = docs.agg(min("lang")).head().getString(0)
        val part = docs.filter(col("lang") === lmin)

        part.write.mode("overwrite").parquet(s"$dataDir/f0")
        require(commit(logDir, -1, Seq(Act("add", lmin, "f0")), Set(lmin)).contains(0))
        part.filter(col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$dataDir/f1")
        require(commit(logDir, 0,
          Seq(Act("remove", lmin, "f0"), Act("add", lmin, "f1")), Set(lmin)).contains(1))
        part.filter(col("doc_id") % 2 === 1)
          .withColumn("doc_id", col("doc_id") + lit(1000000000L))
          .write.mode("overwrite").parquet(s"$dataDir/f2")
        require(commit(logDir, 1, Seq(Act("add", lmin, "f2")), Set(lmin)).contains(2))

        (0 to 2).map { v =>
          val files = snapshotFiles(logDir, asOf = v).values.flatten.toSeq.sorted
            .map(f => s"$dataDir/$f")
          s.read.parquet(files: _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("doc_id") * 7).cast("bigint").as("key_checksum"))
            .withColumn("version", lit(v))
            .select("version", "n_rows", "key_checksum")
        }.reduce(_ unionAll _).orderBy("version")
      },
      Some("""WITH l AS (SELECT MIN(lang) AS lmin FROM documents),
             |p AS (SELECT doc_id FROM documents, l WHERE lang = lmin)
             |SELECT 0 AS version, COUNT(*) AS n_rows,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum FROM p
             |UNION ALL
             |SELECT 1, COUNT(*), CAST(SUM(doc_id * 7) AS BIGINT)
             |FROM p WHERE doc_id % 2 = 0
             |UNION ALL
             |SELECT 2, COUNT(*), CAST(SUM(doc_id * 7) AS BIGINT) FROM (
             |  SELECT doc_id FROM p WHERE doc_id % 2 = 0
             |  UNION ALL
             |  SELECT doc_id + 1000000000 FROM p WHERE doc_id % 2 = 1)
             |ORDER BY version""".stripMargin)),

    // CHECKPOINT + VACUUM — the two maintenance duties a manifest
    // table owes its operators. Checkpoint: past N versions a reader
    // replaying every manifest pays O(versions) metadata reads; a
    // checkpoint file materializes the flattened snapshot so cold
    // reads replay checkpoint + tail (O(1) + recent) — Delta's
    // _last_checkpoint pattern. Vacuum: files no longer referenced by
    // any retained snapshot (dead rewrites, crashed writers' staged-
    // but-never-committed dirs) are physically reclaimed; the explicit
    // trade-off — logged here as vacuumed counts the oracle pins — is
    // that time travel beyond the retention horizon dies with them.
    // The final read goes through the CHECKPOINT (require()d equal to
    // the full log replay), so a wrong checkpoint fails the query, and
    // the post-vacuum read proves the reclaim removed only dead bytes.
    QueryDef(
      "q_tx_vacuum",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txvac/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        val langs = docs.select("lang").distinct()
          .collect().map(_.getString(0)).sorted
        val lmin = langs.head
        langs.foreach { l =>
          docs.filter(col("lang") === l)
            .write.mode("overwrite").parquet(s"$dataDir/base_$l")
        }
        require(commit(logDir, -1,
          langs.map(l => Act("add", l, s"base_$l")), langs.toSet).contains(0))
        // v1 rewrite makes base_lmin DEAD (referenced only by v0)
        docs.filter(col("lang") === lmin && col("doc_id") % 2 === 0)
          .write.mode("overwrite").parquet(s"$dataDir/live_$lmin")
        require(commit(logDir, 0,
          Seq(Act("remove", lmin, s"base_$lmin"), Act("add", lmin, s"live_$lmin")),
          Set(lmin)).contains(1))
        // a crashed writer: staged data, commit never attempted
        docs.limit(1).write.mode("overwrite").parquet(s"$dataDir/staged_orphan")

        // checkpoint the latest snapshot
        val ckVer = versions(logDir).last
        writeCheckpoint(logDir, ckVer)
        val fromCk = readCheckpoint(logDir).get
        require(fromCk == snapshotFiles(logDir, ckVer),
          "checkpoint must equal the full log replay")

        // vacuum with retention 0: live = latest snapshot only
        val live = fromCk.values.flatten.toSet
        val dataPath = java.nio.file.Paths.get(dataDir)
        import scala.jdk.CollectionConverters._
        val onDisk = {
          val st = java.nio.file.Files.list(dataPath)
          try st.iterator().asScala.map(_.getFileName.toString).toVector.sorted
          finally st.close()
        }
        val dead = onDisk.filterNot(live)
        dead.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(s"$dataDir/$f")
          p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        }
        val files = fromCk.values.flatten.toSeq.sorted.map(f => s"$dataDir/$f")
        s.read.parquet(files: _*)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id") * 7).cast("bigint").as("key_checksum"))
          .withColumn("n_live_files", lit(live.size.toLong))
          .withColumn("n_vacuumed", lit(dead.size.toLong))
          .orderBy("lang")
      },
      Some("""WITH l AS (SELECT MIN(lang) AS lmin FROM documents),
             |nl AS (SELECT COUNT(DISTINCT lang) AS n FROM documents),
             |fin AS (
             |  SELECT lang, doc_id FROM documents, l
             |  WHERE lang = lmin AND doc_id % 2 = 0
             |  UNION ALL
             |  SELECT lang, doc_id FROM documents, l WHERE lang <> lmin)
             |SELECT lang, COUNT(*) AS n_rows,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum,
             |  (SELECT CAST(n AS BIGINT) FROM nl) AS n_live_files,
             |  CAST(2 AS BIGINT) AS n_vacuumed
             |FROM fin GROUP BY lang ORDER BY lang""".stripMargin)),

    // EXACTLY-ONCE streaming sink through the transactional log — the
    // production pattern for "stream into a lake table without
    // duplicates on retry": a foreachBatch writer stages each
    // microbatch's files and commits them with a (appId, batchId)
    // marker (idempotentCommit — Delta's txnAppId/txnVersion
    // discipline), so a REDELIVERED batch (failure between the data
    // write and the engine recording the batch as done — the classic
    // at-least-once window) is detected in the log and dropped instead
    // of double-appended. A real AvailableNow file-source stream runs
    // to completion inside the query (maxFilesPerTrigger=1 forces
    // multiple batches when the source has multiple files), then the
    // duplicate delivery is REPLAYED deliberately and must skip. The
    // final table state, read through the manifest, is oracle-exact:
    // any double-commit doubles a count and fails the driver hash —
    // the exactly-once claim is the hash match itself, regardless of
    // how the source files happened to batch.
    QueryDef(
      "q_tx_stream_sink",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txsink/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        // stage the source as a 4-file directory: the file-stream
        // source needs a directory, and multiple files force multiple
        // microbatches under maxFilesPerTrigger=1 — the retry window
        // the marker protocol exists for
        val srcDir = s"$base/src"
        Tables.events(s, d).select(col("event_id"), col("event_type"))
          .repartition(4).write.mode("overwrite").parquet(srcDir)
        val sch = s.read.parquet(srcDir).schema
        val appId = "graft_tx_sink"
        val lastBatch = new java.util.concurrent.atomic.AtomicLong(-1L)
        val q = s.readStream.schema(sch)
          .option("maxFilesPerTrigger", 1).parquet(srcDir)
          .writeStream
          .option("checkpointLocation", s"$base/_ckpt")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val file = f"batch_$batchId%06d"
            df.write.mode("overwrite").parquet(s"$dataDir/$file")
            val readVer = versions(logDir).lastOption.getOrElse(-1)
            require(idempotentCommit(logDir, readVer,
              Seq(Act("add", "all", file)), Set.empty, appId, batchId).isRight,
              s"sink commit for batch $batchId must land")
            lastBatch.updateAndGet(b => math.max(b, batchId))
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()

        // deliberate duplicate delivery of the last batch — the
        // at-least-once retry the marker must absorb
        val retry = idempotentCommit(logDir,
          versions(logDir).last, Seq(Act("add", "all", "batch_DUP")),
          Set.empty, appId, lastBatch.get())
        val retrySkipped = retry == Left("duplicate")

        val files = snapshotFiles(logDir).values.flatten.toSeq.sorted
          .map(f => s"$dataDir/$f")
        s.read.parquet(files: _*)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("event_id") * 7).cast("bigint").as("key_checksum"))
          .withColumn("retry_skipped", lit(retrySkipped))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n_rows,
             |  CAST(SUM(event_id * 7) AS BIGINT) AS key_checksum,
             |  TRUE AS retry_skipped
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // SCHEMA EVOLUTION on the manifest table: v1 appends files carrying
    // a column v0's files don't have, and readers mergeSchema across
    // the live set — old rows surface NULL for the new column, new
    // rows carry it; nothing is rewritten (the 100 TB property: adding
    // a column must be a metadata change, not a table rewrite). The
    // oracle replays the same evolution logically: per-lang totals
    // over old∪new rows, the non-null count isolating the new-schema
    // rows, and the checksum covering both generations.
    QueryDef(
      "q_tx_schema_evolve",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txevo/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        val docs = Tables.documents(s, d)
        docs.select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(s"$dataDir/gen0")
        require(commit(logDir, -1, Seq(Act("add", "all", "gen0")), Set("all")).contains(0))
        docs.select((col("doc_id") + lit(1000000000L)).as("doc_id"), col("lang"),
            col("n_chars").cast("long").as("n_chars"))
          .write.mode("overwrite").parquet(s"$dataDir/gen1")
        require(commit(logDir, 0, Seq(Act("add", "all", "gen1")), Set.empty).isDefined)

        val files = snapshotFiles(logDir).values.flatten.toSeq.sorted
          .map(f => s"$dataDir/$f")
        s.read.option("mergeSchema", "true").parquet(files: _*)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            count(col("n_chars")).as("n_with_chars"),
            sum(col("n_chars")).cast("bigint").as("chars_sum"),
            sum(col("doc_id") * 7).cast("bigint").as("key_checksum"))
          .orderBy("lang")
      },
      Some("""WITH fin AS (
             |  SELECT lang, doc_id, CAST(NULL AS BIGINT) AS nc FROM documents
             |  UNION ALL
             |  SELECT lang, doc_id + 1000000000, CAST(n_chars AS BIGINT)
             |  FROM documents)
             |SELECT lang, COUNT(*) AS n_rows,
             |  COUNT(nc) AS n_with_chars,
             |  CAST(SUM(nc) AS BIGINT) AS chars_sum,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum
             |FROM fin GROUP BY lang ORDER BY lang""".stripMargin)),

    // COMPACTION AS A TRANSACTION — small-file maintenance running
    // concurrently with writers, the everyday case a manifest table
    // exists for: the compactor rewrites one partition's fragments as
    // one file (remove×k + add×1) under the SAME OCC rules as any
    // writer, so it conflicts with a concurrent rewrite of ITS
    // partition but never blocks appends elsewhere. Script: v0 lands
    // lang_min as FOUR fragment files (plus the other partitions);
    // the compactor (stale @v0) commits the 4→1 rewrite at v1; an
    // appender also @v0 rebases past it into v2 (disjoint partition);
    // a SECOND compactor @v0 aborts on v1's overlap. Compaction must
    // be a CONTENT no-op — the oracle pins per-lang counts/checksums
    // that an off-by-one-fragment rewrite would break — while the
    // file count drop (4→1) is asserted from the manifest itself.
    QueryDef(
      "q_tx_compact",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txcomp/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        val langs = docs.select("lang").distinct()
          .collect().map(_.getString(0)).sorted
        val (lmin, lmax) = (langs.head, langs.last)
        // v0: lang_min fragmented into 4 files, the rest one file each
        (0 until 4).foreach { q =>
          docs.filter(col("lang") === lmin && col("doc_id") % 4 === q)
            .write.mode("overwrite").parquet(s"$dataDir/frag${q}_$lmin")
        }
        langs.filterNot(_ == lmin).foreach { l =>
          docs.filter(col("lang") === l)
            .write.mode("overwrite").parquet(s"$dataDir/base_$l")
        }
        require(commit(logDir, -1,
          (0 until 4).map(q => Act("add", lmin, s"frag${q}_$lmin")) ++
            langs.filterNot(_ == lmin).map(l => Act("add", l, s"base_$l")),
          langs.toSet).contains(0))
        val nFragsBefore = snapshotFiles(logDir)(lmin).length.toLong

        // compactor @v0: rewrite the snapshot's lmin fragments as ONE file
        val fragPaths = snapshotFiles(logDir, 0)(lmin).map(f => s"$dataDir/$f")
        s.read.parquet(fragPaths: _*).coalesce(1)
          .write.mode("overwrite").parquet(s"$dataDir/compacted_$lmin")
        val vComp = commit(logDir, 0,
          (0 until 4).map(q => Act("remove", lmin, s"frag${q}_$lmin")) :+
            Act("add", lmin, s"compacted_$lmin"), Set(lmin))
        require(vComp.contains(1), s"compactor must commit at v1, got $vComp")

        // appender @v0 (stale): disjoint partition — rebases past v1
        docs.filter(col("lang") === lmax)
          .withColumn("doc_id", col("doc_id") + lit(1000000000L))
          .write.mode("overwrite").parquet(s"$dataDir/append_$lmax")
        require(commit(logDir, 0,
          Seq(Act("add", lmax, s"append_$lmax")), Set(lmax)).contains(2))

        // second compactor @v0 (stale): lmin changed under it — abort
        val vComp2 = commit(logDir, 0,
          Seq(Act("remove", lmin, s"frag0_$lmin"), Act("add", lmin, "recompact")),
          Set(lmin))
        require(vComp2.isEmpty, s"stale second compactor must abort, got $vComp2")

        val snap = snapshotFiles(logDir)
        val nFragsAfter = snap(lmin).length.toLong
        val files = snap.values.flatten.toSeq.sorted.map(f => s"$dataDir/$f")
        s.read.parquet(files: _*)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id") * 7).cast("bigint").as("key_checksum"))
          .withColumn("files_before", lit(nFragsBefore))
          .withColumn("files_after", lit(nFragsAfter))
          .withColumn("n_aborted", lit(1L))
          .orderBy("lang")
      },
      Some("""WITH l AS (
             |  SELECT MIN(lang) AS lmin, MAX(lang) AS lmax FROM documents),
             |fin AS (
             |  SELECT lang, doc_id FROM documents
             |  UNION ALL
             |  SELECT lang, doc_id + 1000000000 FROM documents, l
             |  WHERE lang = lmax)
             |SELECT lang, COUNT(*) AS n_rows,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum,
             |  CAST(4 AS BIGINT) AS files_before,
             |  CAST(1 AS BIGINT) AS files_after,
             |  CAST(1 AS BIGINT) AS n_aborted
             |FROM fin GROUP BY lang ORDER BY lang""".stripMargin)),

    // EXPECTATIONS GATE with quarantine — enforcement, where
    // q_dq_audit only reports: rows failing the declared contract
    // (value > 0 here) are ROUTED to a quarantine partition instead of
    // the table, and both destinations commit in ONE transaction so
    // no reader can observe the table without its quarantine (the
    // half-committed gate is the production incident this prevents).
    // The 100 TB cost shape is the point: ONE scan — the validity
    // flag is a partition column of a single partitionBy write, never
    // two filtered passes over the source — and the commit is
    // metadata. Read back through the manifest: per-destination
    // counts + checksums, with conservation (main + quarantine =
    // source) enforced by the oracle hash.
    QueryDef(
      "q_tx_quarantine",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txq/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        // ONE pass: validity is a partition column, not a second filter scan
        Tables.events(s, d)
          .selectExpr("event_id", "event_type", "value",
            "CASE WHEN value > 0 THEN 'main' ELSE 'quarantine' END AS dest")
          .write.partitionBy("dest").mode("overwrite").parquet(s"$dataDir/gate")
        // both destinations in ONE atomic version (a dest with zero
        // rows writes no partition dir — commit only what exists, and
        // report the empty destination as a 0/NULL row like the oracle)
        val hfs = new org.apache.hadoop.fs.Path(dataDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val present = Seq("main", "quarantine").filter(dest =>
          hfs.exists(new org.apache.hadoop.fs.Path(s"$dataDir/gate/dest=$dest")))
        require(commit(logDir, -1,
          present.map(dest => Act("add", dest, s"gate/dest=$dest")),
          Set("main", "quarantine")).contains(0))

        val snap = snapshotFiles(logDir)
        Seq("main", "quarantine").map { dest =>
          snap.get(dest) match {
            case Some(files) =>
              s.read.parquet(files.map(f => s"$dataDir/$f"): _*)
                .agg(count(lit(1)).as("n_rows"),
                  sum(col("event_id") * 7).cast("bigint").as("key_checksum"))
                .withColumn("dest", lit(dest))
                .select("dest", "n_rows", "key_checksum")
            case None =>
              s.range(1).select(lit(dest).as("dest"), lit(0L).as("n_rows"),
                lit(null).cast("long").as("key_checksum"))
          }
        }.reduce(_ unionAll _).orderBy("dest")
      },
      Some("""SELECT 'main' AS dest, COUNT(*) AS n_rows,
             |  CAST(SUM(event_id * 7) AS BIGINT) AS key_checksum
             |FROM events WHERE value > 0
             |UNION ALL
             |SELECT 'quarantine', COUNT(*),
             |  CAST(SUM(event_id * 7) AS BIGINT)
             |FROM events WHERE NOT (value > 0)
             |ORDER BY dest""".stripMargin)),

    // DATA SKIPPING FROM MANIFEST STATS — Iceberg/Delta-style file
    // pruning one level ABOVE parquet footers: each commit records a
    // per-file zone map (min/max doc_id) as `stats` manifest lines, and
    // a range-predicate reader intersects its predicate with the
    // stats to decide WHICH FILES TO OPEN before any scan is planned.
    // At 100 TB this is the difference between listing-then-opening
    // every file (footer pruning still opens them) and never touching
    // the irrelevant 95% — the manifest is metadata-sized and lives on
    // the driver. Eight range-bucketed files; the query band overlaps
    // exactly two of them; the output pins the answer AND the pruning
    // arithmetic (files scanned / skipped), so opening too many or —
    // worse — too few files fails the hash.
    QueryDef(
      "q_tx_dataskip",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txskip/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
        val maxId = docs.agg(max("doc_id")).head().getLong(0)
        val width = maxId / 8 + 1
        // ONE pass writes all eight range buckets (bucket = partition
        // column), not eight filtered scans — the write cost of
        // stats-keyed layout must itself scale; the per-file min/max
        // are the band edges by construction, so the stats lines need
        // no second look at the data
        docs.withColumn("bucket", (col("doc_id") / lit(width)).cast("int"))
          .write.partitionBy("bucket").mode("overwrite")
          .parquet(s"$dataDir/buckets")
        val acts = (0 until 8).flatMap { b =>
          val (lo, hi) = (b * width, (b + 1) * width - 1)
          Seq(Act("add", "all", s"buckets/bucket=$b"),
            Act("stats", s"buckets/bucket=$b", s"$lo,$hi"))
        }
        require(commit(logDir, -1, acts, Set("all")).contains(0))

        // predicate band: the middle quarter [2.5w, 4.5w) — overlaps
        // exactly buckets 2..4 at the edges: [2w..3w),[3w..4w),[4w..5w)
        val (qLo, qHi) = (width * 5 / 2, width * 9 / 2 - 1)
        val stats = versions(logDir).flatMap(readActs(logDir, _)).collect {
          case Act("stats", f, mm) =>
            val Array(lo, hi) = mm.split(",", 2); (f, lo.toLong, hi.toLong)
        }
        val live = snapshotFiles(logDir).values.flatten.toSet
        val scanned = stats.filter { case (f, lo, hi) =>
          live(f) && hi >= qLo && lo <= qHi
        }.map(_._1).sorted
        val skipped = live.size.toLong - scanned.length
        // counts stay STATS-based (the pruning decision); the physical
        // read tolerates a range bucket that happened to be row-empty
        // (partitionBy writes no dir for it — sparse id spaces)
        val hfs = new org.apache.hadoop.fs.Path(dataDir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val readable = scanned.map(f => s"$dataDir/$f")
          .filter(p => hfs.exists(new org.apache.hadoop.fs.Path(p)))
        s.read.parquet(readable: _*)
          .filter(col("doc_id").between(qLo, qHi))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id") * 7).cast("bigint").as("key_checksum"),
            sum(col("n_chars").cast("long")).as("chars_sum"))
          .withColumn("files_scanned", lit(scanned.length.toLong))
          .withColumn("files_skipped", lit(skipped))
      },
      Some("""WITH m AS (SELECT MAX(doc_id) AS mx FROM documents),
             |w AS (SELECT mx // 8 + 1 AS width FROM m),
             |band AS (
             |  SELECT width * 5 // 2 AS lo, width * 9 // 2 - 1 AS hi FROM w)
             |SELECT COUNT(*) AS n_rows,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
             |  CAST(3 AS BIGINT) AS files_scanned,
             |  CAST(5 AS BIGINT) AS files_skipped
             |FROM documents, band
             |WHERE doc_id BETWEEN lo AND hi""".stripMargin)),

    // PARTITION-SCOPED MERGE (upsert) — the most-used lake write op:
    // given an updates relation (changed rows + brand-new rows), only
    // the partitions that CONTAIN touched keys rewrite; everything
    // else keeps its committed files untouched (require()d in-query by
    // file identity, not just content). The merge itself is the
    // standard shape — target left-anti updates ∪ updated ∪ inserts —
    // executed per touched partition against the SNAPSHOT read, and
    // all rewrites land in ONE atomic version (readers never see a
    // half-merged table). At 100 TB partition-scoping is the whole
    // game: a 0.1%-of-keys update touching 2 of 2000 partitions
    // rewrites 0.1% of the table, not all of it.
    QueryDef(
      "q_tx_merge",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txmerge/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("n_chars").cast("long").as("n_chars"))
        val langs = docs.select("lang").distinct()
          .collect().map(_.getString(0)).sorted
        val (lmin, lmax) = (langs.head, langs.last)
        // v0: one pass, one partition dir per lang
        docs.write.partitionBy("lang").mode("overwrite").parquet(s"$dataDir/base")
        require(commit(logDir, -1,
          langs.map(l => Act("add", l, s"base/lang=$l")), langs.toSet).contains(0))

        // updates: every 10th doc of lang_max gets n_chars += 1000;
        // inserts: re-keyed new rows landing in lang_min
        val updates = docs
          .filter(col("lang") === lmax && col("doc_id") % 10 === 0)
          .withColumn("n_chars", col("n_chars") + lit(1000L))
        val inserts = docs.filter(col("lang") === lmin)
          .withColumn("doc_id", col("doc_id") + lit(2000000000L))
        val touched = Seq(lmin, lmax)

        // per touched partition: snapshot read ⊳ anti-join updates ∪
        // updates ∪ inserts, rewritten as the partition's new file
        val snap0 = snapshotFiles(logDir)
        val acts = touched.flatMap { l =>
          val cur = s.read.parquet(snap0(l).map(f => s"$dataDir/$f"): _*)
            .withColumn("lang", lit(l))
          val up = updates.filter(col("lang") === l)
          val ins = inserts.filter(col("lang") === l)
          val merged = cur.join(up.select(col("doc_id").as("uid")),
              col("doc_id") === col("uid"), "left_anti")
            .unionByName(up).unionByName(ins)
          merged.drop("lang")
            .write.mode("overwrite").parquet(s"$dataDir/merged_$l")
          Seq(Act("remove", l, s"base/lang=$l"), Act("add", l, s"merged_$l"))
        }
        require(commit(logDir, 0, acts, touched.toSet).contains(1))

        // untouched partitions must keep their v0 FILES, not just content
        val snap1 = snapshotFiles(logDir)
        langs.filterNot(touched.contains).foreach { l =>
          require(snap1(l) == snap0(l), s"untouched partition $l was rewritten")
        }
        val nRewritten = touched.size.toLong

        val rows = langs.map { l =>
          s.read.parquet(snap1(l).map(f => s"$dataDir/$f"): _*)
            .agg(count(lit(1)).as("n_rows"),
              sum(col("n_chars")).as("chars_sum"),
              sum(col("doc_id") * 7).cast("bigint").as("key_checksum"))
            .withColumn("lang", lit(l))
        }.reduce(_ unionAll _)
        rows
          .withColumn("n_partitions_rewritten", lit(nRewritten))
          .withColumn("n_partitions_total", lit(langs.length.toLong))
          .select("lang", "n_rows", "chars_sum", "key_checksum",
            "n_partitions_rewritten", "n_partitions_total")
          .orderBy("lang")
      },
      Some("""WITH l AS (
             |  SELECT MIN(lang) AS lmin, MAX(lang) AS lmax FROM documents),
             |nl AS (SELECT COUNT(DISTINCT lang) AS n FROM documents),
             |fin AS (
             |  SELECT lang, doc_id,
             |    CAST(n_chars AS BIGINT)
             |      + CASE WHEN lang = (SELECT lmax FROM l) AND doc_id % 10 = 0
             |             THEN 1000 ELSE 0 END AS n_chars
             |  FROM documents
             |  UNION ALL
             |  SELECT lang, doc_id + 2000000000, CAST(n_chars AS BIGINT)
             |  FROM documents WHERE lang = (SELECT lmin FROM l))
             |SELECT lang, COUNT(*) AS n_rows,
             |  CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum,
             |  CAST(2 AS BIGINT) AS n_partitions_rewritten,
             |  (SELECT CAST(n AS BIGINT) FROM nl) AS n_partitions_total
             |FROM fin GROUP BY lang ORDER BY lang""".stripMargin)),

    // ROW-LEVEL DELETES VIA DELETION VECTORS — the modern lake delete
    // path: instead of rewriting a partition to drop 1% of its rows,
    // commit a metadata-sized sidecar of deleted keys under the
    // reserved `_dv` partition; readers anti-join the union of live
    // DVs. Deletes become O(deleted) writes, reads pay one broadcast
    // anti-join — until PURGE materializes the deletions (rewrite
    // files minus deleted keys, drop the DVs in the same version) and
    // reads are clean again. Two stacked deletes prove DV union; the
    // in-query require() proves purge changed no row content, and the
    // oracle pins the post-delete state both before and after purge
    // via the dv-count columns.
    QueryDef(
      "q_tx_delete_vectors",
      (s, d) => {
        val base = s"${sys.props("java.io.tmpdir")}/graft_txdv/${graft.TmpSlices.key(d)}"
        val dataDir = s"$base/data"
        val logDir = s"$base/_log"
        val fsp = new org.apache.hadoop.fs.Path(base)
        fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)

        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        val langs = docs.select("lang").distinct()
          .collect().map(_.getString(0)).sorted
        docs.write.partitionBy("lang").mode("overwrite").parquet(s"$dataDir/base")
        require(commit(logDir, -1,
          langs.map(l => Act("add", l, s"base/lang=$l")), langs.toSet).contains(0))

        // delete #1 and #2: each writes ONLY its deleted keys + a log line
        def deleteWhere(cond: org.apache.spark.sql.Column, tag: String, readVer: Int): Int = {
          docs.filter(cond).select("doc_id")
            .write.mode("overwrite").parquet(s"$dataDir/dv_$tag")
          commit(logDir, readVer, Seq(Act("add", "_dv", s"dv_$tag")), Set("_dv")).get
        }
        deleteWhere(col("doc_id") % 7 === 0, "a", 0)
        deleteWhere(col("doc_id") % 11 === 3, "b", 1)

        // manifest-resolved read: per-partition (the data files don't
        // carry the partition column), DV union anti-joined when live
        def readTable(): org.apache.spark.sql.DataFrame = {
          val snap = snapshotFiles(logDir)
          val deleted = snap.get("_dv").map { dvs =>
            s.read.parquet(dvs.map(f => s"$dataDir/$f"): _*)
              .select(col("doc_id").as("del_id")).distinct()
          }
          (snap - "_dv").toSeq.sortBy(_._1).map { case (l, fs) =>
            val t = s.read.parquet(fs.map(f => s"$dataDir/$f"): _*)
              .withColumn("lang", lit(l))
            deleted.fold(t)(del => t.join(broadcast(del),
              col("doc_id") === col("del_id"), "left_anti"))
          }.reduce(_ unionAll _)
        }
        val preDvs = snapshotFiles(logDir).getOrElse("_dv", Seq.empty).length.toLong
        val pre = readTable().agg(count(lit(1)), sum(col("doc_id") * 7))
          .head()
        // PURGE: materialize the anti-join per partition, drop DVs —
        // one atomic version
        val snap = snapshotFiles(logDir)
        val purgeActs = langs.flatMap { l =>
          val cur = s.read.parquet(snap(l).map(f => s"$dataDir/$f"): _*)
          val deleted = s.read.parquet(
            snap("_dv").map(f => s"$dataDir/$f"): _*)
            .select(col("doc_id").as("del_id")).distinct()
          cur.join(broadcast(deleted), col("doc_id") === col("del_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$dataDir/purged_$l")
          Seq(Act("remove", l, s"base/lang=$l"), Act("add", l, s"purged_$l"))
        } ++ snap("_dv").map(f => Act("remove", "_dv", f))
        require(commit(logDir, versions(logDir).last, purgeActs,
          langs.toSet + "_dv").isDefined)
        val postDvs = snapshotFiles(logDir).getOrElse("_dv", Seq.empty).length.toLong
        val post = readTable().agg(count(lit(1)), sum(col("doc_id") * 7)).head()
        require(pre == post, s"purge changed content: $pre vs $post")

        readTable()
          .groupBy("lang")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id") * 7).cast("bigint").as("key_checksum"))
          .withColumn("dvs_before_purge", lit(preDvs))
          .withColumn("dvs_after_purge", lit(postDvs))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_rows,
             |  CAST(SUM(doc_id * 7) AS BIGINT) AS key_checksum,
             |  CAST(2 AS BIGINT) AS dvs_before_purge,
             |  CAST(0 AS BIGINT) AS dvs_after_purge
             |FROM documents
             |WHERE NOT (doc_id % 7 = 0 OR doc_id % 11 = 3)
             |GROUP BY lang ORDER BY lang""".stripMargin))
  )

  /** Materialize the flattened snapshot at `version` as
    * `_log/ckpt_v%06d.tsv` (add-lines only) — readers replay the
    * newest checkpoint plus the log tail after it instead of the full
    * history. The checkpoint is itself published atomically with the
    * same staged-link discipline as commits. */
  def writeCheckpoint(logDir: String, version: Int): Unit = {
    val snap = snapshotFiles(logDir, version)
    val dir = java.nio.file.Paths.get(logDir)
    val stage = dir.resolve(s".stage_ck_${System.nanoTime()}")
    val lines = snap.toSeq.sortBy(_._1).flatMap { case (p, fs) =>
      fs.map(f => s"add\t$p\t$f")
    }
    java.nio.file.Files.write(stage,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    val path = dir.resolve(f"ckpt_v$version%06d.tsv")
    try java.nio.file.Files.createLink(path, stage)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    finally java.nio.file.Files.deleteIfExists(stage)
  }

  /** Snapshot from the newest checkpoint plus the tail of the log
    * after it; None when no checkpoint exists yet. */
  def readCheckpoint(logDir: String): Option[Map[String, Seq[String]]] = {
    val dir = java.nio.file.Paths.get(logDir)
    if (!java.nio.file.Files.isDirectory(dir)) return None
    import scala.jdk.CollectionConverters._
    val cks = {
      val st = java.nio.file.Files.list(dir)
      try st.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("ckpt_v") && n.endsWith(".tsv"))
        .map(n => n.stripPrefix("ckpt_v").stripSuffix(".tsv").toInt)
        .toSeq.sorted
      finally st.close()
    }
    cks.lastOption.map { ck =>
      val live = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()
      val ckPath = java.nio.file.Paths.get(logDir, f"ckpt_v$ck%06d.tsv")
      val ckActs = java.nio.file.Files.readAllLines(ckPath).asScala.toSeq
        .filter(_.nonEmpty).map { l =>
          val Array(a, p, f) = l.split("\t", 3); Act(a, p, f)
        }
      (ckActs ++ versions(logDir).filter(_ > ck).flatMap(readActs(logDir, _)))
        .foreach {
          case Act("add", p, f)    => live(p) = live.getOrElse(p, Vector.empty) :+ f
          case Act("remove", p, f) => live(p) = live.getOrElse(p, Vector.empty).filterNot(_ == f)
          case Act("txn", _, _)    => ()
          case Act("stats", _, _)  => ()
          case Act(other, _, _)    => sys.error(s"unknown manifest action: $other")
        }
      live.toMap.filter(_._2.nonEmpty)
    }
  }
}
