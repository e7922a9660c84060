package graft

import graft.functions.MinHashSignature
import graft.reference.{SensorSchema, TemPipelines}
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic invariants (SURVEY.md §5: "property tests for algebraic
  * invariants — dedup idempotence, avg consistency, JSON round-trip on
  * the sensor schema").
  *
  * Pure-JVM properties run per-case; Spark-touching properties pack all
  * generated cases into ONE DataFrame so the suite costs a handful of
  * jobs, not hundreds.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Deterministic sampler (no scalatest-scalacheck bridge in the
    * offline dependency cache): n cases from fixed seeds. */
  private def samples[A](gen: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // ---- pure JVM: MinHash signature algebra ----

  private val hashGen = Gen.chooseNum(0L, 4294967295L)

  test("MinHash merge is commutative and associative (shuffle-order safe)") {
    val a = new MinHashSignature()
    def sig(l: List[Long]) = l.foldLeft(a.zero)(a.reduce)
    samples(Gen.zip(Gen.listOf(hashGen), Gen.listOf(hashGen), Gen.listOf(hashGen)))
      .foreach { case (xs, ys, zs) =>
        // merge mutates its left buffer — rebuild signatures per use
        assert(a.merge(sig(xs), sig(ys)).toSeq === a.merge(sig(ys), sig(xs)).toSeq)
        assert(a.merge(a.merge(sig(xs), sig(ys)), sig(zs)).toSeq
          === a.merge(sig(xs), a.merge(sig(ys), sig(zs))).toSeq)
      }
  }

  test("MinHash signature is insensitive to duplicate and reordered input") {
    val a = new MinHashSignature()
    def sig(l: List[Long]) = l.foldLeft(a.zero)(a.reduce).toSeq
    samples(Gen.nonEmptyListOf(hashGen)).foreach { xs =>
      assert(sig(xs) === sig(xs.reverse))
      assert(sig(xs) === sig(new scala.util.Random(42).shuffle(xs)))
      assert(sig(xs) === sig(xs ++ xs))
    }
  }

  // ---- BPE merge loop: greedy-run and compounding semantics ----

  test("BPE merges runs greedily left-to-right and compounds merged tokens") {
    import spark.implicits._
    // "a a a a": greedy non-overlap merges positions (1,2) and (3,4) —
    // NOT the overlapping (2,3) — leaving [a+a, a+a]; round 2 must then
    // merge the compound pair (a+a, a+a), proving later rounds see the
    // rewritten corpus and merged tokens merge like any other.
    val docs = Seq("a a a a", "a a b").toDF("text")
    val out = functions.Vocab.bpeMergesFrame(spark, docs, 2)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(out(0) === ((1, "a+a", 4))) // 3 pairs in doc1 + 1 in doc2
    assert(out(1) === ((2, "a+a+a+a", 1))) // one compound pair survives in doc1
  }

  // ---- Spark, one frame for all cases: sensor JSON round trip ----

  private def sensorRow(id: Int, tVals: Seq[Option[Float]]): Row = {
    val fixed: Seq[Any] = Seq(
      id, s"2021-02-11 14:32:$id", 18.5f, 23.4f, "23.6036",
      17.5f, 21.0f, 24.1f, 19.5f, 16.8f, 21.1f)
    val ts: Seq[Any] = tVals.map(_.orNull)
    val tail: Seq[Any] = Seq(925.44f, 0.53f, null, null)
    Row.fromSeq(fixed ++ ts ++ tail)
  }

  test("JSON round-trip and Tem(Avg) null-propagation over generated sensor rows") {
    val floatGen = Gen.chooseNum(-50f, 150f)
    val tGen = Gen.listOfN(10, Gen.option(floatGen))
    val cases = Gen.listOfN(100, tGen).sample.get.zipWithIndex
      .map { case (ts, i) => sensorRow(i, ts) }
    val df = spark.createDataFrame(
      java.util.Arrays.asList(cases: _*),
      SensorSchema.consumer)

    // round trip through the exact wire expression tree
    val back = TemPipelines.parseKeyValue(
      df.selectExpr("CAST(id AS STRING) AS key", "to_json(struct(*)) AS value")
        .selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value"))
    assert(back.exceptAll(df).count() === 0L)
    assert(df.exceptAll(back).count() === 0L)

    // Tem(Avg): null iff any T null; else the float-fold mean
    val got = TemPipelines.withTemAvg(df)
      .select("id", "Tem(Avg)").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    cases.foreach { row =>
      val id = row.getInt(0)
      val ts = (11 until 21).map(i => Option(row.get(i)).map(_.asInstanceOf[Float]))
      if (ts.exists(_.isEmpty)) assert(got(id).isEmpty, s"id=$id expected null avg")
      else {
        val expected = ts.flatten.foldLeft(0f)(_ + _).toDouble / 10.0
        assert(got(id).contains(expected), s"id=$id")
      }
    }
  }

  test("hash dedup is idempotent over generated duplicate-heavy corpora") {
    import spark.implicits._
    val texts = Gen.listOfN(200,
      Gen.oneOf("alpha beta", "gamma delta", "epsilon", "zeta eta theta"))
      .sample.get.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    val once = df.groupBy(org.apache.spark.sql.functions.sha2(
        org.apache.spark.sql.functions.col("text"), 256))
      .agg(org.apache.spark.sql.functions.min("doc_id").as("keep"))
    assert(once.count() <= 4L)
    val again = once.distinct()
    assert(again.count() === once.count())
  }

  // ---- input-layout invariance -------------------------------------
  // The reproducibility claims ("same rows on every run, on any cluster
  // size") reduce to: the result is a pure function of the DATA, never
  // of its partitioning or arrival order. Re-running the same plan
  // wouldn't test that (Spark re-plans identically); these feed the
  // operators adversarially re-partitioned, re-ordered inputs.

  test("connected components are invariant to edge order and partitioning") {
    import spark.implicits._
    // deterministic scattered edge list (filtered Gens can fail to
    // sample; arithmetic scatter gives the same coverage reproducibly)
    val edges = (0 until 120).map { i =>
      val a = (i * 37 + 5) % 60; val b = (i * 53 + 11) % 60
      val bb = if (a == b) (b + 1) % 60 else b
      (math.min(a, bb).toLong, math.max(a, bb).toLong)
    }
    val df1 = edges.toDF("a", "b")
    val df2 = edges.reverse.toDF("a", "b").repartition(7)
    val l1 = operators.Clustering.connectedComponents(df1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val l2 = operators.Clustering.connectedComponents(df2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(l1 === l2)
  }

  test("exact percentiles are invariant to input partitioning") {
    val li = Tables.lineitem(spark, sf)
    val spec = Seq("l_extendedprice" -> Seq(0.5 -> "p50", 0.9 -> "p90"))
    def run(df: org.apache.spark.sql.DataFrame) =
      operators.Aggregates.sortPercentiles(df, "l_returnflag", spec)
        .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(run(li) === run(li.repartition(17)))
  }

  test("hash-sample membership is a pure key function (partitioning-independent)") {
    val li = Tables.lineitem(spark, sf)
    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] = df
      .filter(org.apache.spark.sql.functions.expr(
        s"${functions.TextAnalysis.tokHash("concat(l_orderkey, '#', l_linenumber)")} % 100 < 10"))
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(keys(li) === keys(li.repartition(13)))
    assert(keys(li).nonEmpty)
  }

  // ---- pure JVM: transactional-manifest protocol algebra ----
  // Random edit scripts over a real on-disk log (no Spark): every
  // prefix snapshot equals a driver-side replay; checkpoints never
  // change any read; restore rewinds exactly and composes; the
  // file-level diff is consistent and composes across windows.

  /** One random manifest edit: add a fresh file to a partition, or
    * remove a live one (falls back to add when the partition is
    * empty). Applies to both the real log and the model. */
  private case class TxScript(steps: Seq[(Int, Boolean)])
  private val txScriptGen: Gen[TxScript] = for {
    n <- Gen.chooseNum(3, 18)
    steps <- Gen.listOfN(n, for {
      part <- Gen.chooseNum(0, 3)
      isAdd <- Gen.prob(0.65)
    } yield (part, isAdd))
  } yield TxScript(steps)

  private def runScript(tag: String, script: TxScript):
      (String, Vector[Map[String, Vector[String]]]) = {
    import operators.TxLog, operators.TxLog.Act
    val log = s"${sys.props("java.io.tmpdir")}/graft_txprop/$tag"
    val p = java.nio.file.Paths.get(log)
    if (java.nio.file.Files.isDirectory(p)) {
      val st = java.nio.file.Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally st.close()
    }
    var model = Map.empty[String, Vector[String]]
    val states = Vector.newBuilder[Map[String, Vector[String]]]
    var nextFile = 0
    script.steps.zipWithIndex.foreach { case ((partIdx, isAdd), i) =>
      val part = s"p$partIdx"
      val live = model.getOrElse(part, Vector.empty)
      val acts = if (isAdd || live.isEmpty) {
        nextFile += 1
        Seq(Act("add", part, s"f$nextFile"))
      } else Seq(Act("remove", part, live.last))
      val v = TxLog.commit(log, i - 1, acts, Set(part))
      assert(v.contains(i), s"sequential commit must land at $i, got $v")
      acts.foreach {
        case Act("add", pt, f) =>
          model = model.updated(pt, model.getOrElse(pt, Vector.empty) :+ f)
        case Act("remove", pt, f) =>
          model = model.updated(pt, model.getOrElse(pt, Vector.empty).filterNot(_ == f))
        case _ => ()
      }
      states += model.filter(_._2.nonEmpty)
    }
    (log, states.result())
  }

  test("manifest replay: every prefix snapshot equals the model, with and without checkpoints") {
    import operators.TxLog
    samples(txScriptGen, 25).zipWithIndex.foreach { case (script, k) =>
      val (log, states) = runScript(s"replay_$k", script)
      states.indices.foreach { v =>
        assert(TxLog.snapshotFiles(log, asOf = v, useCheckpoint = false) === states(v),
          s"case $k, asOf=$v")
      }
      // a checkpoint mid-log must not change ANY read at or after it,
      // and reads before it fall back to pure replay
      val ck = states.length / 2
      TxLog.writeCheckpoint(log, ck)
      states.indices.foreach { v =>
        assert(TxLog.snapshotFiles(log, asOf = v) === states(v),
          s"case $k, asOf=$v with checkpoint at $ck")
      }
    }
  }

  test("restore rewinds exactly and composes: restore(v) then restore(head) round-trips") {
    import operators.TxLog
    samples(txScriptGen, 25).zipWithIndex.foreach { case (script, k) =>
      val (log, states) = runScript(s"restore_$k", script)
      val head = states.length - 1
      val target = head / 2
      TxLog.restore(log, toVersion = target) match {
        case Some(v) =>
          assert(v === head + 1, s"case $k")
          assert(TxLog.snapshotFiles(log) === states(target), s"case $k rewind")
          // history is intact
          assert(TxLog.snapshotFiles(log, asOf = head) === states(head), s"case $k history")
          // compose: restore back to the pre-restore head
          assert(TxLog.restore(log, toVersion = head).contains(head + 2), s"case $k forward")
          assert(TxLog.snapshotFiles(log) === states(head), s"case $k round-trip")
        case None =>
          // legal only when the target state already equals the head state
          assert(states(target) === states(head), s"case $k no-op restore")
      }
    }
  }

  test("file diff: irreflexive, exact vs model, and composes across windows") {
    import operators.TxLog
    samples(txScriptGen, 25).zipWithIndex.foreach { case (script, k) =>
      val (log, states) = runScript(s"diff_$k", script)
      val head = states.length - 1
      val mid = head / 2
      assert(TxLog.fileDiff(log, head, head) === ((Seq.empty, Seq.empty)), s"case $k")
      def flat(m: Map[String, Vector[String]]): Set[String] = m.values.flatten.toSet
      val (rem, add) = TxLog.fileDiff(log, 0, head)
      assert(rem.toSet === (flat(states(0)) -- flat(states(head))), s"case $k removed")
      assert(add.toSet === (flat(states(head)) -- flat(states(0))), s"case $k added")
      // composition: applying (0→mid) then (mid→head) equals (0→head)
      val (r1, a1) = TxLog.fileDiff(log, 0, mid)
      val (r2, a2) = TxLog.fileDiff(log, mid, head)
      val net = (flat(states(0)) -- r1.toSet ++ a1.toSet -- r2.toSet ++ a2.toSet)
      assert(net === flat(states(head)), s"case $k composition")
    }
  }
}
