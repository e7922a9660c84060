package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanics specs: the behaviors that only matter when the data
  * is too big to scan — static and dynamic partition pruning, AQE skew
  * splitting, and the window-group-limit optimization. Each writes a
  * small partitioned/skewed layout and asserts the PLAN, because at
  * 100 TB the plan property IS the feature.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val partedDir: String = {
    val dir = Files.createTempDirectory("graft_parted").toString
    Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.mode("overwrite").partitionBy("ship_year").parquet(dir)
    dir
  }

  test("static partition pruning: a year filter reads only that partition") {
    val df = spark.read.parquet(partedDir)
      .filter(col("ship_year") === 1996)
      .agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("1996"), plan)
    // and the pruned result matches the unpartitioned filter
    val expected = Tables.lineitem(spark, sf)
      .filter(year(col("l_shipdate")) === 1996).count()
    assert(df.collect().head.getLong(0) === expected)
  }

  test("dynamic partition pruning: a dimension filter prunes fact partitions at runtime") {
    // the dim filter must NOT be constant-foldable onto the partition
    // column (a literal year filter prunes statically — also correct,
    // but a different mechanism); filtering on priority forces a
    // runtime DPP subquery on the fact's ship_year.
    val fact = spark.read.parquet(partedDir)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .withColumn("o_year", year(col("o_orderdate")))
      .select("o_year").distinct()
    val joined = fact.join(dim, fact("ship_year") === dim("o_year"))
      .agg(count(lit(1)).as("n"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dynamicpruning"),
      s"expected a dynamic pruning subquery in:\n$optimized")
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 50k rows, 98% on one key, joined against a distinct-keys side
      val big = (0 until 50000)
        .map(i => (if (i % 50 == 0) i.toLong % 1000 else 7L, s"x$i")).toDF("k", "v")
      val small = (0L until 1000L).map(k => (k, k * 2)).toDF("sk", "w")
      val joined = big.join(small.hint("merge"), col("k") === col("sk"))
      joined.collect() // execute THIS frame so AQE finalizes its plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split:\n$plan")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold").foreach(spark.conf.unset)
    }
  }

  test("rank-filter top-k uses the WindowGroupLimit optimization (no full sort-rank)") {
    val df = SparkEntry.queries("q_win_rank_topk")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("LSH bit count steers bucket population (the log(N) scaling knob)") {
    import operators.Similarity
    def maxBucket(bits: Int): Long =
      Tables.embeddings(spark, sf)
        .selectExpr(s"${Similarity.bucketExpr(bits, i => s"element_at(embedding, $i)")} AS bucket")
        .groupBy("bucket").count().agg(max("count")).head.getLong(0)
    val n = Tables.embeddings(spark, sf).count()
    val at4 = maxBucket(4)
    val at10 = maxBucket(10)
    // raising bits must shrink the worst bucket, and the probe join's
    // worst key must stay far below the quadratic regime
    assert(at10 < at4, s"bits=10 max bucket $at10 !< bits=4 max bucket $at4")
    assert(at10 <= n / 16, s"bits=10 max bucket $at10 too close to N=$n")
    // the sizing rule tracks log(N): 100× rows → +~7 bits, constant bucket
    assert(Similarity.lshBitsFor(500) < Similarity.lshBitsFor(50000))
    assert(Similarity.lshBitsFor(50000) < Similarity.lshBitsFor(5000000))
    assert(Similarity.lshBitsFor(Long.MaxValue) <= 64) // capped at dim
    assert(Similarity.ivfCellsFor(1000000) === 1000)   // √N cells
  }

  test("sized LSH/IVF variants apply the count-driven rule as N grows") {
    import operators.Similarity
    // the integer rules at the two Ns under test
    assert(Similarity.lshBitsFor(500) === 4 && Similarity.lshBitsFor(2000) === 6)
    assert(Similarity.ivfCellsFor(500) === 22 && Similarity.ivfCellsFor(2000) === 44)
    // 4× the embeddings with vec_id strides (copy 0 intact, so the
    // fixed query/centroid id sets survive) → the SAME query must come
    // back wider: 6-bit buckets instead of 4-bit, 44 cells instead of 22
    val dir = Files.createTempDirectory("graft_sized").toString
    val e = Tables.embeddings(spark, sf)
    (0 until 4).map(i => e.withColumn("vec_id", col("vec_id") + lit(i * 100000L)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val maxSmall = SparkEntry.queries("q_sim_lsh_scaled")(spark, sf)
      .agg(max(col("bucket")).cast("long")).head.getLong(0)
    val maxBig = SparkEntry.queries("q_sim_lsh_scaled")(spark, dir)
      .agg(max(col("bucket")).cast("long")).head.getLong(0)
    assert(maxSmall < 16, s"N=500 must bucket in 4 bits, saw bucket $maxSmall")
    assert(maxBig >= 16 && maxBig < 64,
      s"N=2000 must bucket in 6 bits (some bucket ≥ 16), saw max $maxBig")
    val cellSmall = SparkEntry.queries("q_sim_ivf_scaled")(spark, sf)
      .agg(max(col("cell")).cast("long")).head.getLong(0)
    val cellBig = SparkEntry.queries("q_sim_ivf_scaled")(spark, dir)
      .agg(max(col("cell")).cast("long")).head.getLong(0)
    assert(cellSmall < 22, s"N=500 cells live in [0,22), saw $cellSmall")
    assert(cellBig < 44, s"N=2000 cells live in [0,44), saw $cellBig")
  }

  test("percentile histogram bisection: candLimit moves rounds, never the (exact) result") {
    import operators.Aggregates
    // sf0.001 lineitem ≈ 6k rows/group: the default candLimit (524288)
    // collects after pass 1 with ZERO bin rounds; candLimit = 64 forces
    // the bisection loop through multiple 1024-way narrowing rounds
    // (6k → ≤64 needs ≥ 1; near-unique doubles may take 2). The results
    // must agree bit-for-bit — the limit only moves state bounds, the
    // selection is exact at any setting. This is the property that
    // makes the operator safe at 10¹¹ rows/group: state is O(1024)
    // per (group, spec) while narrowing and ≤ candLimit at the collect,
    // both independent of n.
    val spec = Seq("l_extendedprice" -> Seq(0.5 -> "p50", 0.95 -> "p95"),
      "l_quantity" -> Seq(0.25 -> "q25"))
    val wide = Aggregates.sortPercentiles(
      Tables.lineitem(spark, sf), "l_returnflag", spec)
    val tight = Aggregates.sortPercentiles(
      Tables.lineitem(spark, sf), "l_returnflag", spec, candLimit = 64)
    assert(tight.exceptAll(wide).count() === 0 && wide.exceptAll(tight).count() === 0)
    // and the selection agrees with the built-in exact percentile to
    // float tolerance — NOT bit-for-bit: Spark's Percentile interpolates
    // with a different fp arrangement than lo + frac·(hi − lo), which is
    // the quantile_cont form the DuckDB oracle pins exactly (the hash
    // gate for bit-exactness is q_agg_percentile's CORRECTNESS row)
    val builtin = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)").as("p50"),
        expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.95)").as("p95"),
        expr("percentile(CAST(l_quantity AS DOUBLE), 0.25)").as("q25"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    wide.collect().foreach { r =>
      val (p50, p95, q25) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(1) - p50) <= math.abs(p50) * 1e-12)
      assert(math.abs(r.getDouble(2) - p95) <= math.abs(p95) * 1e-12)
      assert(math.abs(r.getDouble(3) - q25) <= math.abs(q25) * 1e-12)
    }
  }

  test("SimHash band width tracks log(N) and the sized query equals the fixed one at small N") {
    import operators.Dedup
    // the integer rule: smallest b in [8,15] with 2^b ≥ ⌈N/8⌉ (target
    // bucket 8 — band width is recall-neutral under the 4-band
    // pigeonhole, so the rule leans wide; see simhashBandBitsFor)
    assert(Dedup.simhashBandBitsFor(500) === 8) // floor — the classic setting
    assert(Dedup.simhashBandBitsFor(2000) === 8) // 2^8 ≥ 250
    assert(Dedup.simhashBandBitsFor(5000) === 10)
    assert(Dedup.simhashBandBitsFor(150000) === 15) // the sf3 point that saturated 8-bit bands
    assert(Dedup.simhashBandBitsFor(Long.MaxValue) === 15) // 60-bit signature cap (sign-bit trap)
    // monotone, never past the cap
    assert(Dedup.simhashBandBitsFor(1 << 20) >= Dedup.simhashBandBitsFor(1 << 16))
    // at N=500 the rule lands on the classic 32/8 setting, so the sized
    // query's simhash regime must reproduce the fixed fixture's pairs
    // and Hamming distances bit-for-bit
    val fixed = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .selectExpr("a", "b", "CAST(hamming AS DOUBLE) AS score")
    val sized = SparkEntry.queries("q_dedup_simhash_sized")(spark, sf)
    assert(sized.filter(col("method") =!= "simhash").count() === 0,
      "below the cap the gate must pick the SimHash regime")
    val sizedScores = sized.select("a", "b", "score")
    assert(sizedScores.exceptAll(fixed).count() === 0 && fixed.exceptAll(sizedScores).count() === 0)
  }

  test("past the band cap the sized entry routes to the MinHash pair relation") {
    import operators.Dedup
    // capDocs forced below the fixture size: the gate must take the
    // fallback branch and reproduce minhashPairs exactly — the
    // documented MinHash fallback is executable, not prose
    val gated = Dedup.simhashPairsGated(spark, sf, capDocs = 1L)
    assert(gated.filter(col("method") =!= "minhash").count() === 0)
    val viaGate = gated.select("a", "b", "score")
    val direct = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .selectExpr("a", "b", "CAST(jaccard AS DOUBLE) AS score")
    assert(viaGate.exceptAll(direct).count() === 0 && direct.exceptAll(viaGate).count() === 0)
    // and the production threshold is exactly where the band rule runs
    // out of wider bands: one doc past it, ⌈N/8⌉ exceeds 2^15
    assert(Dedup.SimhashCapDocs === 262144L)
    assert(Dedup.simhashBandBitsFor(Dedup.SimhashCapDocs) === 15)
  }

  test("sized IVF gates the assignment strategy on the computed cell count") {
    import operators.{Similarity, Dedup => _}
    // cap forced below the fixture's cell count → the two-level branch
    // must run and reproduce q_ivf_hier exactly
    val hierViaGate = Similarity.ivfSizedAnn(spark, sf, flatCellCap = 1)
    val hierDirect = SparkEntry.queries("q_ivf_hier")(spark, sf)
    assert(hierViaGate.exceptAll(hierDirect).count() === 0
      && hierDirect.exceptAll(hierViaGate).count() === 0)
    // cap above it → the flat branch, bit-for-bit the sized flat IVF
    val cells = Similarity.ivfCellsFor(Tables.embeddings(spark, sf).count())
    assert(cells <= 64, s"fixture should sit below the production cap, got $cells")
    val flatViaGate = Similarity.ivfSizedAnn(spark, sf)
    val flatDirect = Similarity.ivfAnn(spark, sf, cells)
    assert(flatViaGate.exceptAll(flatDirect).count() === 0
      && flatDirect.exceptAll(flatViaGate).count() === 0)
  }

  test("percentile bisection fires past the 26M-row trigger and stays exact") {
    import operators.Aggregates
    // 30M uniform values in one group: m = 8n/800 + 16 ≈ 300k exceeds
    // candLimit 262144, so at least one histogram-bisection round MUST
    // run — the path had never executed outside its unit fixtures
    // (n < 26M/group at every driver SF). Percentiles of 0..n−1 have
    // closed forms, so exactness is checked against ground truth, not
    // an estimate.
    val n = 30000000L
    val df = spark.range(n).selectExpr("'ALL' AS g", "CAST(id AS DOUBLE) AS v")
    val r = Aggregates.sortPercentiles(df, "g",
      Seq("v" -> Seq(0.5 -> "p50", 0.95 -> "p95"))).collect()
    assert(Aggregates.lastBisectRounds.get() >= 1,
      "the bisection round must actually fire at n = 30M")
    val row = r.head
    def expected(p: Double): Double = p * (n - 1)
    assert(math.abs(row.getAs[Double]("p50") - expected(0.5)) < 1e-6)
    assert(math.abs(row.getAs[Double]("p95") - expected(0.95)) < 1e-6)
  }

  test("sampled substring screen is a content-consistent subset of the full screen") {
    // mod-sampling is by window CONTENT: both docs keep or drop a
    // shared window together, so every sampled pair exists in the full
    // screen with at least as many shared windows — a start-position
    // stride would violate this whenever two docs carry the same
    // window at different parities
    val full = SparkEntry.queries("q_dedup_substring")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sampled = SparkEntry.queries("q_dedup_substring_sampled")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    sampled.foreach { case (pair, n) =>
      assert(full.contains(pair), s"sampled pair $pair missing from full screen")
      assert(n <= full(pair), s"sampled count $n exceeds full ${full(pair)} for $pair")
    }
  }

  test("IVF multi-probe: more probed cells buys recall with proportional candidates") {
    import operators.Similarity
    def row(np: Int): (Long, Double) = {
      val r = Similarity.ivfProbeRecall(spark, sf, cells = 22, nprobe = np).head
      (r.getAs[Long]("n_cand"), r.getAs[Double]("recall_at_k"))
    }
    val (c1, r1) = row(1)
    val (c2, r2) = row(2)
    val (c4, r4) = row(4)
    // candidates strictly grow with nprobe; recall never drops (the
    // probe set only widens), and must strictly improve somewhere on
    // the curve — the lever the index build never has to pay for
    assert(c1 < c2 && c2 < c4, s"candidates must grow: $c1, $c2, $c4")
    assert(r1 <= r2 && r2 <= r4, s"recall must not drop: $r1, $r2, $r4")
    assert(r4 > r1, s"nprobe=4 recall $r4 must beat nprobe=1 $r1")
  }

  test("ANN recall/cost surface moves the right way with bits and tables") {
    import operators.Similarity
    def row(bits: Int, tables: Int): (Long, Double) = {
      val r = Similarity.annRecall(spark, sf, bits, tables).head
      (r.getAs[Long]("n_cand"), r.getAs[Double]("recall_at_k"))
    }
    val (cand8x1, rec8x1) = row(8, 1)
    val (cand10x1, rec10x1) = row(10, 1)
    val (cand8x4, rec8x4) = row(8, 4)
    // more hyperplane bits → fewer scored candidates, no recall gain
    assert(cand10x1 < cand8x1, s"bits=10 scored $cand10x1 !< bits=8 $cand8x1")
    assert(rec10x1 <= rec8x1)
    // more hash tables → more scored candidates, recall strictly up
    assert(cand8x4 > cand8x1, s"tables=4 scored $cand8x4 !> tables=1 $cand8x1")
    assert(rec8x4 > rec8x1, s"tables=4 recall $rec8x4 !> tables=1 $rec8x1")
  }

  test("random-projection recall rises with the projected dimension") {
    import operators.Similarity
    def rec(dim: Int): Double =
      Similarity.rpRecall(spark, sf, projDim = dim).head.getAs[Double]("recall_at_k")
    val (r8, r16, r32) = (rec(8), rec(16), rec(32))
    // the lower dims are prefixes of the same sign matrix, so more
    // dimensions refine the distance estimate IN EXPECTATION — the JL
    // guarantee is distributional, not per-instance, so a single step
    // may dip slightly on a particular fixture; allow a small per-step
    // tolerance and keep only the end-to-end 4×-span claim strict
    val tol = 0.05
    assert(r8 <= r16 + tol && r16 <= r32 + tol,
      s"recall dropped beyond JL noise tolerance: $r8, $r16, $r32")
    assert(r32 > r8, s"proj_dim=32 recall $r32 must beat proj_dim=8 $r8")
  }

  test("distributed ntile matches the built-in global-window ntile exactly") {
    import org.apache.spark.sql.expressions.Window
    val builtin = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        ntile(4).over(Window.orderBy(col("o_orderkey"))).as("quartile"))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
    val distributed = SparkEntry.queries("q_win_ntile")(spark, sf)
    assert(distributed.exceptAll(builtin).count() === 0L)
    assert(builtin.exceptAll(distributed).count() === 0L)
  }

  test("runtime bloom filter from a selective dim side prunes the fact scan") {
    // At 100 TB the fact side of a selective join should be pre-filtered
    // by a bloom built from the dim side's join keys, before the
    // shuffle. Spark 4's InjectRuntimeFilter does exactly this; the
    // default size thresholds (10 MB scans) are tuned for clusters, so
    // pin them down to make the tiny test tables eligible — the
    // assertion is that the mechanism engages, not the threshold.
    val conf = spark.conf
    val overrides = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation side must be SMALLER than this (a bloom of a huge side
      // is useless), application side must be BIGGER than this (a tiny
      // scan isn't worth filtering)
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = overrides.map { case (k, _) => k -> conf.getOption(k) }
    overrides.foreach { case (k, v) => conf.set(k, v) }
    try {
      val dim = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val q = Tables.lineitem(spark, sf).join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloom"),
        s"expected an injected bloom runtime filter on the fact side:\n$plan")
      q.collect() // and it must still execute correctly with the filter in place
    } finally {
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
    }
  }
}
