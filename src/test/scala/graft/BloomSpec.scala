package graft

import graft.functions.{BloomFilterAgg, BloomHash, GraftFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bloom probe has zero false negatives over every inserted key") {
    val buf = new Array[Long](BloomHash.Words)
    val keys = (0L until 10000L).map(_ * 7919L + 13L)
    keys.foreach(BloomHash.setBits(buf, _))
    val bits = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)
    assert(keys.forall(BloomHash.mightContain(bits, _)))
  }

  test("bloom FP rate at 10k keys stays near the sizing formula") {
    val buf = new Array[Long](BloomHash.Words)
    (0L until 10000L).foreach(k => BloomHash.setBits(buf, k * 7919L + 13L))
    val bits = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf)
    // disjoint probe set (different stride/offset, checked disjoint)
    val inserted = (0L until 10000L).map(_ * 7919L + 13L).toSet
    val probes = (0L until 20000L).map(_ * 7907L + 5L).filterNot(inserted)
    val fp = probes.count(BloomHash.mightContain(bits, _))
    // (1 - e^(-kn/m))^k ≈ 0.0009 at n=10k, m=2^18, k=5; allow 5x slack
    assert(fp.toDouble / probes.size < 0.005, s"fp=$fp/${probes.size}")
  }

  test("native probe expression agrees with the UDF fallback") {
    import spark.implicits._
    BloomFilterAgg.ensureRegistered(spark)
    GraftFunctions.ensureBloomProbe(spark)
    val keys = (0L until 2000L).map(k => k * 31L).toDF("k")
    val bloom = keys.agg(expr("bloom_agg(k)").as("bits"))
    val probes = (0L until 4000L).map(k => k * 17L).toDF("p")
      .crossJoin(broadcast(bloom))
    // native catalyst expression (registered via GraftExtensions)
    val native = probes.filter(expr("bloom_might_contain(bits, p)"))
      .select("p").as[Long].collect().toSet
    // interpreted reference: same BloomHash over the collected bitmap
    val words = bloom.select("bits").as[Seq[Long]].head().toArray
    val bits = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(words)
    val expected = (0L until 4000L).map(_ * 17L)
      .filter(BloomHash.mightContain(bits, _)).toSet
    assert(native === expected)
    // membership: every inserted key that appears in the probe range
    val inserted = (0L until 2000L).map(_ * 31L).toSet
    assert(inserted.intersect((0L until 4000L).map(_ * 17L).toSet)
      .forall(native.contains))
  }

  test("bloom prefilter prunes the fact side and the final answer is exact") {
    BloomFilterAgg.ensureRegistered(spark)
    GraftFunctions.ensureBloomProbe(spark)
    val keys = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bloom = keys.agg(expr("bloom_agg(o_orderkey)").as("bits"))
    val li = Tables.lineitem(spark, sf)
    val pre = li.crossJoin(broadcast(bloom))
      .filter(expr("bloom_might_contain(bits, l_orderkey)"))
      .drop("bits")
    val exact = li.join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val (nAll, nPre, nExact) = (li.count(), pre.count(), exact.count())
    // prunes (urgent ≈ 1/5 of orders), and never below the true set
    assert(nPre < nAll, s"no pruning: $nPre of $nAll")
    assert(nPre >= nExact)
    // confirm join over the pruned stream reproduces the exact set
    val confirmed = pre.join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(confirmed.count() === nExact)
    assert(confirmed.exceptAll(exact).count() === 0L)
    assert(exact.exceptAll(confirmed).count() === 0L)
  }

  test("attribution twin matches the stream-stream join's pair semantics") {
    // every attributed (purchase, signup) the batch twin selects must be
    // one of the pairs the streaming join would emit: same user, signup
    // within (p_ts - 24h, p_ts]
    val ev = Tables.events(spark, sf)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("signup_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val pairs = purchases.join(signups,
      col("p_user") === col("s_user")
        && col("s_ts") <= col("p_ts")
        && col("s_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
    val lastTouch = pairs.groupBy("purchase_id")
      .agg(max(struct(col("s_ts"), col("signup_id"))).as("m"))
      .select(col("purchase_id"), col("m.signup_id").as("signup_id"))
    // last-touch picks exactly one pair per attributed purchase, and it
    // is a member of the full pair relation
    assert(lastTouch.count() ===
      pairs.select("purchase_id").distinct().count())
    assert(lastTouch.join(pairs.select("purchase_id", "signup_id").distinct(),
      Seq("purchase_id", "signup_id"), "left_anti").count() === 0L)
  }
}
