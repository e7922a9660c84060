package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ranking family: semantic invariants (monotone BM25 ordering, TF-IDF
  * positivity, PMI bounds) plus the broadcast-join plan shape for the
  * term-statistics frames.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bm25 emits a monotone non-increasing top-20 with positive scores") {
    val scores = SparkEntry.queries("q_bm25")(spark, sf).collect()
      .map(_.getDouble(2))
    assert(scores.nonEmpty && scores.length <= 20)
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("tfidf ranks exactly k terms per doc; idf of an every-doc term is ~0") {
    val rows = SparkEntry.queries("q_tfidf")(spark, sf).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length <= 3))
    assert(perDoc.values.forall(g => g.map(_.getInt(1)).sorted.sameElements(1 to g.length)))
    // a term appearing in every document carries zero discrimination
    rows.filter(r => r.getLong(4) === perDoc.size).foreach { r =>
      assert(math.abs(r.getDouble(5)) < 1e-9, s"idf!=0 for universal term: $r")
    }
  }

  test("pmi is bounded above by ln(N / max(c_a, c_b)) and pairs are ordered") {
    val rows = SparkEntry.queries("q_pmi")(spark, sf).collect()
    rows.foreach { r =>
      val (t1, t2) = (r.getString(0), r.getString(1))
      assert(t1 < t2, s"unordered pair $t1,$t2")
      val (cab, ca, cb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cab <= math.min(ca, cb))
    }
  }

  test("term-statistics frames broadcast; no sort-merge join on the tiny sides") {
    val p = SparkEntry.queries("q_tfidf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"plan:\n$p")
  }
}
