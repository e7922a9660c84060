package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on a pathologically skewed key") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val big = (0 until 10000).map { i =>
      (if (i % 10 == 0) i.toLong % 100 else 7L, s"payload$i")
    }.toDF("k", "payload")
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("sk", "dim")

    val plain = big.join(small, col("k") === col("sk"))
    val salted = Skew.saltedJoin(big, small, "k", "sk", salts = 8)

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
    // the salted shuffle keys include the salt column → hot key spread
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt_b"), plan)
  }
}
