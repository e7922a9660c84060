package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The d-dimensional cell-grid skyline's two invariants:
  *
  *   1. the grid only PRUNES — the final dominance anti-join is exact,
  *      so the result cannot depend on the grid granularity `g`;
  *   2. it computes the textbook skyline — equal to a brute-force O(n²)
  *      dominance filter, and (with a constant third criterion) to the
  *      independently-derived 2-D sort-based operator.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pts() = Tables.part(spark, sf).select(
    col("p_partkey"), col("p_retailprice"), col("p_size"),
    length(col("p_name")).as("name_len"),
    col("p_retailprice").as("d1"),
    (-col("p_size")).cast("double").as("d2"),
    (-length(col("p_name"))).cast("double").as("d3"))

  private def keysAt(g: Int): Set[Long] =
    Relational.cellGridSkyline3d(pts(), g)
      .select("p_partkey").collect().map(_.getLong(0)).toSet

  test("skyline result is invariant under the grid granularity g") {
    val at8 = keysAt(8)
    assert(at8.nonEmpty)
    assert(keysAt(1) === at8, "g=1 (single cell: no pruning at all)")
    assert(keysAt(2) === at8)
    assert(keysAt(32) === at8)
  }

  test("cell-grid skyline equals the brute-force O(n²) dominance filter") {
    val rows = pts().select("p_partkey", "d1", "d2", "d3").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val brute = rows.filter { case (_, p1, p2, p3) =>
      !rows.exists { case (_, q1, q2, q3) =>
        q1 <= p1 && q2 <= p2 && q3 <= p3 && (q1 < p1 || q2 < p2 || q3 < p3)
      }
    }.map(_._1).toSet
    assert(keysAt(8) === brute)
  }

  test("with a constant third criterion the 3-D operator reduces to the 2-D skyline") {
    val flat = pts().withColumn("d3", lit(0.0))
    val via3d = Relational.cellGridSkyline3d(flat, g = 8)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val via2d = SparkEntry.queries("q_skyline")(spark, sf)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    assert(via3d === via2d)
  }
}
