package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def q1(mk: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column) =
      Tables.lineitem(spark, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          mk(col("l_quantity"), 2).as("sum_qty"),
          mk(col("l_extendedprice"), 2).as("sum_base_price"),
          mk(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          mk(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f; f; f
      println(f"$tag: ${(System.nanoTime()-t0)/3e9}%.3f s/run")
    }
    time("dec28")(q1((c, s) => sum(c.cast(DecimalType(28, s))).cast("double")).collect())
    time("dec18")(q1((c, s) => sum(c.cast(DecimalType(18, s))).cast("double")).collect())
    time("double")(q1((c, _) => sum(c)).collect())
    time("longq")(q1((c, s) => (sum(floor(c * math.pow(10, s)).cast("long")) / math.pow(10, s))).collect())
    spark.stop()
  }
}
