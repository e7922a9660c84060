package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("j").toString
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    println("=== diff rows (back minus orig) ===")
    back.exceptAll(events).show(3, false)
    println("=== orig sample ===")
    events.orderBy("event_id").show(3, false)
    println("=== back sample ===")
    back.orderBy("event_id").show(3, false)
    val f = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".json")).head
    println(scala.io.Source.fromFile(f).getLines().take(2).mkString("\n"))
    spark.stop()
  }
}
