package graft

import org.apache.spark.sql.SparkSession

/** Session factory: local[N], 32-ish shuffle partitions (local thread
  * count, not the 200 default sized for real clusters), UTC, AQE on by
  * default in Spark 4, and graft's native function extensions
  * installed. Cluster deployments reach the same setup with
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftSession {
  def create(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
