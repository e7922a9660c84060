package graft.tools

/** Prints the executed (post-AQE) physical plan of any `SparkEntry`
  * query — the `.explain("formatted")`-style feedback loop for plan
  * iteration, runnable outside the test JVM.
  *
  * Usage: runMain graft.tools.PlanDump <queryName> [sfDir]
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.tools.PlanDump <queryName> [sfDir]")
      sys.exit(2)
    }
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, d)
    val n = df.collect().length
    println(s"== $name @ $d ($n rows) — executed plan ==")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
