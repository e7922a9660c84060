package graft.tools

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}

/** Hunts whole-stage-codegen failures across the declared query
  * surface: attaches a log4j2 appender to the root logger, runs every
  * `SparkEntry.queries` entry at the given sf dir, and attributes any
  * "Code grows beyond 64 KB" / "codegen disabled" / "Failed to
  * compile" event to the query running when it fired. A silent
  * interpreted fallback is invisible to the correctness gate — this is
  * the instrument that makes it loud. */
object CodegenHunt {
  @volatile private var current: String = "<startup>"
  private val hits = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()

  private final class CatchAppender extends AbstractAppender(
      "graft-codegen-hunt", null, null, false, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      val msg = event.getMessage.getFormattedMessage
      val interesting =
        msg.contains("grows beyond 64 KB") ||
        msg.contains("Whole-stage codegen disabled") ||
        msg.contains("Failed to compile") ||
        msg.contains("Cannot compile")
      if (interesting) hits.add((current, msg.take(300)))
    }
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val s = graft.GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    s.sparkContext.setLogLevel("WARN")

    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val app = new CatchAppender
    app.start()
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()

    val defs = graft.SparkEntry.allDefs
      .filter(q => only.isEmpty || only.contains(q.name))
    defs.foreach { q =>
      current = q.name
      try {
        val n = q.fn(s, d).collect().length
        println(s"[hunt] ${q.name}: $n rows")
      } catch {
        case e: Throwable => println(s"[hunt] ${q.name}: ERROR ${e.getMessage.take(120)}")
      }
    }
    current = "<done>"
    import scala.jdk.CollectionConverters._
    val byQuery = hits.iterator().asScala.toSeq.groupBy(_._1)
    println(s"\n[hunt] ==== codegen events: ${hits.size()} across ${byQuery.size} queries ====")
    byQuery.toSeq.sortBy(_._1).foreach { case (q, ms) =>
      println(s"[hunt] $q: ${ms.length} events")
      ms.take(2).foreach { case (_, m) => println(s"[hunt]    ${m.replace('\n', ' ')}") }
    }
    if (hits.isEmpty) println("[hunt] clean: no codegen failures observed")
    s.stop()
  }
}
