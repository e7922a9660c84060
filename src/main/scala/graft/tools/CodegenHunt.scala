package graft.tools

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Codegen-failure watcher: a log4j2 appender on the root logger that
  * records Spark's silent whole-stage-codegen fallbacks ("Code grows
  * beyond 64 KB" / "Whole-stage codegen disabled" / "Failed to
  * compile") and attributes each to whatever `current` names at the
  * time. A fallback is invisible to the correctness gate — the query
  * still answers, interpreted — so this is the instrument that makes
  * it loud; QuerySurfaceSpec runs the whole declared surface under it
  * as a standing regression gate, and [[CodegenHunt]] is the
  * standalone attribution main. */
object CodegenWatch {
  @volatile var current: String = "<none>"
  private val hits = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  @volatile private var installed = false

  private final class CatchAppender extends AbstractAppender(
      "graft-codegen-watch", null, null, false, Property.EMPTY_ARRAY) {
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

  /** Attach the appender to the root logger (idempotent). */
  def install(): Unit = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val app = new CatchAppender
      app.start()
      ctx.getConfiguration.getRootLogger.addAppender(app, Level.WARN, null)
      ctx.updateLoggers()
      installed = true
    }
  }

  /** Return and clear everything recorded so far. */
  def drain(): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val out = hits.iterator().asScala.toVector
    hits.clear()
    out
  }
}

/** Standalone attribution main: runs every `SparkEntry.queries` entry
  * (or a comma-separated subset) at the given sf dir under
  * [[CodegenWatch]] and prints which queries tripped codegen
  * fallbacks. Found round 13's q_rp_recall 2048-term overflow. */
object CodegenHunt {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val s = graft.GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    s.sparkContext.setLogLevel("WARN")
    CodegenWatch.install()

    val defs = graft.SparkEntry.allDefs
      .filter(q => only.isEmpty || only.contains(q.name))
    defs.foreach { q =>
      CodegenWatch.current = q.name
      try {
        val n = q.fn(s, d).collect().length
        println(s"[hunt] ${q.name}: $n rows")
      } catch {
        case e: Throwable => println(s"[hunt] ${q.name}: ERROR ${e.getMessage.take(120)}")
      }
    }
    CodegenWatch.current = "<done>"
    val byQuery = CodegenWatch.drain().groupBy(_._1)
    val total = byQuery.values.map(_.length).sum
    println(s"\n[hunt] ==== codegen events: $total across ${byQuery.size} queries ====")
    byQuery.toSeq.sortBy(_._1).foreach { case (q, ms) =>
      println(s"[hunt] $q: ${ms.length} events")
      ms.take(2).foreach { case (_, m) => println(s"[hunt]    ${m.replace('\n', ' ')}") }
    }
    if (total == 0) println("[hunt] clean: no codegen failures observed")
    s.stop()
  }
}
