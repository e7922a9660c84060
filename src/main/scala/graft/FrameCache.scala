package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoized cache of expensive shared frames (the dedup
  * family's shingle projection, the k-means/PQ point set).
  *
  * Keyed by (session, logical key) so parallel suites with separate
  * sessions never see each other's entries, and [[release]] evicts ONLY
  * the caller's session — a concurrent live session keeps its cached
  * frames (the process-global clear-all this replaces would have yanked
  * a frame mid-use). `unpersist` is try-wrapped: releasing after a
  * session stop must not throw inside the eviction loop.
  */
object FrameCache {

  private val cache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Memoized build-and-cache: the first caller pays the fill, everyone
    * else reuses the same `InMemoryRelation`. */
  def memo(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((s, key), _ => build.cache())

  /** Evict and unpersist this session's entries only. */
  def release(s: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try e.getValue.unpersist()
        catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}
