package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped cached-stage registry — the one pattern behind the
  * MinHash/SimHash/confirmed-pair/LSH-signature stages: expensive
  * shared intermediates are computed once per (session, inputs) key,
  * kept resident for the session, and every consumer query serves from
  * the materialized relation instead of re-running the scan.
  *
  * Contract with builders: `build` must return a DataFrame that is
  * already `.cache()`d AND action-materialized (counted) — planning
  * consumers against a cold view lets Catalyst inline the stage into
  * each consumer (the round-4 q38 regression) and gives joins garbage
  * size estimates (the 100x cold confirmedPairs misplay).
  *
  * Storage-aware: a map hit whose cache was cleared behind our back
  * (`spark.catalog.clearCache()`, executor loss) rebuilds instead of
  * silently re-running the full lineage per consumer.
  *
  * [[release]] is the memory discipline for long-lived sessions: the
  * 100x full-surface bench measured these stages squeezing an 8 g heap
  * into GC thrash (BASELINE.md, BENCH_100X_r05.json) — a service
  * embedding this library drops a finished dataset's stages instead of
  * holding every (session, dir) resident forever. Release is a
  * quiescent-point API: a build racing a release may re-insert its
  * stage, which stays correct (it is simply resident again).
  */
private[graft] final class StageCache[K] {
  private val map = new java.util.concurrent.ConcurrentHashMap[K, DataFrame]()

  /** Number of times a stage was actually built (not served) — specs pin
    * the sharing contract ("N queries, one build") on this. */
  val builds = new java.util.concurrent.atomic.AtomicInteger(0)

  def getOrBuild(key: K)(build: => DataFrame): DataFrame = {
    val hit = map.get(key)
    if (hit != null && hit.storageLevel.useMemory) return hit
    synchronized {
      val again = map.get(key)
      if (again != null && again.storageLevel.useMemory) return again
      builds.incrementAndGet()
      val built = build
      map.put(key, built)
      built
    }
  }

  /** Unpersist and forget every stage whose key matches `owns`; returns
    * how many stages were dropped. */
  def release(owns: K => Boolean): Int = {
    import scala.jdk.CollectionConverters._
    val victims = map.keySet.asScala.filter(owns).toVector
    victims.foreach { k =>
      val df = map.remove(k)
      if (df != null) df.unpersist(blocking = false)
    }
    victims.size
  }
}

/** Umbrella release over every stage registry in the library, keyed by
  * session: `StageRegistry.releaseSession(spark)` after finishing a
  * dataset returns executor storage memory to the pool. */
object StageRegistry {
  def releaseSession(spark: SparkSession): Int =
    Dedup.releaseStages(spark) + Similarity.releaseStages(spark) +
      TextAnalysis.releaseStages(spark) + Retrieval.releaseStages(spark)
}
