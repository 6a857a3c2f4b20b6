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

/** Memoized per-(session, input-dir) ON-DISK artifacts — the persisted
  * indexes (q127 BM25 postings, q131 two-level IVF). The determinism
  * contract (a gated query may be invoked repeatedly) meets the
  * write-once index lifecycle via the same memoization discipline as
  * [[StageCache]], and [[release]] is the matching retirement: the
  * artifact dir is DELETED with the session's stages, so a regenerated
  * corpus under the same path can never be served stale answers by the
  * persisted serving shape while the live shapes rebuild. */
private[ops] final class TempArtifacts(prefix: String) {
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** The artifact dir for (session, input dir), built on first use. A
    * build that throws must not leak its half-written directory: the
    * memo registers nothing on failure (computeIfAbsent propagates the
    * exception without inserting), so [[release]] would never see the
    * orphan — delete it here before rethrowing. */
  def getOrCreate(spark: SparkSession, dir: String)(build: String => Unit): String =
    dirs.computeIfAbsent((spark, dir), { _ =>
      val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
      try build(tmp)
      catch {
        case e: Throwable =>
          TempArtifacts.deleteRecursively(java.nio.file.Paths.get(tmp))
          throw e
      }
      tmp
    })

  /** Visible for specs: the registered artifact dir, if any. */
  def peek(spark: SparkSession, dir: String): Option[String] =
    Option(dirs.get((spark, dir)))

  /** Drop every artifact owned by `spark`: map entry removed (releasing
    * the session reference) and the on-disk dir deleted. */
  def release(spark: SparkSession): Int = {
    val it = dirs.entrySet().iterator()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        TempArtifacts.deleteRecursively(java.nio.file.Paths.get(e.getValue))
        it.remove()
        n += 1
      }
    }
    n
  }
}

private[ops] object TempArtifacts {
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      // Files.walk holds directory handles until closed — leaving the
      // stream open leaks file descriptors for the life of the JVM
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}

/** Umbrella release over every stage registry in the library, keyed by
  * session: `StageRegistry.releaseSession(spark)` after finishing a
  * dataset returns executor storage memory to the pool. */
object StageRegistry {
  def releaseSession(spark: SparkSession): Int =
    Dedup.releaseStages(spark) + Similarity.releaseStages(spark) +
      TextAnalysis.releaseStages(spark) + Retrieval.releaseStages(spark) +
      Sketches.releaseSession(spark) + ImageIndex.releaseStages(spark) +
      LshIndex.releaseStages(spark) + Hybrid.releaseStages(spark) +
      Pipeline.releaseStages(spark) + Export.releaseStages(spark)
}
