package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Cached snapshot of the meta catalog — the analog of the reference's
 * `MetaCache` (`server/src/main/java/timely/server/store/MetaCache.java:47-51`:
 * a Caffeine cache rescanned every `cacheRefreshMinutes`, with fresh entries
 * added straight from the ingest path, `DataStore.java:483`). A suggest /
 * lookup / metrics-report load at serving QPS must not rescan the catalog per
 * request: [[frame]] serves one persisted, pre-materialized DataFrame and
 * reloads it lazily (clock-injectable — no scheduler thread to leak, unlike
 * the reference's `ScheduledExecutorService`).
 *
 * Refresh semantics, two-tier:
 *  - [[markDirty]] (the ingest-side `addAll` analog): the next [[frame]]
 *    BLOCKS for fresh data, so a put is visible to the very next suggest —
 *    the visibility guarantee the HTTP spec pins.
 *  - age (`refreshMs` elapsed): the triggering request reloads while every
 *    CONCURRENT request keeps serving the old snapshot (stale-while-
 *    revalidate) — the catalog rescan never stalls the serving pool the way
 *    a single coarse lock would.
 * A dirty mark that lands DURING a reload survives it (generation counter),
 * so a put can never be masked by an in-flight refresh that started before
 * its meta rows were written.
 *
 * `refreshMs = 0` degenerates to reload-per-access (caching off); the
 * reference's `cacheRefreshMinutes = -1` default likewise ships with the
 * scheduled rescan disabled (`MetaCacheProperties.java:11`).
 *
 * Scale: the snapshot is catalog-sized (distinct (metric, tagk, tagv) — KBs
 * to low GBs at 100 TB of points, nothing like the corpus), persisted
 * MEMORY_AND_DISK and force-materialized at load time so request threads only
 * ever read cached partitions.
 */
final class MetaSnapshot(
    load: () => DataFrame,
    refreshMs: Long,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val lock = new Object
  private var snap: DataFrame = _
  private var loadedAt = 0L
  private var dirty = true
  private var loading = false
  private var gen = 0L

  /** Ingest-path invalidation: the next [[frame]] blocks for a reload
    * regardless of age (the reference adds ingested meta to the live cache,
    * DataStore.java:483; re-reading the just-appended catalog is the
    * storage-backed equivalent). */
  def markDirty(): Unit = lock.synchronized { gen += 1; dirty = true }

  /** The current snapshot. Fresh-enough → served as-is; dirty/missing → the
    * caller blocks for a reload; merely aged → one caller reloads while the
    * rest keep the old frame. Served frames are immutable (a reload swaps in
    * a NEW frame, it never mutates one being read). */
  def frame(): DataFrame = {
    var result: DataFrame = null
    while (result == null) {
      val claimed: Option[Long] = lock.synchronized {
        val now = clock()
        if (snap != null && !dirty && now - loadedAt < refreshMs) {
          result = snap; None
        } else if (loading) {
          if (snap != null && !dirty) { result = snap; None } // aged: serve stale
          else { lock.wait(); None } // dirty/empty: wait for the loader, re-check
        } else { loading = true; Some(gen) }
      }
      claimed.foreach(g => result = reload(g))
    }
    result
  }

  private def reload(startGen: Long): DataFrame =
    try {
      val fresh = load().persist(StorageLevel.MEMORY_AND_DISK)
      fresh.count() // materialize: request threads never pay the scan
      lock.synchronized {
        if (snap != null) snap.unpersist(blocking = false)
        snap = fresh
        loadedAt = clock()
        dirty = gen != startGen // a markDirty during the load stays dirty
      }
      fresh
    } finally lock.synchronized { loading = false; lock.notifyAll() }

  /** Release the cached snapshot (server shutdown). */
  def close(): Unit = lock.synchronized {
    if (snap != null) { snap.unpersist(blocking = false); snap = null; dirty = true }
  }
}
