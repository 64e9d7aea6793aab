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
 * reloads only when `refreshMs` has elapsed since the last load (lazy,
 * clock-injectable — no scheduler thread to leak, unlike the reference's
 * `ScheduledExecutorService`) or after [[markDirty]] (the ingest-side `addAll`
 * analog, so a put is visible to the next suggest immediately). Expiration of
 * stale entries is [[PointStore.metaAgeOff]]'s job — the catalog invariant
 * lives in storage, not in this cache.
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

  private var snap: DataFrame = _
  private var loadedAt = 0L
  private var dirty = true

  /** Ingest-path invalidation: the next [[frame]] reloads regardless of age
    * (the reference adds ingested meta to the live cache, DataStore.java:483;
    * re-reading the just-appended catalog is the storage-backed equivalent). */
  def markDirty(): Unit = synchronized { dirty = true }

  /** The current snapshot, reloading first if dirty or older than
    * `refreshMs`. Thread-safe; the returned frame is immutable (a reload
    * swaps in a NEW frame, it never mutates a served one). */
  def frame(): DataFrame = synchronized {
    val now = clock()
    if (snap == null || dirty || now - loadedAt >= refreshMs) {
      val fresh = load().persist(StorageLevel.MEMORY_AND_DISK)
      fresh.count() // materialize: request threads never pay the scan
      if (snap != null) snap.unpersist(blocking = false)
      snap = fresh
      loadedAt = now
      dirty = false
    }
    snap
  }

  /** Release the cached snapshot (server shutdown). */
  def close(): Unit = synchronized {
    if (snap != null) { snap.unpersist(blocking = false); snap = null; dirty = true }
  }
}
