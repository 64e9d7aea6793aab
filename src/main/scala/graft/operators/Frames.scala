package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared frame utilities for the operator package. */
private[operators] object Frames {

  /** Idempotent cache: several operators share sub-frames (signatures,
    * count tables, scored pairs) across calls in one session, so the same
    * logical plan can reach a cache() site twice. Caching an already-cached
    * plan is a no-op that still logs a CacheManager warning per call — check
    * first. Entries are MEMORY_AND_DISK and LRU-evicted under pressure; a
    * long-lived session cycling corpora releases them with
    * `spark.catalog.clearCache()`. The ONE copy of this guard — Dedup,
    * Curation and TextAnalysis all route through it. */
  def cached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df
}
