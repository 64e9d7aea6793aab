package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hot/cold tiering — the reference keeps the most-recent window of every
 * series in an in-memory Gorilla cache and, per query, serves
 * `[oldestCacheTs, end]` from the cache while shrinking the Accumulo scan to
 * `[start, oldestCacheTs - 1]` (reference server/src/main/java/timely/server/
 * store/DataStore.java:655-689).
 *
 * The Spark analog: the hot frame is the recent slice of the points table
 * kept in the executor block-store (`.cache()`); [[union]] splits any read at
 * the boundary so each tier serves only its own range — no double counting,
 * and queries over recent data never touch cold storage.
 */
object HotColdPoints {

  /** Cache the hot window (ts >= boundaryMs) of a points frame. */
  def hotWindow(points: DataFrame, boundaryMs: Long): DataFrame =
    points.where(col("ts") >= boundaryMs).cache()

  /**
   * Range-split union: cold serves ts < boundary, hot serves ts >= boundary.
   * Semantically identical to reading the full table; physically the hot side
   * is a memory scan.
   */
  def union(cold: DataFrame, hot: DataFrame, boundaryMs: Long): DataFrame =
    cold.where(col("ts") < boundaryMs).unionByName(hot.where(col("ts") >= boundaryMs))

  /** Oldest hot timestamp — the reference's `/api/cache` status value
    * (DataStoreCache.getCacheStatus). */
  def oldestHotTs(hot: DataFrame): Option[Long] =
    hot.agg(min("ts")).collect().headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
}
