package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.PutLineIngest

/**
 * Partitioned-parquet point store — the storage layer replacing the
 * reference's Accumulo metrics/meta tables (SURVEY.md §1.2).
 *
 * Layout: `PARTITIONED BY (metric, dt, hr)` mirrors the reference's
 * (metric, hour-rounded timestamp) row keys (reference
 * common/src/main/java/timely/accumulo/MetricAdapter.java:36,47-53,189-196 —
 * hour rounding is explicitly for scan efficiency and compression). Catalyst
 * partition pruning then plays the role of `DataStore.getQueryRanges`
 * (server/src/main/java/timely/server/store/DataStore.java:997-1039): a query
 * `metric = m AND ts BETWEEN a AND b` touches only the matching directories.
 */
object PointStore {

  /** Batch-write canonical points, partitioned for pruning. */
  def write(points: DataFrame, dataDir: String, mode: SaveMode = SaveMode.Append): Unit =
    PutLineIngest.withPartitionColumns(points)
      .write.mode(mode).partitionBy("metric", "dt", "hr").parquet(dataDir)

  /**
   * Z-ORDERED batch write: same `(metric, dt, hr)` directory layout, but the
   * files INSIDE each directory are clustered on the Morton interleave of
   * two residual query dimensions (e.g. a tag-derived cohort x the value
   * band) — so parquet row-group / file min-max statistics stay tight on
   * BOTH dims and a reader can skip most files for either predicate, not
   * just the partition-pruned ones. This is the write-side half of
   * [[graft.operators.Layout]]: the directory tree prunes metric/time
   * (the reference's hour-rounded row key, MetricAdapter.java:47-53), the
   * z-sort prunes within the hour.
   *
   * Mechanics: one `repartitionByRange` over (metric, dt, hr, z) gives
   * every output file a contiguous, disjoint z-range (range partitioning is
   * a global sort boundary — `numFiles` is the TOTAL file budget across
   * dirs, each dir receiving the ranges that intersect it), then
   * `sortWithinPartitions` lays rows z-ordered inside each file so row
   * groups inherit the same tight envelopes. Both x and y must already be
   * small non-negative ints (bucket upstream; 0 <= x,y < 2^bits).
   *
   * Scale shape: exactly one extra shuffle (the range exchange) over the
   * plain [[write]]; the sort is per-partition, spillable, and the z column
   * is dropped before write (it is derivable, not stored).
   */
  def writeZOrdered(points: DataFrame, dataDir: String,
                    xCol: org.apache.spark.sql.Column, yCol: org.apache.spark.sql.Column,
                    bits: Int = 8, numFiles: Int = 32,
                    mode: SaveMode = SaveMode.Append): Unit = {
    require(numFiles >= 1, "numFiles >= 1")
    PutLineIngest.withPartitionColumns(points)
      .withColumn("_z", graft.operators.Layout.mortonKey(xCol, yCol, bits))
      .repartitionByRange(numFiles, col("metric"), col("dt"), col("hr"), col("_z"))
      .sortWithinPartitions(col("metric"), col("dt"), col("hr"), col("_z"))
      .drop("_z")
      .write.mode(mode).partitionBy("metric", "dt", "hr").parquet(dataDir)
  }

  /** Read the store back as the canonical schema (partition cols retained for
    * pruning; `ts` stays the epoch-ms source of truth). */
  def read(spark: SparkSession, dataDir: String): DataFrame =
    spark.read.parquet(dataDir)

  /** Partition census — the maintenance-pass visibility report: per
    * (metric, dt), hour-partition and row counts, the hour span, and a
    * small-files tell (files per hour partition; compaction wants ~1). One
    * aggregate over the partition-pruned scan (`input_file_name` counts
    * files without a filesystem walk); the result is partition-cardinality
    * sized. Feed it to [[ageOffDropPartitions]] planning, bucket sizing,
    * and the "which days are bloated" question every retention review
    * starts with. */
  def census(spark: SparkSession, dataDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    read(spark, dataDir)
      .select(col("metric"), col("dt"), col("hr"), input_file_name().as("f"))
      .groupBy(col("metric"), col("dt"))
      .agg(
        countDistinct(col("hr")).as("n_hr_partitions"),
        count(lit(1)).as("n_rows"),
        min(col("hr").cast("long")).as("hr_min"),
        max(col("hr").cast("long")).as("hr_max"),
        countDistinct(col("f")).as("n_files"))
      .withColumn("hr_gaps",
        col("hr_max") - col("hr_min") + lit(1L) - col("n_hr_partitions"))
      .withColumn("files_per_partition",
        col("n_files").cast("double") / col("n_hr_partitions").cast("double"))
  }

  /**
   * Bucketed variant for co-located joins: bucketBy(seriesKey-ish column) so
   * repeated joins/aggregations on the same key skip their shuffle entirely —
   * the Spark analog of the reference balancer's metric->host affinity
   * (balancer/src/main/java/timely/balancer/MetricResolver.java:70-160), done
   * with storage layout instead of an L7 proxy. Requires a catalog table
   * (saveAsTable), so callers pass a table name, not a path.
   */
  def writeBucketed(points: DataFrame, table: String, buckets: Int = 32): Unit =
    PutLineIngest.withPartitionColumns(points)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "metric")
      .sortBy("metric", "ts")
      .saveAsTable(table)

  /** The ONE points -> (metric, tagk, tagv) catalog projection (reference
    * meta table, Meta.java:55-67) — shared by the batch rebuild and the HTTP
    * ingest append so the two paths cannot drift. */
  def metaProjection(points: DataFrame): DataFrame =
    points
      .select(col("metric"), explode(col("tags")).as(Seq("tagk", "tagv")))
      .distinct()

  /** Derive/refresh the meta catalog. */
  def writeMeta(points: DataFrame, metaDir: String): Unit =
    metaProjection(points).write.mode(SaveMode.Overwrite).parquet(metaDir)

  /** Retention horizon for a metric as a codegen'd when-chain (longest prefix
    * wins, 'default' fallback) — no UDF, so the resulting `ts >= horizon`
    * predicate stays inside whole-stage codegen and, for a constant-per-metric
    * store, prunes at the scan. */
  def horizonExpr(ttlMsByPrefix: Map[String, Long], nowMs: Long): org.apache.spark.sql.Column = {
    require(ttlMsByPrefix.contains("default"), "age-off config requires a 'default' TTL")
    val byLen = ttlMsByPrefix.filter(_._1 != "default").toSeq
      .sortBy { case (p, _) => (-p.length, p) } // longest prefix first
    byLen.reverse.foldLeft(lit(nowMs - ttlMsByPrefix("default"))) {
      case (els, (prefix, ttl)) =>
        when(col("metric").startsWith(prefix), lit(nowMs - ttl)).otherwise(els)
    }
  }

  /**
   * Retention / age-off — the reference's MetricAgeOffIterator + tablet-drop
   * compaction (server/src/main/java/timely/server/store/MetricAgeOffIterator.java:26-110,
   * compaction/MetricCompactionStrategy.java): per-metric-prefix TTLs with a
   * required "default", longest prefix wins. Two forms: [[ageOff]] rewrites
   * the exactly-retained set (row-accurate), [[ageOffDropPartitions]] deletes
   * fully-expired day directories in place (metadata/file-level, no data
   * movement — the daily maintenance form; pair with [[clampStart]] for the
   * boundary day).
   */
  def ageOff(
      spark: SparkSession,
      dataDir: String,
      outDir: String,
      ttlMsByPrefix: Map[String, Long],
      nowMs: Long): Unit =
    read(spark, dataDir)
      .where(col("ts") >= horizonExpr(ttlMsByPrefix, nowMs))
      .write.mode(SaveMode.Overwrite).partitionBy("metric", "dt", "hr").parquet(outDir)

  /** Scala-side retention horizon (same longest-prefix-wins resolution as
    * [[horizonExpr]]) for partition-level maintenance. */
  def horizonMs(metric: String, ttlMsByPrefix: Map[String, Long], nowMs: Long): Long = {
    require(ttlMsByPrefix.contains("default"), "age-off config requires a 'default' TTL")
    val ttl = ttlMsByPrefix.view.filterKeys(_ != "default").toSeq
      .filter { case (p, _) => metric.startsWith(p) }
      .sortBy { case (p, _) => (-p.length, p) }
      .headOption.map(_._2)
      .getOrElse(ttlMsByPrefix("default"))
    nowMs - ttl
  }

  /**
   * In-place age-off as a partition DROP: delete whole `metric=/dt=` day
   * directories strictly older than the metric's horizon day — a
   * metadata/file-level operation touching no surviving data, exactly the
   * reference's tablet-drop compaction (server/src/main/java/timely/server/
   * store/compaction/MetricCompactionStrategy.java:1-60 drops only tablets
   * whose whole key range is expired; the scan-time iterator handles the
   * partial boundary). On the horizon day itself, fully-expired `hr=`
   * subdirectories are dropped the same way — the layout's hour granularity
   * mirrors the reference row key's hour rounding (MetricAdapter.java:47-53),
   * so only the horizon HOUR retains expired rows (bounded slack < 1 hour) —
   * the query-time [[clampStart]] keeps those invisible, like the
   * reference's scan-time age-off iterator.
   */
  def ageOffDropPartitions(
      spark: SparkSession,
      dataDir: String,
      ttlMsByPrefix: Map[String, Long],
      nowMs: Long,
      dryRun: Boolean = false): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    val dropped = Seq.newBuilder[String]
    if (fs.exists(root)) {
      for (metricDir <- fs.listStatus(root) if metricDir.getPath.getName.startsWith("metric=")) {
        // the true inverse of Spark's partition-path escaping (URLDecoder is
        // NOT: it would turn '+' in a metric name into a space and resolve
        // the wrong TTL)
        val metric = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(
          metricDir.getPath.getName.stripPrefix("metric="))
        // ISO dates compare correctly as strings
        val horizon = horizonMs(metric, ttlMsByPrefix, nowMs)
        val horizonDay = fmt.format(java.time.Instant.ofEpochMilli(horizon))
        val horizonHour = Math.floorDiv(horizon, 3600000L) % 24L
        for (dtDir <- fs.listStatus(metricDir.getPath)
             if dtDir.getPath.getName.startsWith("dt=")) {
          val day = dtDir.getPath.getName.stripPrefix("dt=")
          if (day < horizonDay) {
            if (!dryRun) fs.delete(dtDir.getPath, true)
            dropped += s"$metric/$day"
          } else if (day == horizonDay) {
            // boundary day: hr= dirs wholly below the horizon hour hold only
            // ts < hourStart(horizon) <= horizon — droppable in full
            for (hrDir <- fs.listStatus(dtDir.getPath)
                 if hrDir.getPath.getName.startsWith("hr=")) {
              val hr = hrDir.getPath.getName.stripPrefix("hr=").toLong
              if (hr < horizonHour) {
                if (!dryRun) fs.delete(hrDir.getPath, true)
                dropped += s"$metric/$day/hr=$hr"
              }
            }
          }
        }
      }
    }
    dropped.result().sorted
  }

  /**
   * Meta age-off (L2) — the reference ages catalog entries alongside the data
   * (server/src/main/java/timely/server/store/MetaAgeOffIterator.java:77-97);
   * here the catalog invariant is "a meta row survives iff its metric still
   * has live points". The live-metric set is metric-cardinality-sized (tiny
   * next to the corpus), so the semi-join broadcasts under AQE while the meta
   * side streams — no full rebuild of meta from data.
   */
  def metaAgeOff(meta: DataFrame, livePoints: DataFrame): DataFrame =
    meta.join(livePoints.select("metric").distinct(), Seq("metric"), "left_semi")

  /** File-level meta maintenance paired with [[ageOff]]: rewrite the meta dir
    * keeping only metrics that survive in the aged data dir. */
  def metaAgeOff(spark: SparkSession, metaDir: String, agedDataDir: String, outMetaDir: String): Unit =
    metaAgeOff(spark.read.parquet(metaDir), read(spark, agedDataDir))
      .write.mode(SaveMode.Overwrite).parquet(outMetaDir)

  /** Query-time age-off clamp: like the reference's cache iterator clamping
    * the scan start to the retention horizon (cache/DataStoreCache.java:748-752). */
  def clampStart(requestedStartMs: Long, nowMs: Long, ttlMs: Long): Long =
    math.max(requestedStartMs, nowMs - ttlMs)
}
