package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Exclusions, MetricParser, MetricPoint, MetricsFlatBuffer}

/**
 * Streaming ingest of the put line protocol — the Spark re-expression of the
 * reference's TCP/UDP/HTTP/WS ingest pipes (reference
 * server/src/main/java/timely/server/netty/tcp/TcpPutHandler.java:16-43,
 * common/src/main/java/timely/model/parse/MetricParser.java:17-30).
 *
 * Any line source works (socket for dev, Kafka value column, file drop):
 * the contract is a streaming Dataset[String] of put lines in, a canonical
 * points stream out. Malformed lines are dropped like the reference drops
 * unparseable messages — route them to a rejects sink by filtering on
 * `parsed IS NULL` before the flatMap if auditing is needed.
 */
object PutLineIngest {

  /** Apply the ingest-time policy shared by every source: metric exclusion
    * (matched against the full metric line, reference Exclusions.java:96-105),
    * then per-metric tag stripping (Exclusions.java:147-155), then default
    * visibility injection (DataStore.java:402-407). All executor-side. */
  private def applyPolicy(
      points: Dataset[MetricPoint],
      excludeMetricRegex: Option[String],
      excludedTags: Map[String, Set[String]],
      defaultViz: Option[String]): Dataset[MetricPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    var out = points
    excludeMetricRegex.foreach { re => out = out.filter(p => !Exclusions.isExcluded(Seq(re), p)) }
    if (excludedTags.nonEmpty) out = out.map(Exclusions.stripTags(excludedTags, _))
    defaultViz.foreach { dv =>
      out = out.map(p => if (p.viz.isEmpty) p.copy(viz = Some(dv)) else p)
    }
    out
  }

  /** Parse a (streaming or batch) line dataset into canonical points.
    * Exclusion filters (reference Exclusions.java) are predicate pushups:
    * apply `excludeMetricRegex` before anything else so excluded series
    * never enter the stream, and strip `excludedTags` before storage so
    * neither the data nor the meta catalog ever sees them. */
  def parse(
      lines: Dataset[String],
      excludeMetricRegex: Option[String] = None,
      defaultViz: Option[String] = None,
      excludedTags: Map[String, Set[String]] = Map.empty): Dataset[MetricPoint] = {
    val spark = lines.sparkSession
    import spark.implicits._
    applyPolicy(lines.flatMap(MetricParser.parse(_)), excludeMetricRegex, excludedTags, defaultViz)
  }

  /** Decode one binary ingest frame, auto-detecting FlatBuffers batches vs
    * put-line text exactly like the reference's TCP pipeline
    * (common/src/main/java/timely/netty/tcp/MetricsBufferDecoder.java:28-52):
    * a frame carrying the "TMFB" identifier unpacks as a Metrics batch, any
    * other frame is treated as UTF-8 put lines. A corrupt binary frame is
    * DROPPED (empty result) like the text path drops malformed lines —
    * otherwise one bad frame would fail the micro-batch and checkpoint
    * replay would crash-loop the whole streaming ingest. */
  def decodeFrame(bytes: Array[Byte]): Seq[MetricPoint] =
    if (MetricsFlatBuffer.hasIdentifier(bytes)) {
      // decode bounds every wire length before allocating, so corrupt frames
      // surface as cheap (non-fatal) exceptions — dropped here like the text
      // path drops malformed lines
      try MetricsFlatBuffer.decode(bytes)
      catch { case scala.util.control.NonFatal(_) => Seq.empty }
    } else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.flatMap(MetricParser.parse(_)).toSeq

  /** Parse a (streaming or batch) dataset of binary frames — the S5 batch
    * ingest source. Works for any framed byte source (Kafka value column,
    * socket with length framing, file drop). */
  def parseFrames(
      frames: Dataset[Array[Byte]],
      excludeMetricRegex: Option[String] = None,
      defaultViz: Option[String] = None,
      excludedTags: Map[String, Set[String]] = Map.empty): Dataset[MetricPoint] = {
    val spark = frames.sparkSession
    import spark.implicits._
    applyPolicy(frames.flatMap(decodeFrame(_)), excludeMetricRegex, excludedTags, defaultViz)
  }

  /** Exact-dedup a streaming points frame within an event-time watermark.
    * At-least-once transports re-deliver frames (Kafka redelivery, client
    * retry after a dropped ack), and the reference's store is naturally
    * idempotent — re-putting a point overwrites the same Accumulo key
    * (common/src/main/java/timely/accumulo/MetricAdapter.java:87-110). An
    * append-only parquet sink is NOT idempotent, so ingest gets an explicit
    * dedup stage: `dropDuplicatesWithinWatermark` keyed on the full point
    * identity, with state bounded by the watermark window (a fixed-size
    * recent-window state store per key at any corpus scale, never
    * corpus-sized). Tags ride as sorted-entry JSON rather than the display
    * `k=v,..` form ([[graft.operators.TimeSeries.seriesKey]]): map columns
    * can't key a dedup, sorting makes logically-equal maps collide as
    * intended, and JSON string escaping makes the key INJECTIVE — a tag
    * value containing `=`/`,` must not make two distinct points dedup into
    * one (that would be silent data loss, not mere idempotency).
    *
    * DOCUMENTED DIVERGENCE — corrected re-puts: `value` is part of the dedup
    * key, so a re-put of the same (metric, ts, tags, viz) with a CHANGED
    * value lands as a second row, where the reference's Accumulo store
    * (value in the Value, not the key) overwrites and keeps the last write.
    * Keying without value here would keep the FIRST arrival
    * (dropDuplicatesWithinWatermark semantics) — the opposite of the
    * reference's last-write-wins, i.e. corrections silently ignored. Exact
    * redelivery idempotency plus visible corrections is the safer append-sink
    * trade; pipelines needing last-write-wins compaction run a batch
    * `row_number() over (partition by identity order by ingest desc) = 1`
    * maintenance pass (cf. SURVEY.md §2.1 S7 note). */
  def dedupPoints(points: Dataset[MetricPoint], delay: String = "10 minutes"): Dataset[MetricPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.toDF()
      .withColumn("event_ts", timestamp_millis(col("ts")))
      .withColumn("series_key",
        to_json(map_from_entries(sort_array(map_entries(col("tags"))))))
      .withWatermark("event_ts", delay)
      .dropDuplicatesWithinWatermark("metric", "ts", "value", "series_key", "viz")
      .drop("event_ts", "series_key")
      .as[MetricPoint]
  }

  /** Canonical points frame with derived partition columns. At cluster scale
    * `(metric, dt, hr)` partitioning is the analog of the reference's
    * (metric, hour-bucket) row keys — time+metric predicates become partition
    * pruning (MetricAdapter.java:47-53,189-196).
    *
    * dt/hr derive from pure epoch arithmetic (UTC by construction), NOT from
    * date_format/hour — those follow the session timezone, and a non-UTC
    * writer would shift rows across day directories, corrupting
    * partition-level maintenance (age-off drops compare UTC horizon days). */
  def withPartitionColumns(points: DataFrame): DataFrame =
    points
      .withColumn("dt", date_add(to_date(lit("1970-01-01")), expr("ts div 86400000").cast("int")).cast("string"))
      .withColumn("hr", expr("(ts div 3600000) % 24").cast("int"))

  /** Start a streaming write of parsed points to partitioned parquet, with the
    * meta catalog maintained per micro-batch (the reference writes meta keys
    * on every store — DataStore.java:415-433). With `internal` set, per-batch
    * point/key counts feed the S10 loopback (reference DataStore.java:436-441
    * increments the same counters on every store call). */
  def startStorageSink(
      points: Dataset[MetricPoint],
      dataDir: String,
      metaDir: String,
      checkpointDir: String,
      internal: Option[InternalMetrics] = None): org.apache.spark.sql.streaming.StreamingQuery =
    withPartitionColumns(points.toDF())
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = if (internal.isDefined) batch.persist() else batch
        b.write.mode("append").partitionBy("metric", "dt", "hr").parquet(dataDir)
        val meta = b
          .select(col("metric"), explode(col("tags")).as(Seq("tagk", "tagv")))
          .distinct()
        internal match {
          case Some(im) =>
            val metaCached = meta.persist()
            metaCached.write.mode("append").parquet(metaDir)
            val n = b.count()
            im.incrementMetricsReceived(n)
            im.incrementMetricKeysInserted(n)
            im.incrementMetaKeysInserted(metaCached.count())
            metaCached.unpersist()
            b.unpersist()
          case None =>
            meta.write.mode("append").parquet(metaDir)
        }
        ()
      }
      .start()
}
