package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media (image/audio/video) travels as an opaque
 * `BINARY` payload column plus typed metadata, and decode/feature-extraction
 * runs per-partition so a real codec would amortize initialization.
 *
 * The actual byte decoding is STUBBED (no media libraries in this
 * environment): [[stubDecode]] derives deterministic fake metadata
 * (width/height/channels) from the payload's md5, clearly marked below.
 * Everything Spark-side — the binary column, the schema contract, partition
 * shaping, the metadata struct — is real and tested; swapping in a true codec
 * means replacing just the marked expressions with a mapPartitions decoder.
 */
object Multimodal {

  /** Schema contract for a media table: id, payload BINARY, media_type, meta. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"))

  /**
   * STUB decode: metadata a real decoder would emit, derived deterministically
   * from the payload hash so tests (and the SQL oracle) can pin it.
   *   width    = 64 + 16 * hexdigit1(md5(payload))
   *   height   = 64 + 16 * hexdigit2(md5(payload))
   *   channels = 1 + hexdigit3(md5(payload)) % 3
   */
  def stubDecode(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("h", md5(col("payload")))
      .withColumn("width", (lit(64) + lit(16) * (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1)).cast("long"))
      .withColumn("height", (lit(64) + lit(16) * (expr("instr('0123456789abcdef', substr(h, 2, 1))") - 1)).cast("long"))
      .withColumn("channels", (lit(1) + (expr("instr('0123456789abcdef', substr(h, 3, 1))") - 1) % 3).cast("long"))
      .drop("h", "payload")

  /**
   * STUB feature extraction: a fixed-length "embedding" from payload hash
   * bytes — stands in for a vision encoder; shape/typing is the real contract
   * (ARRAY<DOUBLE> per media row, computed executor-side, no driver loop).
   */
  def stubFeatures(media: DataFrame, dim: Int = 8): DataFrame =
    media.select(col("media_id"), expr(
      s"""transform(sequence(1, $dim), i ->
         |  (instr('0123456789abcdef', substr(md5(payload), i, 1)) - 1) / 15.0D)""".stripMargin)
      .as("features"))

  /** Decoded-media row contract for the per-partition decode path. */
  case class DecodedMedia(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      width: Long,
      height: Long,
      channels: Long)

  /**
   * Per-partition decode — the batch shape a REAL codec needs: one codec
   * instance initialized per partition (amortized over its rows), rows decoded
   * executor-side. The codec here is the STUB (md5-derived metadata identical
   * to [[stubDecode]]); swapping in libjpeg/ffmpeg means replacing
   * `StubCodec.decode` only. Input is repartitioned by media_id so decode
   * parallelism doesn't depend on the source file layout.
   */
  def decodePartitioned(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .repartition(col("media_id"))
      .select(col("media_id").cast("long"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val codec = StubCodec.init() // once per partition, like a real codec ctx
        rows.map { case (id, mt, payload) =>
          val (w, h, c) = codec.decode(payload)
          DecodedMedia(id, mt, payload.length.toLong, w.toLong, h.toLong, c.toLong)
        }
      }
  }

  /** Metadata-level resize preserving aspect ratio (integer math — the real
    * pixel op would run in the same per-partition decode pass). */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame =
    decoded
      .withColumn("scale_num", lit(maxDim))
      .withColumn("scale_den", greatest(col("width"), col("height"), lit(maxDim)))
      .withColumn("out_width", (col("width") * col("scale_num") / col("scale_den")).cast("int"))
      .withColumn("out_height", (col("height") * col("scale_num") / col("scale_den")).cast("int"))
      .drop("scale_num", "scale_den")

  /** Frame sampling for video rows: one output row per sampled frame index
    * (frame count derived from payload size in the stub; a real demuxer would
    * read the container). Explode happens executor-side — no driver loop. */
  def frameSample(decoded: DataFrame, everyN: Int, fakeBytesPerFrame: Int = 64): DataFrame =
    decoded
      .where(col("media_type") === "video")
      .withColumn("n_frames", greatest(lit(1), (col("byte_len") / fakeBytesPerFrame).cast("int")))
      .select(col("media_id"),
        explode(expr(s"sequence(0, n_frames - 1, $everyN)")).as("frame_idx"))

  /**
   * Exact media dedup by CONTENT BYTES — the first pass of any image/audio
   * corpus pipeline (byte-identical re-crawls, mirror CDNs, re-encoded-but-
   * byte-stable assets): per media_type, totals, distinct payload hashes,
   * and the per-item keep decision (min media_id per hash keeps, like the
   * text-side [[Dedup.exact]]). Real plumbing — the hash runs on the BINARY
   * payload column, not a text proxy; perceptual (pHash/feature-cosine)
   * near-dup layers on top via [[stubFeatures]] + [[Dedup.embedCosine]]
   * once a real encoder replaces the stub (on the md5 stub, feature
   * equality is exactly payload equality, so the near pass would add
   * nothing but cost — deliberately not a gate until the encoder is real).
   *
   * Scale: one hash groupBy (map-side combined) + a media_id-keyed join
   * back. @return per item: (media_id, media_type, content_hash,
   * keep_media_id, dup_count, keep).
   */
  def exactDedup(media: DataFrame): DataFrame = {
    // NULL payload hashes as the empty payload (one mutual-dup group) — a
    // NULL hash would silently drop the row at the join (NULL != NULL)
    val hashed = media.select(col("media_id"), col("media_type"),
      md5(coalesce(col("payload"), lit(Array.emptyByteArray))).as("content_hash"))
    val groups = hashed.groupBy("content_hash")
      .agg(min("media_id").as("keep_media_id"), count(lit(1)).as("dup_count"))
    hashed.join(groups, "content_hash")
      .select(col("media_id"), col("media_type"), col("content_hash"),
        col("keep_media_id"), col("dup_count"),
        when(col("media_id") === col("keep_media_id"), 1L).otherwise(0L).as("keep"))
  }
}

/** STUB codec: deterministic md5-derived metadata (same math as stubDecode). */
private[operators] object StubCodec {
  def init(): StubCodec = new StubCodec
}

private[operators] class StubCodec {
  private val md = java.security.MessageDigest.getInstance("MD5")
  private def hexDigit(h: Array[Byte], i: Int): Int = {
    val b = h(i / 2) & 0xff
    if (i % 2 == 0) b >> 4 else b & 0xf
  }
  /** (width, height, channels) from payload md5 — matches stubDecode exactly. */
  def decode(payload: Array[Byte]): (Int, Int, Int) = {
    md.reset()
    val h = md.digest(payload)
    (64 + 16 * hexDigit(h, 0), 64 + 16 * hexDigit(h, 1), 1 + hexDigit(h, 2) % 3)
  }
}
