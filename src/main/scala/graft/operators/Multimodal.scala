package graft.operators

import org.apache.spark.sql.DataFrame
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
}
