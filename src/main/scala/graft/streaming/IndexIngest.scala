package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.tools.Maintenance

/**
 * Streaming maintenance of the retrieval/dedup index artifacts — the
 * Structured Streaming twin of the batch [[graft.tools.Maintenance]] passes
 * (the reference ingests continuously and its iterators/compactions maintain
 * the index as data arrives; here `foreachBatch` plays that role over the
 * maintained parquet stores).
 *
 * EXACTLY-ONCE is the staged-append protocol composed with Structured
 * Streaming's batch replay: `foreachBatch` re-executes a micro-batch with
 * the SAME `batchId` after any failure/restart, and the maintenance passes
 * take `passId = "batch-<id>"` — a replayed batch whose commit already
 * landed is detected from the store's `last_pass` and SKIPPED, a batch that
 * crashed mid-pass is reconciled (orphan stage dropped, committed stage
 * published) and then re-applied or skipped as appropriate. No dedup state
 * in the stream, no idempotent-sink caveats: the store's own commit marker
 * IS the idempotence. Batches are serialized by the engine (one foreachBatch
 * at a time), which satisfies the stores' single-writer contract.
 *
 * Streams must be append-only doc frames with NEW ids per batch (the same
 * keyed-storage contract as the batch passes; the audits catch violations).
 */
object IndexIngest {

  /** Maintain a [[Maintenance.postingsMaintain]] BM25 postings index from a
    * streaming `(doc_id, text)` frame: batch 0 bootstraps, every later
    * micro-batch appends through the staged-append commit. With
    * `autoCompactFilesPerBucket` set the store self-compacts on the ingest
    * cadence (an FS-listing census per batch, a rewrite only on measured
    * degradation) — unbounded small-file growth never builds up. */
  def startPostingsSink(
      docs: DataFrame,
      indexDir: String,
      checkpointDir: String,
      autoCompactFilesPerBucket: Option[Int] = None,
      positions: Boolean = false): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // `positions` matters on the bootstrapping batch only — later
        // micro-batches follow the store's bootstrap-time shape
        Maintenance.postingsMaintain(batch.sparkSession, indexDir, batch,
          passId = s"batch-$batchId",
          autoCompactFilesPerBucket = autoCompactFilesPerBucket,
          positions = positions)
        ()
      }
      .start()

  /** Maintain a [[Maintenance.lshMaintain]] MinHash-LSH signature store from
    * a streaming `(doc_id, text)` frame — the near-dup screen's index kept
    * current as documents arrive, so a batch [[Maintenance.lshCandidates]]
    * screen over any delta never re-signs the corpus. */
  def startLshSink(
      docs: DataFrame,
      indexDir: String,
      checkpointDir: String,
      numHashes: Int = 8,
      bandSize: Int = 2,
      autoCompactFilesPerBucket: Option[Int] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Maintenance.lshMaintain(batch.sparkSession, indexDir, batch,
          numHashes = numHashes, bandSize = bandSize, passId = s"batch-$batchId",
          autoCompactFilesPerBucket = autoCompactFilesPerBucket)
        ()
      }
      .start()

  /** Maintain a [[Maintenance.ivfMaintain]] ANN index from a streaming
    * `(vec_id, embedding)` frame: batch 0 trains + assigns, every later
    * micro-batch assigns its new vectors against the persisted centroids
    * through the staged-append commit — a replayed batch is skipped from
    * the store's `last_pass`, so assignment rows are exactly-once under
    * Structured Streaming's failure semantics. Centroid retrains stay a
    * batch-side [[Maintenance.ivfRetrain]] on the maintenance cadence
    * (single-writer per index dir: pause the sink around a retrain). */
  def startIvfSink(
      vecs: DataFrame,
      indexDir: String,
      checkpointDir: String,
      nLists: Int = 16,
      autoCompactFilesPerList: Option[Int] = None): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Maintenance.ivfMaintain(batch.sparkSession, indexDir, batch,
          nLists = nLists, passId = s"batch-$batchId",
          autoCompactFilesPerList = autoCompactFilesPerList)
        ()
      }
      .start()

  /** Maintain a [[Maintenance.scd2Maintain]] dimension from a CDC event
    * stream: batch 0 bootstraps the history, every later micro-batch is an
    * O(delta) [[graft.operators.Cdc.scd2Apply]] fold committed by the
    * atomic dim swap, with the batch id as the pass marker — a REPLAYED
    * batch skips cleanly, and the single mid-crash window (dim swapped,
    * marker not yet) fails loudly on the strict-progress guard instead of
    * silently double-applying. Events must arrive in nondecreasing
    * event-time order per key across batches (the scd2Apply progress
    * contract; an upstream watermark sort gives this). An empty batch is
    * applied as an empty delta (a no-op fold). */
  def startScd2Sink(
      events: DataFrame,
      dimDir: String,
      checkpointDir: String,
      keyCol: String,
      attrCol: String,
      tsCol: String,
      tieCol: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Maintenance.scd2Maintain(batch.sparkSession, dimDir, batch,
          keyCol, attrCol, org.apache.spark.sql.functions.col(tsCol), tieCol,
          passId = s"batch-$batchId")
        ()
      }
      .start()
}
