package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tools.Maintenance

/**
 * Streaming index maintenance ([[IndexIngest]]): micro-batches maintain the
 * postings / LSH signature stores through the staged-append commit protocol,
 * and a REPLAYED batch (Structured Streaming's failure semantics: re-execute
 * the same batchId) is skipped instead of duplicated — the store's own
 * `last_pass` marker is the exactly-once mechanism.
 */
class IndexIngestSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def doc(i: Long): (Long, String) =
    (i, s"alpha doc$i beta shared corpus words run${i % 6} gamma")

  test("streamed postings index == fresh batch bootstrap; search is bit-equal") {
    val base = Files.createTempDirectory("graft-ingestpost").toString
    val idx = s"$base/index"
    val input = MemoryStream[(Long, String)]
    val q = IndexIngest.startPostingsSink(
      input.toDS().toDF("doc_id", "text"), idx, s"$base/ckpt",
      autoCompactFilesPerBucket = Some(3), positions = true)
    input.addData((0L until 30L).map(doc): _*)
    q.processAllAvailable()
    (1 to 5).foreach { k =>
      input.addData((k * 30L until (k + 1) * 30L).map(doc): _*)
      q.processAllAvailable()
    }
    q.stop()
    assert(Maintenance.postingsAudit(spark, idx).ok)
    assert(spark.read.parquet(s"$idx/stats").head.getLong(0) == 180L)
    // auto-compaction kept files-per-bucket bounded across 5 appends
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/postings"))
      .filter(_.getPath.getName.startsWith("tb="))
      .map(d => fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet")))
      .max
    assert(maxFiles <= 4, s"auto-compaction must bound bucket files, saw $maxFiles")
    // == a fresh batch bootstrap over the same docs
    val freshDir = Files.createTempDirectory("graft-ingestfresh").toString + "/index"
    val all = (0L until 180L).map(doc).toDF("doc_id", "text")
    Maintenance.postingsMaintain(spark, freshDir, all, positions = true)
    val qdf = Seq((1L, "alpha shared"), (2L, "gamma run4")).toDF("query_id", "qtext")
    assert(
      Maintenance.bm25Maintained(spark, idx, qdf, k = 5).collect().map(_.toSeq).toSet ==
      Maintenance.bm25Maintained(spark, freshDir, qdf, k = 5).collect().map(_.toSeq).toSet)
    // the streamed positional sidecar serves phrase queries identically to
    // the batch-bootstrapped one (micro-batch appends maintained it)
    val pq = Seq((1L, "shared corpus words")).toDF("query_id", "qtext")
    val streamedPhrase = Maintenance.phraseMaintained(spark, idx, pq)
      .collect().map(_.toSeq).toSet
    assert(streamedPhrase ==
      Maintenance.phraseMaintained(spark, freshDir, pq).collect().map(_.toSeq).toSet)
    assert(streamedPhrase.nonEmpty, "phrase probe must actually hit")
  }

  test("a replayed micro-batch is skipped, not re-appended (exactly-once via last_pass)") {
    val base = Files.createTempDirectory("graft-ingestreplay").toString
    val idx = s"$base/index"
    val b0 = (0L until 40L).map(doc).toDF("doc_id", "text")
    val b1 = (40L until 60L).map(doc).toDF("doc_id", "text")
    // what a foreachBatch run does, including the restart-replay of batch 1
    Maintenance.postingsMaintain(spark, idx, b0, passId = "batch-0")
    Maintenance.postingsMaintain(spark, idx, b1, passId = "batch-1")
    val replay = Maintenance.postingsMaintain(spark, idx, b1, passId = "batch-1")
    assert(replay.skipped)
    val aud = Maintenance.postingsAudit(spark, idx)
    assert(aud.ok && aud.statsDocs == 60L && aud.rowsUnique)
  }

  test("streamed LSH store: delta screens against the maintained signatures stay exact") {
    val base = Files.createTempDirectory("graft-ingestlsh").toString
    val idx = s"$base/index"
    // near-dup-rich stream: every 4th doc twins its predecessor
    def nd(i: Long): (Long, String) = {
      val b = if (i % 4 == 3) i - 1 else i
      (i, s"alpha beta gamma delta shard${b % 10} token${b % 7} omega rho sigma tau")
    }
    val input = MemoryStream[(Long, String)]
    val q = IndexIngest.startLshSink(input.toDS().toDF("doc_id", "text"), idx, s"$base/ckpt")
    input.addData((0L until 40L).map(nd): _*)
    q.processAllAvailable()
    input.addData((40L until 80L).map(nd): _*)
    q.processAllAvailable()
    q.stop()
    assert(Maintenance.lshAudit(spark, idx).ok)
    // a post-hoc delta screen over the streamed store == the batch
    // incremental screen over the equivalent batch corpus
    val delta = (1000L until 1010L).map(nd).toDF("doc_id", "text")
    val got = Maintenance.lshCandidates(spark, idx, delta).collect().map(_.toSeq).toSet
    val want = graft.operators.Dedup.minhashLshIncremental(
      (0L until 80L).map(nd).toDF("doc_id", "text"), delta).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("streamed IVF store: micro-batch assignments == one batch assign; probe reads prune") {
    import graft.operators.SimilarityIvf
    val base = Files.createTempDirectory("graft-ingestivf").toString
    val idx = s"$base/index"
    def vec(i: Long): (Long, Array[Float]) =
      (i, Array.tabulate(4)(d => ((i * 3 + d * 5) % 11).toFloat))
    val input = MemoryStream[(Long, Array[Float])]
    val q = IndexIngest.startIvfSink(
      input.toDS().toDF("vec_id", "embedding"), idx, s"$base/ckpt", nLists = 4)
    input.addData((0L until 30L).map(vec): _*)
    q.processAllAvailable()
    (1 to 3).foreach { k =>
      input.addData((k * 30L until (k + 1) * 30L).map(vec): _*)
      q.processAllAvailable()
    }
    q.stop()
    assert(Maintenance.ivfAudit(spark, idx).ok)
    assert(spark.read.parquet(s"$idx/meta").head.getLong(0) == 120L)
    // the streamed store's assignments == one batch assign of all vectors
    // under the SAME (batch-0-trained) centroids
    val cents = spark.read.parquet(s"$idx/centroids")
    val all = (0L until 120L).map(vec).toDF("vec_id", "embedding")
    val streamed = spark.read.parquet(s"$idx/assignments")
      .select("vec_id", "list_id").collect().map(_.toSeq).toSet
    val batch = SimilarityIvf.assign(all, cents)
      .select("vec_id", "list_id").collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // maintained probe over the streamed store == search over the full set
    val probes = all.where(org.apache.spark.sql.functions.col("vec_id") < 3L)
    val got = Maintenance.ivfKnnMaintained(spark, idx, probes, k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val want = SimilarityIvf.search(
        SimilarityIvf.assign(all, cents), cents, probes, k = 5, nProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streamed SCD2 dimension: micro-batch folds == one batch scd2; replays skip") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-ingestscd2").toString
    val dim = s"$base/dim"
    // 30 users x 3 attr changes, event time strictly increasing per key
    def ev(i: Long): (Long, String, Long, Long) = {
      val (user, step) = (i % 30, i / 30)
      (user, s"attr-${(user + step) % 5}", 1000L + step * 100L + user, i)
    }
    val all = (0L until 90L).map(ev).toDF("user_id", "attr", "ms", "event_id")
    val input = MemoryStream[(Long, String, Long, Long)]
    val q = IndexIngest.startScd2Sink(
      input.toDS().toDF("user_id", "attr", "ms", "event_id"),
      dim, s"$base/ckpt", "user_id", "attr", "ms", "event_id")
    (0 to 2).foreach { b =>
      input.addData((b * 30L until (b + 1) * 30L).map(ev): _*)
      q.processAllAvailable()
    }
    q.stop()
    // streamed history == one batch scd2 over the full event set
    val batch = graft.operators.Cdc.scd2(all, "user_id", "attr", col("ms"), "event_id")
      .collect().map(_.toSeq).toSet
    assert(spark.read.parquet(dim).collect().map(_.toSeq).toSet == batch)
    // a blind REPLAY of the committed last batch skips cleanly (the
    // foreachBatch restart shape), leaving the history untouched
    val replay = Maintenance.scd2Maintain(spark, dim,
      (60L until 90L).map(ev).toDF("user_id", "attr", "ms", "event_id"),
      "user_id", "attr", col("ms"), "event_id", passId = "batch-2")
    assert(replay.skipped)
    assert(spark.read.parquet(dim).collect().map(_.toSeq).toSet == batch)
  }
}
