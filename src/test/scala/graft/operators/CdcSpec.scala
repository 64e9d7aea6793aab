package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Snapshot-diff (CDC) semantics on hand fixtures: status classification,
  * SCD2 interval construction, and the delta-apply algebra. */
class CdcSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def v1 = Seq(
    (1L, "web", 10L), (2L, "web", 20L), (3L, "wiki", 30L)
  ).toDF("doc_id", "source", "n_chars")
  // 1 unchanged, 2 changed, 3 removed, 4 added
  private def v2 = Seq(
    (1L, "web", 10L), (2L, "web", 25L), (4L, "wiki", 40L)
  ).toDF("doc_id", "source", "n_chars")

  test("snapshotDiff classifies all four statuses") {
    val d = Cdc.snapshotDiff(v1, v2, Seq("doc_id"), Seq("n_chars"), Seq("source"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(d(1L) == ("web", "unchanged"))
    assert(d(2L) == ("web", "changed"))
    assert(d(3L) == ("wiki", "removed"))
    assert(d(4L) == ("wiki", "added"))
  }

  test("scd2 builds versioned validity intervals with one open current row") {
    // user 1: a@10, a@20 (no change), b@30, a@50; user 2: x@5
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), (1L, "b", 30L, 102L),
      (1L, "a", 50L, 103L), (2L, "x", 5L, 104L)
    ).toDF("user_id", "attr", "ms", "event_id")
    val h = Cdc.scd2(ev, "user_id", "attr", col("ms"), "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("version")) ->
        (r.getString(1), r.getAs[Long]("valid_from"),
          Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
          r.getAs[Long]("is_current"))).toMap
    assert(h((1L, 1L)) == ("a", 10L, Some(30L), 0L))
    assert(h((1L, 2L)) == ("b", 30L, Some(50L), 0L))
    assert(h((1L, 3L)) == ("a", 50L, None, 1L))
    assert(h((2L, 1L)) == ("x", 5L, None, 1L))
    assert(h.size == 4, "the no-change event must not open a new interval")
  }

  test("scd2 breaks timestamp ties by the tie column") {
    val ev = Seq((1L, "b", 10L, 2L), (1L, "a", 10L, 1L)).toDF("user_id", "attr", "ms", "event_id")
    val h = Cdc.scd2(ev, "user_id", "attr", col("ms"), "event_id")
      .orderBy("version").collect().map(_.getString(1)).toSeq
    assert(h == Seq("a", "b"), "event_id 1 ('a') must sort first at equal ms")
  }

  test("applyChanges: delete drops, upsert inserts/updates, last change wins") {
    val snap = Seq((1L, "web", 10L), (2L, "web", 20L), (3L, "wiki", 30L))
      .toDF("doc_id", "source", "n_chars")
    val changes = Seq(
      (2L, "web", 0L, "delete", 1L),      // drop key 2
      (3L, "wiki", 35L, "upsert", 1L),    // update key 3
      (4L, "news", 40L, "upsert", 1L),    // insert key 4
      (5L, "news", 50L, "upsert", 1L),    // insert then...
      (5L, "news", 0L, "delete", 2L),     // ...delete at a later version
      (6L, "x", 60L, "upsert", 1L),
      (6L, "x", 61L, "upsert", 2L)        // later version wins
    ).toDF("doc_id", "source", "n_chars", "op", "version")
    val out = Cdc.applyChanges(snap, changes, Seq("doc_id"),
      Seq("source", "n_chars"), "version")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out == Map(
      1L -> ("web", 10L), 3L -> ("wiki", 35L),
      4L -> ("news", 40L), 6L -> ("x", 61L)))
  }

  test("applyChanges: a same-version delete beats its own upsert (tombstone)") {
    val snap = Seq((1L, "a", 1L)).toDF("doc_id", "source", "n_chars")
    val changes = Seq(
      (1L, "a", 2L, "upsert", 5L), (1L, "a", 0L, "delete", 5L)
    ).toDF("doc_id", "source", "n_chars", "op", "version")
    val out = Cdc.applyChanges(snap, changes, Seq("doc_id"),
      Seq("source", "n_chars"), "version")
    assert(out.count() == 0L)
  }

  test("scd2Stream one-batch run equals the batch operator's closed intervals") {
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), (1L, "b", 30L, 102L),
      (1L, "a", 50L, 103L), (2L, "x", 5L, 104L), (2L, "y", 7L, 105L)
    ).toDF("user_id", "attr", "ms", "event_id")
    val batchClosed = Cdc.scd2(ev, "user_id", "attr", col("ms"), "event_id")
      .where(col("is_current") === 0L)
      .select("user_id", "attr", "valid_from", "valid_to", "version", "is_current")
      .collect().map(_.toSeq).toSet
    val streamed = Cdc.scd2Stream(ev, "user_id", "attr", "ms", "event_id")
      .collect().map(_.toSeq).toSet
    assert(streamed == batchClosed)
    assert(streamed.size == 3, "a@10-30 and b@30-50 for user 1, x@5-7 for user 2")
  }

  test("scd2Stream sorts in-batch disorder before folding") {
    val ev = Seq((1L, "b", 30L, 2L), (1L, "a", 10L, 1L), (1L, "c", 40L, 3L))
      .toDF("user_id", "attr", "ms", "event_id")
    val rows = Cdc.scd2Stream(ev, "user_id", "attr", "ms", "event_id")
      .orderBy("version").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(("a", 10L, 30L), ("b", 30L, 40L)))
  }

  test("applyChanges: equal (order, op) ties resolve to max value (pinned)") {
    // the documented fall-through: at equal orderCol and equal op the struct
    // max compares the value columns left-to-right — "max value wins". The
    // contract asks callers for a unique orderCol; this pins what happens
    // when they don't.
    val snap = Seq((1L, "a", 1L)).toDF("doc_id", "source", "n_chars")
    val changes = Seq(
      (1L, "b", 7L, "upsert", 5L), (1L, "b", 9L, "upsert", 5L)
    ).toDF("doc_id", "source", "n_chars", "op", "version")
    val out = Cdc.applyChanges(snap, changes, Seq("doc_id"),
      Seq("source", "n_chars"), "version").collect()
    assert(out.length == 1 && out.head.getLong(2) == 9L)
  }

  test("applyChanges: a NULL orderCol fails loudly, not silently-sorts-last") {
    val snap = Seq((1L, "a", 1L)).toDF("doc_id", "source", "n_chars")
    val changes = Seq(
      (1L, "b", 7L, "upsert", Some(5L)), (1L, "c", 8L, "upsert", None)
    ).toDF("doc_id", "source", "n_chars", "op", "version")
    val e = intercept[Exception] {
      Cdc.applyChanges(snap, changes, Seq("doc_id"),
        Seq("source", "n_chars"), "version").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null version")))
  }

  test("scd2Stream throws on a cross-batch event-time regression") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val q = Cdc.scd2Stream(
        input.toDS().toDF("user_id", "attr", "ms", "event_id"),
        "user_id", "attr", "ms", "event_id")
      .writeStream.outputMode("append").format("noop").start()
    input.addData((1L, "a", 100L, 1L))
    q.processAllAvailable()
    // batch 2 delivers ts=50 < the open interval's valid_from=100: the
    // contract violation must fail the query, not emit an inverted interval
    input.addData((1L, "b", 50L, 2L))
    val e = intercept[Exception] { q.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("event-time regression")))
    q.stop()
  }

  test("scd2Apply: N incremental applies == one batch rebuild, hash-equal") {
    // 3 users x 40 events with frequent attr flips, split into 4 time-ordered
    // batches (the maintained-dimension ingest shape)
    val all = (0 until 120).map { i =>
      val u = (i % 3).toLong
      val t = (i / 3).toLong * 10L
      val attr = s"v${(i / 7) % 4}"
      (u, attr, t, i.toLong)
    }
    val batches = all.grouped(30).map(_.toDF("user_id", "attr", "ms", "event_id")).toSeq
    val full = all.toDF("user_id", "attr", "ms", "event_id")
    val batchRebuild = Cdc.scd2(full, "user_id", "attr", col("ms"), "event_id")
      .collect().map(_.toSeq).toSet
    var history = Cdc.scd2(batches.head, "user_id", "attr", col("ms"), "event_id")
    batches.tail.foreach { b =>
      history = Cdc.scd2Apply(history, b, "user_id", "attr", col("ms"), "event_id")
    }
    assert(history.collect().map(_.toSeq).toSet == batchRebuild)
  }

  test("scd2Apply folds in brand-new keys alongside existing ones") {
    val h0 = Cdc.scd2(Seq((1L, "a", 10L, 1L)).toDF("user_id", "attr", "ms", "event_id"),
      "user_id", "attr", col("ms"), "event_id")
    val h1 = Cdc.scd2Apply(h0,
      Seq((1L, "b", 20L, 2L), (9L, "x", 15L, 3L)).toDF("user_id", "attr", "ms", "event_id"),
      "user_id", "attr", col("ms"), "event_id")
    val rows = h1.collect().map(r => (r.getLong(0), r.getString(1),
      r.getAs[Long]("version"), r.getAs[Long]("is_current"))).toSet
    assert(rows == Set((1L, "a", 1L, 0L), (1L, "b", 2L, 1L), (9L, "x", 1L, 1L)))
  }

  test("scd2Apply rejects an equal-ts boundary event (strict progress)") {
    // the open row's real tie is gone once materialized (seed re-enters at
    // Long.MinValue), so equal-ts delta events are outside the N-batch ==
    // one-batch equivalence — the guard refuses them instead of silently
    // diverging from a one-batch rebuild
    val h0 = Cdc.scd2(Seq((1L, "a", 100L, 1L)).toDF("user_id", "attr", "ms", "event_id"),
      "user_id", "attr", col("ms"), "event_id")
    val e = intercept[Exception] {
      Cdc.scd2Apply(h0,
        Seq((1L, "b", 100L, 2L)).toDF("user_id", "attr", "ms", "event_id"),
        "user_id", "attr", col("ms"), "event_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("strict progress")))
  }

  test("scd2Apply throws on a delta that precedes the open interval") {
    val h0 = Cdc.scd2(Seq((1L, "a", 100L, 1L)).toDF("user_id", "attr", "ms", "event_id"),
      "user_id", "attr", col("ms"), "event_id")
    val e = intercept[Exception] {
      Cdc.scd2Apply(h0,
        Seq((1L, "b", 50L, 2L)).toDF("user_id", "attr", "ms", "event_id"),
        "user_id", "attr", col("ms"), "event_id").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("event-time regression")))
  }

  test("aggDeltaAudit: base + delta equals the v2 recompute, per slice") {
    val delta = Cdc.snapshotDelta(v1, v2, Seq("doc_id"), "n_chars", Seq("source"))
    val a = Cdc.aggDeltaAudit(delta, Seq("source"))
      .collect().map(r => r.getString(0) -> r).toMap
    val web = a("web")
    assert(web.getAs[Long]("n_v1") == 2L && web.getAs[Long]("n_v2") == 2L)
    assert(web.getAs[Long]("n_changed") == 1L)
    assert(web.getAs[Long]("sum_v1") == 30L && web.getAs[Long]("sum_v2") == 35L)
    assert(web.getAs[Long]("delta_sum") == 5L)
    val wiki = a("wiki")
    assert(wiki.getAs[Long]("n_added") == 1L && wiki.getAs[Long]("n_removed") == 1L)
    assert(wiki.getAs[Long]("delta_sum") == 10L) // +40 added, -30 removed
    a.values.foreach { r =>
      assert(r.getAs[Long]("n_matches") == 1L && r.getAs[Long]("sum_matches") == 1L)
      assert(r.getAs[Long]("incr_n") == r.getAs[Long]("n_v2"))
      assert(r.getAs[Long]("incr_sum") == r.getAs[Long]("sum_v2"))
    }
  }
}
