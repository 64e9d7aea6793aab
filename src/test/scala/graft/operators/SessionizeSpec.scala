package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Gap-based sessionization on planted fixtures, pinned against Spark's own
  * `session_window` semantics. */
class SessionizeSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // user 1: two sessions (gap 100 at ts 300); user 2: one session; gap == gapMs
  // must NOT split (strictly-greater starts a session)
  private val events = Seq(
    (1L, 0L, 10L, 1.0), (1L, 50L, 11L, 2.0), (1L, 150L, 12L, 3.0), // gap 100 == gapMs: same session
    (1L, 300L, 13L, 4.0),                                          // gap 150 > gapMs: new session
    (2L, 1000L, 20L, 5.0)
  ).toDF("user_id", "ts_ms", "event_id", "value")

  test("sessions split on gap > gapMs, never on gap == gapMs") {
    val out = Sessionize.sessions(events, "user_id", "ts_ms", "event_id", gapMs = 100L)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().map(r => r._2 -> (r._1, r._3)).toMap
    assert(out(10L) == (1L, 1L) && out(11L) == (1L, 1L) && out(12L) == (1L, 1L))
    assert(out(13L) == (1L, 2L))
    assert(out(20L) == (2L, 1L))
  }

  test("sessionStats rolls up bounds, counts and totals") {
    val out = Sessionize.sessionStats(events, "user_id", "ts_ms", "event_id",
        gapMs = 100L, valueCol = "value")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(out((1L, 1L)) == (0L, 150L, 3L, 6.0))
    assert(out((1L, 2L)) == (300L, 300L, 1L, 4.0))
    assert(out((2L, 1L)) == (1000L, 1000L, 1L, 5.0))
  }

  test("session membership agrees with Spark's built-in session_window") {
    // session_window(gap) merges events whose windows overlap: strictly less
    // than gap apart. Use gap+1 on the built-in to express our inclusive
    // (<= gap stays together) semantics on integer-ms data.
    val viaBuiltin = events
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .groupBy(col("user_id"), session_window(col("event_ts"), "101 milliseconds"))
      .agg(sort_array(collect_list(col("event_id"))).as("members"))
      .select("user_id", "members")
      .as[(Long, Seq[Long])].collect().toSet
    val viaOp = Sessionize.sessions(events, "user_id", "ts_ms", "event_id", gapMs = 100L)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(sort_array(collect_list(col("event_id"))).as("members"))
      .select("user_id", "members")
      .as[(Long, Seq[Long])].collect().toSet
    assert(viaOp == viaBuiltin)
  }

  test("streaming session rollup closes sessions past the watermark, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val stream = Sessionize.sessionStatsStream(
      input.toDS().toDF("user_id", "ts_ms", "event_id", "value")
        .withColumn("event_ts", timestamp_millis(col("ts_ms"))),
      "user_id", "event_ts", gap = "101 milliseconds", watermarkDelay = "0 seconds",
      valueCol = "value")
    val q = stream.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    input.addData((1L, 0L, 10L, 1.0), (1L, 50L, 11L, 2.0), (1L, 150L, 12L, 3.0))
    q.processAllAvailable()
    // watermark still at 150+gap boundary: nothing closed yet; a much later
    // event advances it past the first session's end
    input.addData((1L, 10000L, 13L, 4.0))
    q.processAllAvailable()
    input.addData((1L, 99999999L, 14L, 5.0))
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("sess_stream")
      .select(col("user_id"), unix_millis(col("session.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Double)].collect().toSet
    // first session: events at 0/50/150 (gaps <= 100); second: the lone 10000
    assert(emitted.contains((1L, 0L, 3L, 6.0)))
    assert(emitted.contains((1L, 10000L, 1L, 4.0)))
    // batch membership agrees: same (start, n, sum) from the batch operator
    val batch = Sessionize.sessionStats(
      Seq((1L, 0L, 10L, 1.0), (1L, 50L, 11L, 2.0), (1L, 150L, 12L, 3.0), (1L, 10000L, 13L, 4.0))
        .toDF("user_id", "ts_ms", "event_id", "value"),
      "user_id", "ts_ms", "event_id", gapMs = 100L, valueCol = "value")
      .select(col("user_id"), col("session_start"), col("n_events"), col("sum_value"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(batch.subsetOf(emitted + ((1L, 99999999L, 1L, 5.0))))
  }

  test("columns colliding with sessionization internals are rejected") {
    val bad = events.withColumn("_prev", lit(0L))
    val e = intercept[IllegalArgumentException](
      Sessionize.sessions(bad, "user_id", "ts_ms", "event_id", gapMs = 100L))
    assert(e.getMessage.contains("_prev"))
  }

  test("randomized equivalence with a brute-force sessionizer (deterministic seed)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(2000).toLong, i.toLong, 1.0))
    val expected: Set[(Long, Long, Long)] = rows.groupBy(_._1).flatMap { case (k, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 50L) seq += 1
        prev = e._2
        (k, e._3, seq)
      }
    }.toSet
    val got = Sessionize.sessions(rows.toDF("user_id", "ts_ms", "event_id", "value"),
        "user_id", "ts_ms", "event_id", gapMs = 50L)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("one shuffle for sessionization, one more for the rollup") {
    val stats = Sessionize.sessionStats(events, "user_id", "ts_ms", "event_id",
      gapMs = 100L, valueCol = "value")
    val plan = stats.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = unwrapped.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length <= 2, s"expected <= 2 shuffles, got ${exchanges.length}")
  }

  test("slidingCountsStream == batch slidingCounts on the same data (event counts)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val T = 1704067200000L // epoch-aligned hour
    val fixture = Seq(
      (1L, T, "a"), (2L, T + 1000L, "a"), (1L, T + 899999L, "a"), // same slide
      (3L, T + 900000L, "a"),                                     // next slide
      (1L, T + 3600000L, "b"), (1L, T + 5400000L, "b"))           // other key
    val input = MemoryStream[(Long, Long, String)]
    val streamDf = Sessionize.slidingCountsStream(
      input.toDS().toDF("user_id", "ts_ms", "event_type"),
      "event_type", "ts_ms")
    val q = streamDf.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sliding_test").start()
    input.addData(fixture: _*)
    q.processAllAvailable()
    val stream = spark.table("sliding_test")
      .select("event_type", "window_start", "n_events")
      .as[(String, Long, Long)].collect().toSet
    q.stop()
    val batch = Sessionize.slidingCounts(
      fixture.toDF("user_id", "ts_ms", "event_type"),
      "event_type", "ts_ms", "user_id")
      .select("event_type", "window_start", "n_events")
      .as[(String, Long, Long)].collect().toSet
    assert(stream == batch)
    assert(batch.nonEmpty && batch.exists(_._3 > 1))
  }
}
