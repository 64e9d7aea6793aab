package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Backward as-of join semantics on planted fixtures. */
class AsOfSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val right = Seq(
    // (key, rts, rid, state)
    (1L, 10L, 100L, "a"),
    (1L, 20L, 101L, "b"),
    (1L, 20L, 102L, "c"), // same time as 101: larger rid must win
    (2L, 50L, 200L, "z")
  ).toDF("k", "rts", "rid", "state")

  private val left = Seq(
    // (key, lts, id)
    (1L, 5L, 1L),   // before any right row -> nulls
    (1L, 10L, 2L),  // exactly at a right row -> inclusive match (100)
    (1L, 25L, 3L),  // between/after 20 -> latest at 20, tie-broken to 102
    (2L, 60L, 4L),  // normal match on another key
    (3L, 99L, 5L)   // key with no right rows at all -> nulls
  ).toDF("k", "lts", "id")

  test("as-of join: inclusive, latest-wins, deterministic ties, left semantics") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts", "rid")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some((r.getLong(4), r.getString(5))))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains((100L, "a")))
    assert(out(3L).contains((102L, "c")))
    assert(out(4L).contains((200L, "z")))
    assert(out(5L).isEmpty)
  }

  test("as-of join output carries every left column unchanged") {
    val out = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts", "rid")
    assert(out.columns.toSeq == Seq("k", "lts", "id", "rts", "rid", "state"))
    val keys = out.select("k", "lts", "id").as[(Long, Long, Long)].collect().toSet
    assert(keys == left.as[(Long, Long, Long)].collect().toSet)
  }

  test("overlapping column names are rejected") {
    val bad = right.withColumnRenamed("state", "id")
    val e = intercept[IllegalArgumentException](
      AsOf.asofJoin(left, bad, Seq("k"), "lts", "rts", "rid"))
    assert(e.getMessage.contains("id"))
    // columns named like the join's internals are rejected, not silently broken
    val clash = right.withColumnRenamed("state", "_m")
    val e2 = intercept[IllegalArgumentException](
      AsOf.asofJoin(left, clash, Seq("k"), "lts", "rts", "rid"))
    assert(e2.getMessage.contains("_m"))
  }

  test("NULL keys never match (SQL equi-join parity)") {
    val l = Seq((Option.empty[Long], 10L, 1L), (Option(1L), 10L, 2L))
      .toDF("k", "lts", "id")
    val r = Seq((Option.empty[Long], 5L, 100L, "nullkey"), (Option(1L), 5L, 101L, "real"))
      .toDF("k", "rts", "rid", "state")
    val out = AsOf.asofJoin(l, r, Seq("k"), "lts", "rts", "rid")
      .collect().map(row => row.getLong(2) ->
        (if (row.isNullAt(5)) None else Some(row.getString(5)))).toMap
    assert(out(1L).isEmpty, "a NULL-key left row must not receive NULL-key right state")
    assert(out(2L).contains("real"))
  }

  test("NULL right timestamps never match (rts <= lts is never true on NULL)") {
    // nulls-first window order would sort a NULL-rts right row before every
    // real row and carry its payload forward — it must be filtered instead
    val r = Seq((Option(1L), Option.empty[Long], 100L, "nullts"),
      (Option(1L), Option(20L), 101L, "real")).toDF("k", "rts", "rid", "state")
    val out = AsOf.asofJoin(left, r, Seq("k"), "lts", "rts", "rid")
      .collect().map(row => row.getLong(2) ->
        (if (row.isNullAt(5)) None else Some(row.getString(5)))).toMap
    assert(out(1L).isEmpty, "lts=5 precedes every real right row -> must stay null")
    assert(out(2L).isEmpty, "lts=10 precedes rts=20 -> must stay null")
    assert(out(3L).contains("real"))
  }

  test("randomized equivalence with a brute-force as-of (deterministic seed)") {
    val rnd = new scala.util.Random(42)
    val rRows = Seq.tabulate(300)(i => (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong, s"s$i"))
    val lRows = Seq.tabulate(300)(i => (rnd.nextInt(12).toLong, rnd.nextInt(100).toLong, (1000 + i).toLong))
    val r = rRows.toDF("k", "rts", "rid", "state")
    val l = lRows.toDF("k", "lts", "id")
    val expected = lRows.map { case (k, lts, id) =>
      val cands = rRows.filter(rr => rr._1 == k && rr._2 <= lts)
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(rr => (rr._2, rr._3))._3))
    }.toMap
    val got = AsOf.asofJoin(l, r, Seq("k"), "lts", "rts", "rid")
      .collect().map(row => row.getLong(2) ->
        (if (row.isNullAt(4)) None else Some(row.getLong(4)))).toMap
    assert(got == expected)
  }

  test("streaming enrichment: as-of join against a static state table per micro-batch") {
    // the feature-store composition: a live event stream enriched with the
    // point-in-time state inside foreachBatch (each micro-batch is a bounded
    // frame, so the batch operator applies unchanged)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val state = right // (k, rts, rid, state)
    val input = MemoryStream[(Long, Long, Long)]
    val collected = scala.collection.mutable.ArrayBuffer[(Long, Option[String])]()
    val q = input.toDS().toDF("k", "lts", "id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enriched = AsOf.asofJoin(batch, state, Seq("k"), "lts", "rts", "rid").collect()
        collected.synchronized {
          collected ++= enriched.map(r =>
            r.getLong(2) -> (if (r.isNullAt(5)) None else Some(r.getString(5))))
        }
        ()
      }
      .start()
    input.addData((1L, 25L, 1L), (1L, 5L, 2L))
    q.processAllAvailable()
    input.addData((2L, 60L, 3L))
    q.processAllAvailable()
    q.stop()
    assert(collected.toMap == Map(1L -> Some("c"), 2L -> None, 3L -> Some("z")))
  }

  test("plan is a single shuffle on the key — no join amplification") {
    // the executed plan must contain zero Join nodes (union-and-sweep, not a
    // range join) and exactly one exchange feeding the window sort
    val out = AsOf.asofJoin(left, right, Seq("k"), "lts", "rts", "rid")
    val plan = out.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = unwrapped.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty, s"as-of join must not plan a join: $joins")
    val exchanges = unwrapped.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.length == 1, s"expected one shuffle, got ${exchanges.length}")
  }

  test("intervalJoinStream: watermarked stream-stream join honors the lookback") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val convs = MemoryStream[(Long, Long, Long)] // (conv_id, user_id, ms)
    val clicks = MemoryStream[(Long, Long, Long)] // (click_id, user_id, ms)
    val left = convs.toDS().toDF("conv_id", "user_id", "cms")
      .withColumn("conv_ts", timestamp_millis(col("cms"))).drop("cms")
    val right = clicks.toDS().toDF("click_id", "user_id", "kms")
      .withColumn("click_ts", timestamp_millis(col("kms"))).drop("kms")
    val joined = AsOf.intervalJoinStream(left, right, Seq("user_id"),
      "conv_ts", "click_ts", "10 minutes", "1 minute")
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = joined.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val f = b.select("conv_id", "click_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        got.synchronized { got ++= f }
        ()
      }.start()
    val t0 = 1700000000000L
    // clicks: in-window (t0-5m), boundary-exact (t0-10m), too old (t0-11m),
    // after the conversion (t0+1m), other user
    clicks.addData((1L, 7L, t0 - 300000L), (2L, 7L, t0 - 600000L),
      (3L, 7L, t0 - 660000L), (4L, 7L, t0 + 60000L), (5L, 8L, t0 - 60000L))
    q.processAllAvailable()
    convs.addData((100L, 7L, t0))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == Set((100L, 1L), (100L, 2L)))
  }

  test("intervalJoinStream on batch frames equals the brute-force window filter") {
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val left = Seq((1L, 7L, 1000000L), (2L, 7L, 2000000L), (3L, 9L, 1500000L))
      .toDF("conv_id", "user_id", "cms")
      .withColumn("conv_ts", timestamp_millis(col("cms")))
    val right = (0L until 50L).map(i => (i, if (i % 2 == 0) 7L else 9L, i * 50000L))
      .toDF("click_id", "user_id", "kms")
      .withColumn("click_ts", timestamp_millis(col("kms")))
    val out = AsOf.intervalJoinStream(left.drop("cms"), right.drop("kms"),
        Seq("user_id"), "conv_ts", "click_ts", "10 minutes", "1 minute")
      .select("conv_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (c, u, ct) <- Seq((1L, 7L, 1000000L), (2L, 7L, 2000000L), (3L, 9L, 1500000L))
      k <- 0L until 50L
      ku = if (k % 2 == 0) 7L else 9L
      kt = k * 50000L
      if ku == u && kt <= ct && kt >= ct - 600000L
    } yield (c, k)).toSet
    assert(out == brute && brute.nonEmpty)
  }

  test("intervalOverlap: strict overlap semantics, each pair exactly once") {
    import spark.implicits._
    // left interval [0, 100) spans two 50ms bands; right [40, 60) overlaps it,
    // [100, 120) only touches the boundary (half-open: NOT an overlap)
    val left = Seq((1L, 0L, 100L), (2L, 200L, 210L)).toDF("lid", "l_start", "l_end")
    val right = Seq((10L, 40L, 60L), (11L, 100L, 120L), (12L, 205L, 206L))
      .toDF("rid", "r_start", "r_end")
    val out = AsOf.intervalOverlap(left, right, bandMs = 50L)
      .select("lid", "rid", "overlap_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((1L, 10L) -> 20L, (2L, 12L) -> 1L),
      "boundary touch is not an overlap; the spanning pair emits exactly once")
  }

  test("intervalOverlap emits a multi-band pair once, from the overlap-start band") {
    import spark.implicits._
    // both intervals span bands 0..3 -> the pair agrees in four bands but
    // must appear exactly once
    val left = Seq((1L, 0L, 40L)).toDF("lid", "l_start", "l_end")
    val right = Seq((9L, 5L, 35L)).toDF("rid", "r_start", "r_end")
    val out = AsOf.intervalOverlap(left, right, bandMs = 10L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("overlap_ms") == 30L)
  }
}
