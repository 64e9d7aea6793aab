package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Deterministic z-score outliers and the HTML-to-text extraction pass. */
class AnomalySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("zscoreOutliers flags exactly the planted spike, with the textbook dev") {
    // group 'a': 99 values of 10.0 plus one 1000.0 spike
    val rows = (1L to 99L).map(i => (i, "a", 10.0)) :+ ((100L, "a", 1000.0)) :+
      ((200L, "b", 5.0)) // single-row group: dropped by n >= 2
    val out = Anomaly.zscoreOutliers(rows.toDF("event_id", "event_type", "value"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(100L))
    val r = out.head
    val mean = (99 * 10.0 + 1000.0) / 100
    assert(r.getDouble(3) == mean)
    assert(r.getDouble(5) > 3.0) // the spike's z-score
  }

  test("zscoreOutliers is identical across parallelism (exact-decimal moments)") {
    val rows = (0L until 500L).map(i => (i, s"t${i % 3}", (i % 97).toDouble / 3.0))
    def run(df: DataFrame) = Anomaly.zscoreOutliers(df, threshold = 1.8)
      .collect().map(r => (r.getLong(0), r.getDouble(5))).sortBy(_._1)
    val df = rows.toDF("event_id", "event_type", "value")
    assert(run(df).toSeq == run(df.repartition(13)).toSeq)
  }

  test("zscoreOutliers: constant groups (dev 0) flag nothing") {
    val rows = (0L until 50L).map(i => (i, "c", 7.5))
    assert(Anomaly.zscoreOutliers(rows.toDF("event_id", "event_type", "value"))
      .count() == 0L)
  }

  test("madOutliers: contaminated group still flags only the spike (robustness)") {
    // 9 values of 10.0 + one huge spike: the spike inflates mean/dev enough
    // that a z-score at 3.0 can waver; median/MAD flags it unconditionally
    // median 10.0, MAD 0.5 (both exactly representable): the +-0.5 cluster
    // stays under 3*MAD = 1.5, the spike's deviation is 990
    val rows = (1L to 4L).map(i => (i, "a", 10.0)) ++
      Seq((5L, "a", 10.5), (6L, "a", 9.5), (7L, "a", 10.5), (8L, "a", 9.5),
        (9L, "a", 10.5), (10L, "a", 1000.0))
    val out = Anomaly.madOutliers(rows.toDF("event_id", "event_type", "value"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L))
    val r = out.head
    assert(r.getDouble(3) == 10.0 && r.getDouble(4) == 0.5)
    assert(r.getDouble(5) == (1000.0 - 10.0) / 0.5)
  }

  test("madOutliers: constant groups (MAD 0) and single-row groups flag nothing") {
    val rows = (0L until 20L).map(i => (i, "c", 4.2)) :+ ((100L, "solo", 9.9))
    assert(Anomaly.madOutliers(rows.toDF("event_id", "event_type", "value"))
      .count() == 0L)
  }

  test("madOutliers is identical across parallelism (rank-picked stats)") {
    val rows = (0L until 300L).map(i => (i, s"t${i % 3}", ((i * 13) % 101).toDouble / 7.0))
    def run(df: DataFrame) = Anomaly.madOutliers(df, threshold = 1.2)
      .collect().map(r => (r.getLong(0), r.getDouble(5))).sortBy(_._1).toSeq
    val df = rows.toDF("event_id", "event_type", "value")
    assert(run(df) == run(df.repartition(11)))
  }

  test("zscoreStreamFlags on one batch reproduces the batch operator exactly") {
    val rows = (0L until 400L).map(i => (i, s"t${i % 3}", ((i * 17) % 89).toDouble / 4.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val batch = Anomaly.zscoreOutliers(df, threshold = 1.5).collect()
      .map(r => (r.getLong(0), r.getDouble(5))).sortBy(_._1).toSeq
    val stream = Anomaly.zscoreStreamFlags(df, threshold = 1.5).collect()
      .map(r => (r.getLong(0), r.getDouble(5))).sortBy(_._1).toSeq
    assert(batch.nonEmpty && stream == batch) // exact doubles, same flags
  }

  test("zscoreStreamFlags carries running moments across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val flagged = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = Anomaly.zscoreStreamFlags(
        input.toDS().toDF("event_id", "event_type", "value"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val f = b.select("event_id", "n_so_far").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        flagged.synchronized { flagged ++= f }
        ()
      }.start()
    // batch 1: a tight cluster — nothing flags
    input.addData((1L to 50L).map(i => (i, "a", 10.0 + (i % 5) * 0.1)): _*)
    q.processAllAvailable()
    // batch 2: one spike; flagged against the 52-row running totals
    input.addData((100L, "a", 500.0), (101L, "a", 10.2))
    q.processAllAvailable()
    q.stop()
    assert(flagged.map(_._1).toSet == Set(100L))
    assert(flagged.head._2 == 52L) // n_so_far includes BOTH batches
  }

  test("botFlagStream on one batch reproduces the batch operator exactly") {
    val rows =
      (0 until 25).map(i => (1L, i.toLong, i * 1000000L)) ++ // burst user
        (0 until 25).map(i => (2L, (100 + i).toLong, i * 50000000000L)) ++ // slow
        Seq((3L, 300L, 42L)) // single event
    val df = rows.toDF("user_id", "event_id", "ts_us")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))
    val batch = Anomaly.botFlag(df, "user_id", "ts_us", "event_id")
      .collect().map(key).sortBy(_._1).toSeq
    val stream = Anomaly.botFlagStream(df, "user_id", "ts_us", "event_id")
      .collect().map(key).sortBy(_._1).toSeq
    assert(batch.nonEmpty && stream == batch)
  }

  test("botFlagStream bridges gaps and counts across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = Anomaly.botFlagStream(
        input.toDS().toDF("user_id", "event_id", "ts_us"), minEvents = 20L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val f = b.select("user_id", "n_events", "min_gap_us", "is_bot").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        seen.synchronized { seen ++= f }
        ()
      }.start()
    // batch 1: 15 events, 1 s apart — below minEvents, not yet a bot
    input.addData((0 until 15).map(i => (7L, i.toLong, i * 1000000L)): _*)
    q.processAllAvailable()
    // batch 2: 10 more; the bridging gap (batch1 end -> batch2 start) is
    // also 1 s, and the 25-event count crosses the threshold
    input.addData((0 until 10).map(i => (7L, (50 + i).toLong, (15 + i) * 1000000L)): _*)
    q.processAllAvailable()
    q.stop()
    assert(seen.map(t => (t._2, t._4)).toSeq == Seq((15L, 0L), (25L, 1L)))
    assert(seen.last._3 == 1000000L) // the bridged min gap
  }

  test("htmlStrip drops script/style contents, decodes entities, keeps prose") {
    val docs = Seq(
      (1L, "<html><body><p>Hello &amp; welcome</p><script>var x = 1;</script>" +
        "<style>p { x: y }</style><div>a &lt; b &gt; c &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>"),
      (2L, "no markup at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.htmlStrip(docs).collect().map(r => r.getLong(0) -> r).toMap
    val clean1 = out(1L).getString(1)
    assert(clean1 == "Hello & welcome a < b > c \"q\" 's' end", s"got: $clean1")
    assert(!clean1.contains("var x") && !clean1.contains("x: y"))
    assert(out(1L).getLong(2) > 0 && out(1L).getLong(3) == 8L)
    assert(out(2L).getString(1) == "no markup at all")
    assert(out(2L).getLong(2) == 0L && out(2L).getLong(3) == 0L)
  }

  test("htmlStrip never decodes &amp;-escaped entities twice") {
    val docs = Seq((1L, "<p>&amp;lt; stays literal</p>")).toDF("doc_id", "text")
    val clean = TextAnalysis.htmlStrip(docs).collect().head.getString(1)
    assert(clean == "&lt; stays literal", s"got: $clean")
  }

  test("interarrival: nearest-rank picks over hand-built gaps; small users drop") {
    // user 1: ts 0,10,30,70,150 -> gaps 10,20,40,80; median rank (4+1)div2=2
    // -> 20; p95 rank ceil(3.8)=4 -> 80. user 2: one gap only -> dropped
    val ev = (Seq(0L, 10L, 30L, 70L, 150L).zipWithIndex.map {
      case (t, i) => (1L, t, i.toLong)
    } ++ Seq((2L, 0L, 90L), (2L, 5L, 91L))).toDF("user_id", "ts_us", "event_id")
    val out = Anomaly.interarrival(ev).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L))
    val r = out(1L)
    assert(r.getLong(1) == 4L)  // n_gaps
    assert(r.getLong(2) == 10L && r.getLong(3) == 20L &&
      r.getLong(4) == 80L && r.getLong(5) == 80L)
    // identical timestamps: the event-id tie-break makes gap 0 deterministic
    val ties = Seq((3L, 7L, 1L), (3L, 7L, 2L), (3L, 9L, 3L))
      .toDF("user_id", "ts_us", "event_id")
    val t3 = Anomaly.interarrival(ties).collect().head
    assert(t3.getLong(2) == 0L && t3.getLong(5) == 2L)
  }

  test("burstiness: metronome scores -1-ish 0, Poisson-ish positive; small users drop") {
    // user 1: perfectly periodic gaps 10,10,10,10 -> sd 0, B = -1, cv = 0
    val metro = Seq(0L, 10L, 20L, 30L, 40L).zipWithIndex.map {
      case (t, i) => (1L, t, i.toLong)
    }
    // user 2: gaps 1,1,1,97 -> high variance, B > 0
    val bursty = Seq(0L, 1L, 2L, 3L, 100L).zipWithIndex.map {
      case (t, i) => (2L, t, i.toLong)
    }
    // user 3: only 3 events (2 gaps) -> below minEvents=5, dropped
    val small = Seq((3L, 0L, 90L), (3L, 5L, 91L), (3L, 9L, 92L))
    val ev = (metro ++ bursty ++ small).toDF("user_id", "ts_us", "event_id")
    val out = Anomaly.burstiness(ev).collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val m = out(1L)
    assert(m.getLong(1) == 4L)
    assert(m.getAs[Double]("mean_gap_us") == 10.0)
    assert(m.getAs[Double]("sd_gap_us") == 0.0)
    assert(m.getAs[Double]("burstiness") == -1.0)
    assert(m.getAs[Double]("cv") == 0.0)
    val b = out(2L)
    assert(b.getAs[Double]("mean_gap_us") == 25.0)
    assert(b.getAs[Double]("burstiness") > 0.0)
    // all-simultaneous events: mu = 0 -> NULL, never NaN
    val zeros = (0 until 6).map(i => (4L, 0L, i.toLong))
      .toDF("user_id", "ts_us", "event_id")
    val z = Anomaly.burstiness(zeros).collect().head
    assert(z.isNullAt(z.fieldIndex("burstiness")) && z.isNullAt(z.fieldIndex("cv")))
  }

  test("seasonalAnomaly: spike/drop fire on cross-multiplied integer rules only") {
    val week = 604800000L
    // type A, same (dow 0, hour 0) cell over 4 weeks: counts 1,1,1,10
    // cell_total 13, n_cell 4: week-3 spike (10*4 > 3*13), the 1s drop
    // (1*4*3 < 13). Type B uniform: never flags.
    val a = (0 until 3).map(k => ("a", k * week)) ++
      (0 until 10).map(i => ("a", 3 * week + i * 1000L))
    val b = (0 until 4).map(k => ("b", k * week))
    val ev = (a ++ b).toDF("event_type", "ts_ms")
    val out = Anomaly.seasonalAnomaly(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val spike = out(("a", 3 * week))
    assert(spike.getAs[Long]("n") == 10L && spike.getAs[Long]("spike") == 1L)
    assert(spike.getAs[Long]("vol_drop") == 0L)
    val low = out(("a", 0L))
    assert(low.getAs[Long]("spike") == 0L && low.getAs[Long]("vol_drop") == 1L)
    assert(out(("b", 0L)).getAs[Long]("spike") == 0L)
    assert(out(("b", 0L)).getAs[Long]("vol_drop") == 0L)
    assert(out(("a", 0L)).getAs[Long]("n_cell") == 4L)
    assert(out(("a", 0L)).getAs[Long]("cell_total") == 13L)
  }

  test("dispersionIndex: constant counts score 0; clustered counts exceed 1") {
    val h = 3600000L
    // type 'reg': 2 events in each of 3 hours -> mu 2, var 0, D 0
    val reg = (0 until 3).flatMap(k => Seq(("reg", k * h), ("reg", k * h + 1)))
    // type 'burst': counts 1, 1, 10 -> mu 4, var = (1+1+100)/3 - 16 = 18, D 4.5
    val burst = Seq(("burst", 0L), ("burst", h)) ++
      (0 until 10).map(i => ("burst", 2 * h + i.toLong))
    val out = Anomaly.dispersionIndex((reg ++ burst).toDF("event_type", "ts_ms"))
      .collect().map(r => r.getString(0) -> r).toMap
    val r = out("reg")
    assert(r.getAs[Long]("n_buckets") == 3L)
    assert(r.getAs[Double]("mean_per_bucket") == 2.0)
    assert(r.getAs[Double]("var_per_bucket") == 0.0)
    assert(r.getAs[Double]("dispersion") == 0.0)
    val b = out("burst")
    assert(b.getAs[Double]("mean_per_bucket") == 4.0)
    assert(b.getAs[Double]("var_per_bucket") == 18.0)
    assert(b.getAs[Double]("dispersion") == 4.5)
  }

  test("sloBurnRate: both windows must burn; RANGE frame skips gap hours") {
    val h = 3600000L
    def hour(b: Long, total: Int, errors: Int) =
      (0 until total).map(i =>
        (if (i < errors) "error" else "view", b * h + i.toLong))
    // h0: 1/10 (burn 1), h1: 3/10 (burn 3, long 2.0 NOT > 2), h2: 5/10
    // (burn 5, long 3 -> alert); h10 after a gap: clean hour, its own window
    val ev = (hour(0, 10, 1) ++ hour(1, 10, 3) ++ hour(2, 10, 5) ++
      hour(10, 10, 0)).toDF("event_type", "ts_ms")
    val out = Anomaly.sloBurnRate(ev).collect().map(r => r.getLong(0) / h -> r).toMap
    assert(out(0L).getAs[Double]("burn_short") == 1.0)
    assert(out(0L).getAs[Long]("alert") == 0L)
    assert(out(1L).getAs[Double]("burn_short") == 3.0 / 10.0 / 0.1) // IEEE 2.9999999999999996
    assert(out(1L).getAs[Double]("burn_long") == 2.0)               // 0.2/0.1 IS exactly 2.0
    assert(out(1L).getAs[Long]("alert") == 0L, "long window exactly at 2.0 does not fire")
    assert(out(2L).getAs[Double]("burn_short") == 5.0)
    assert(out(2L).getAs[Double]("burn_long") == 9.0 / 30.0 / 0.1)
    assert(out(2L).getAs[Long]("alert") == 1L)
    // the gap hour: the 6h RANGE window reaches back to h5..h10 = itself only
    assert(out(10L).getAs[Long]("n_total_long") == 10L)
    assert(out(10L).getAs[Double]("burn_long") == 0.0)
  }
}
