package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Operator math pinned to reference test vectors:
 * - moving average: TimeSeriesGroupingIteratorTest.java:50-63 (5-point 0.2
 *   filter over 1..10 -> first emission after 5 points, mean of the window);
 * - rate: RateIterator is the FIR filter [-1,1] divided by dt * interval
 *   (RateIterator.java:60,64-106) with counter/reset branches;
 * - dev: RMS quirk (Dev.java:5-19);
 * - downsample buckets epoch-aligned (Downsample.java:31-43).
 */
class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def points(rows: (String, Long, Double, Map[String, String])*): DataFrame =
    rows.toDF("metric", "ts", "value", "tags")
      .withColumn("viz", org.apache.spark.sql.functions.lit(null).cast("string"))

  private val host = Map("host" -> "h1")

  test("5-point moving average emits from the 5th point, time-ordered") {
    // one point per second, values 1..10
    val df = points((1 to 10).map(i => ("m", 1000L * i, i.toDouble, host)): _*)
    val out = TimeSeries.firFilter(df, Seq.fill(5)(0.2))
      .select("ts", "filtered").sort("ts").as[(Long, Double)].collect()
    // first emission at t=5 with avg(1..5)=3.0, then 4.0 ... 8.0
    assert(out.map(_._1).toSeq == (5 to 10).map(_ * 1000L))
    out.map(_._2).zip(Seq(3.0, 4.0, 5.0, 6.0, 7.0, 8.0)).foreach {
      case (got, want) => assert(math.abs(got - want) < 1e-9)
    }
  }

  test("moving average keeps interleaved series independent") {
    val a = (1 to 6).map(i => ("m", 1000L * i, i.toDouble, Map("host" -> "a")))
    val b = (1 to 6).map(i => ("m", 1000L * i + 1, 10.0 * i, Map("host" -> "b")))
    val out = TimeSeries.firFilter(points((a ++ b): _*), Seq.fill(5)(0.2))
      .select("series", "ts", "filtered").sort("series", "ts")
      .as[(String, Long, Double)].collect()
    val bySeries = out.groupBy(_._1)
    assert(math.abs(bySeries("host=a").head._3 - 3.0) < 1e-9)
    assert(math.abs(bySeries("host=b").head._3 - 30.0) < 1e-9)
  }

  test("ewmaWeights: normalized exponential taps, newest heaviest") {
    val w = TimeSeries.ewmaWeights(0.5, 4)
    // raw taps q^3..q^0 = 0.125, 0.25, 0.5, 1.0 over total 1.875
    assert(w == Seq(0.125 / 1.875, 0.25 / 1.875, 0.5 / 1.875, 1.0 / 1.875))
    assert(math.abs(w.sum - 1.0) < 1e-12)
    // alpha = 1 degenerates to "latest value only"
    assert(TimeSeries.ewmaWeights(1.0, 4) == Seq(0.0, 0.0, 0.0, 1.0))
  }

  test("ewma FIR smooths a step: converges toward the new level") {
    // constant 0 then a step to 10 at t=6
    val df = points(((1 to 5).map(i => ("m", 1000L * i, 0.0, host)) ++
      (6 to 12).map(i => ("m", 1000L * i, 10.0, host))): _*)
    val out = TimeSeries.firFilter(df, TimeSeries.ewmaWeights(0.5, 4))
      .select("ts", "filtered").sort("ts").as[(Long, Double)].collect()
    assert(out.head == ((4000L, 0.0)))
    // monotone approach to 10 after the step, newest-weighted
    val post = out.filter(_._1 >= 6000L).map(_._2)
    assert(post.zip(post.tail).forall { case (a, b) => b >= a })
    assert(post.head > 5.0 && math.abs(post.last - 10.0) < 0.2)
  }

  test("rate: first difference scaled by interval; same-ts pair -> 0") {
    // values 10, 30, 30 at 1s spacing; interval 1000ms -> rates 20, 0
    val df = points(
      ("m", 1000L, 10.0, host), ("m", 2000L, 30.0, host), ("m", 3000L, 30.0, host))
    val out = TimeSeries.rate(df, 1000L).select("ts", "rate").sort("ts")
      .as[(Long, Double)].collect()
    assert(out.toSeq == Seq((2000L, 20.0), (3000L, 0.0)))
  }

  test("rate counter semantics: wrap adds counterMax (or prev); reset clamps") {
    // counter drops 100 -> 10: with counterMax=120, cur becomes 130 -> rate (130-100)/1s = 30
    val df = points(("m", 1000L, 100.0, host), ("m", 2000L, 10.0, host))
    val wrapped = TimeSeries.rate(df, 1000L, counter = true, counterMax = 120L)
      .select("rate").as[Double].collect()
    assert(wrapped.toSeq == Seq(30.0))
    // counterMax unset: cur += prev -> (110-100)/1s = 10
    val prevAdd = TimeSeries.rate(df, 1000L, counter = true)
      .select("rate").as[Double].collect()
    assert(prevAdd.toSeq == Seq(10.0))
    // resetValue: rates above it emit 0
    val reset = TimeSeries.rate(df, 1000L, counter = true, counterMax = 120L, resetValue = 20L)
      .select("rate").as[Double].collect()
    assert(reset.toSeq == Seq(0.0))
  }

  test("dev is RMS, not stddev: sqrt(sum(x^2)/(n-1)), n==1 -> sqrt(sum(x^2))") {
    val df = points(("m", 0L, 3.0, host), ("m", 1L, 4.0, host))
    val Row(v: Double) = TimeSeries.downsample(df, 3600000L, "dev").select("value").head
    assert(math.abs(v - math.sqrt((9.0 + 16.0) / 1)) < 1e-9) // n=2 -> /(2-1)
    val single = points(("m", 0L, 3.0, host))
    val Row(s: Double) = TimeSeries.downsample(single, 3600000L, "dev").select("value").head
    assert(math.abs(s - 3.0) < 1e-9)
  }

  test("downsample buckets are epoch-aligned and per-series") {
    val df = points(
      ("m", 0L, 1.0, host), ("m", 59999L, 3.0, host),   // bucket 0
      ("m", 60000L, 5.0, host),                          // bucket 60000
      ("m", 61000L, 7.0, Map("host" -> "h2")))           // other series
    val out = TimeSeries.downsample(df, 60000L, "avg")
      .select("series", "bucket_ms", "value").sort("series", "bucket_ms")
      .as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(
      ("host=h1", 0L, 2.0), ("host=h1", 60000L, 5.0), ("host=h2", 60000L, 7.0)))
  }

  test("cross-series aggregation collapses all series per bucket") {
    val df = points(
      ("m", 0L, 1.0, Map("host" -> "a")), ("m", 1L, 3.0, Map("host" -> "b")))
    val out = TimeSeries.crossSeries(TimeSeries.downsample(df, 60000L, "avg"), "sum")
      .select("bucket_ms", "value").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 4.0)))
  }

  test("two-level fold: 100k series per bucket, bounded shards, bit-exact") {
    import org.apache.spark.sql.functions._
    val n = 100000
    // a hot metric with 100k collapsing series in ONE bucket — the case where
    // a single-level sorted fold would put all 100k doubles in one buffer
    val df = spark.range(n.toLong).select(
      lit("m").as("metric"),
      concat(lit("user=u"), col("id")).as("series"),
      lit(0L).as("bucket_ms"),
      ((col("id") % 997).cast("double") / lit(7.0)).as("value"))
    val out = TimeSeries.crossSeries(df, "sum")
      .select("bucket_ms", "value").as[(Long, Double)].collect()

    // independent JVM-side reference of the same two-level deterministic fold
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val byShard = (0 until n)
      .map(i => (Integer.parseInt(md5hex(s"user=u$i").substring(0, 2), 16) % 64,
        (i % 997).toDouble / 7.0))
      .groupBy(_._1).values
    val psums = byShard.map(_.map(_._2).sorted.foldLeft(0.0)(_ + _)).toSeq
    val expected = psums.sorted.foldLeft(0.0)(_ + _)
    assert(out.length == 1 && out.head._1 == 0L)
    assert(out.head._2 == expected) // bit-exact, not approximate

    // the shard really bounds the level-1 buffers: every shard holds a small
    // fraction of the series, so no aggregation buffer sees the full 100k
    val shardSizes = byShard.map(_.size)
    assert(shardSizes.size == 64 && shardSizes.max < 2 * n / 64)
  }

  test("two-level avg and dev match their single-group definitions") {
    import org.apache.spark.sql.functions._
    // all series land in distinct shards rarely; with 200 series the two-level
    // result must still equal the closed-form checks on simple values
    val df = spark.range(200L).select(
      lit("m").as("metric"),
      concat(lit("s"), col("id")).as("series"),
      lit(0L).as("bucket_ms"),
      lit(2.0).as("value")) // constant values: any summation order is exact
    val avg = TimeSeries.crossSeries(df, "avg").select("value").as[Double].head()
    assert(avg == 2.0)
    val dev = TimeSeries.crossSeries(df, "dev").select("value").as[Double].head()
    assert(math.abs(dev - math.sqrt(200 * 4.0 / 199)) < 1e-12)
  }

  test("autocorrelation: alternating series reads -5/6 at lag 1, 2/3 at lag 2") {
    // one point per hourly bucket, values 1,2,1,2,1,2 (n=6, mean 1.5):
    // lag1: 5 pairs, each deviation product -0.25 -> num -1.25, den 1.5
    // lag2: 4 pairs, each +0.25 -> num 1.0
    val df = points((0 until 6).map(i =>
      ("m", 3600000L * i, if (i % 2 == 0) 1.0 else 2.0, host)): _*)
    val out = TimeSeries.autocorrelation(df).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out.keySet == Set(1L, 2L, 24L))
    assert(out(1L).getLong(2) == 6L) // n_buckets
    assert(out(1L).getLong(3) == 5L) // n_pairs
    assert(math.abs(out(1L).getDouble(4) - (-5.0 / 6.0)) < 1e-9)
    assert(out(2L).getLong(3) == 4L)
    assert(math.abs(out(2L).getDouble(4) - (2.0 / 3.0)) < 1e-9)
    // lag 24 has no pair on a 6-bucket series; constant series -> NULL acf
    assert(out(24L).getLong(3) == 0L && out(24L).isNullAt(4))
    val const = points((0 until 4).map(i => ("c", 3600000L * i, 7.0, host)): _*)
    val cs = TimeSeries.autocorrelation(const).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(cs(1L).getLong(3) == 3L && cs(1L).isNullAt(4)) // zero variance
  }

  test("crossCorrelation: a shifted copy correlates 1.0 at its lead lag") {
    // n is m delayed one bucket (n_t = m_{t-1}); p = 9 - m (anticorrelated)
    val m = Seq(1.0, 5.0, 2.0, 8.0)
    val df = points(
      (m.zipWithIndex.map { case (v, i) => ("m", 3600000L * i, v, host) } ++
        Seq(("n", 0L, 3.0, host)) ++
        m.take(3).zipWithIndex.map { case (v, i) => ("n", 3600000L * (i + 1), v, host) } ++
        m.zipWithIndex.map { case (v, i) => ("p", 3600000L * i, 9.0 - v, host) }): _*)
    val out = TimeSeries.crossCorrelation(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r).toMap
    // lag 1 m->n: matched pairs (1,1),(5,5),(2,2) -> exactly linear
    assert(math.abs(out(("m", "n", 1L)).getDouble(4) - 1.0) < 1e-12)
    assert(out(("m", "n", 1L)).getLong(3) == 3L)
    // lag 0 m->n includes the unrelated n_0 -> NOT a perfect fit
    assert(math.abs(out(("m", "n", 0L)).getDouble(4)) < 0.999)
    // anticorrelated pair reads -1 at lag 0
    assert(math.abs(out(("m", "p", 0L)).getDouble(4) - (-1.0)) < 1e-12)
    // a single metric alone yields no pair rows
    val solo = points((0 until 4).map(i => ("x", 3600000L * i, i.toDouble, host)): _*)
    assert(TimeSeries.crossCorrelation(solo).count() == 0)
  }

  test("trendReport: unit ramp slope 1; gaps advance the index; single bucket NULL") {
    val ramp = points((0 until 4).map(i =>
      ("r", 3600000L * i, (i + 1).toDouble, host)): _*)
    val out = TimeSeries.trendReport(ramp).collect().map(r => r.getString(0) -> r).toMap
    assert(out("r").getLong(1) == 4L)
    assert(math.abs(out("r").getDouble(2) - 2.5) < 1e-9)   // mean
    assert(math.abs(out("r").getDouble(3) - 1.0) < 1e-9)   // slope per bucket
    // a missing middle bucket: values 1 at h0 and 3 at h2 -> slope 1, not 2
    val gap = points(("g", 0L, 1.0, host), ("g", 7200000L, 3.0, host))
    val g = TimeSeries.trendReport(gap).collect().head
    assert(math.abs(g.getDouble(3) - 1.0) < 1e-9)
    // single bucket: zero index variance -> NULL slope, defined mean
    val one = points(("o", 0L, 5.0, host))
    val o = TimeSeries.trendReport(one).collect().head
    assert(o.isNullAt(3) && math.abs(o.getDouble(2) - 5.0) < 1e-9)
  }

  test("changepoint: finds the planted step; constant series tie to the earliest split") {
    val h = 3600000L
    val step = points((0 until 5).map(i =>
      ("s", h * i, if (i < 3) 1.0 else 5.0, host)): _*)
    val r = TimeSeries.changepoint(step).collect().head
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L) // n_buckets, n_before
    assert(r.getLong(3) == 3 * h)                    // first bucket after
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 5.0 && r.getDouble(6) == 4.0)
    val const = points((0 until 3).map(i => ("c", h * i, 2.0, host)): _*)
    val c = TimeSeries.changepoint(const).collect().head
    assert(c.getLong(2) == 1L && c.getDouble(6) == 0.0) // tie -> earliest k
    // single bucket: no split exists
    assert(TimeSeries.changepoint(points(("o", 0L, 1.0, host))).count() == 0)
  }

  test("gorilla cost model: hand-computed bit classes per point") {
    // one series: first point 64+64; repeat value XOR=0 -> 1 bit;
    // regular cadence dod=0 -> 1 bit; jitter 100ms -> 12-bit class;
    // value 1.0 -> 1.5: sv 10000 xor 15000 = 7560 (13 significant bits)
    // -> 13 + 13 = 26 bits
    val df = points(
      ("m", 1000L, 1.0, host), ("m", 2000L, 1.0, host),
      ("m", 3000L, 1.0, host), ("m", 4100L, 1.5, host))
    val r = TimeSeries.gorillaCost(df).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 4L)      // n_series, n_points
    assert(r.getLong(3) == 512L)                          // raw = 4 * 128
    assert(r.getLong(4) == 64L + 14L + 1L + 12L)          // ts_bits = 91
    assert(r.getLong(5) == 64L + 1L + 1L + 26L)           // val_bits = 92
    assert(r.getLong(6) == 183L)
    assert(math.abs(r.getDouble(7) - 512.0 / 183.0) < 1e-12)
  }

  test("gorilla cost model: wild timestamps take the 36-bit escape, series stay independent") {
    // series a: third point's dod = (100000 - 1000) - 1000 = 98000 -> 36 bits
    val a = Seq(("m", 1000L, 2.0, Map("host" -> "a")),
      ("m", 2000L, 2.0, Map("host" -> "a")),
      ("m", 102000L, 2.0, Map("host" -> "a")))
    // series b interleaved: 2 points only -> 64 + 14 ts bits
    val b = Seq(("m", 1500L, 3.0, Map("host" -> "b")),
      ("m", 2500L, 3.0, Map("host" -> "b")))
    val r = TimeSeries.gorillaCost(points((a ++ b): _*)).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 5L)
    assert(r.getLong(4) == (64L + 14L + 36L) + (64L + 14L)) // ts_bits
    assert(r.getLong(5) == (64L + 1L + 1L) + (64L + 1L))    // val_bits
  }

  test("downsampleFill: full grid per series; zero and LOCF policies; filled flag") {
    // series h1 has points in hours 0, 2 (hour 1 missing); series h2 only hour 5
    val df = points(
      ("m", 0L, 2.0, host), ("m", 1000L, 4.0, host),        // hour 0 avg 3.0
      ("m", 2 * 3600000L, 7.0, host),                       // hour 2
      ("m", 5 * 3600000L, 9.0, Map("host" -> "h2")))
    val out = TimeSeries.downsampleFill(df, 3600000L).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r).toMap
    val h1 = "host=h1"
    assert(out.keys.count(_._1 == h1) == 3, "grid spans first..last bucket")
    assert(out((h1, 0L)).getDouble(3) == 3.0)
    val gap = out((h1, 3600000L))
    assert(gap.isNullAt(3), "none policy: missing bucket is NULL")
    assert(gap.getDouble(4) == 0.0, "zero policy")
    assert(gap.getDouble(5) == 3.0, "LOCF carries hour 0 forward")
    assert(gap.getAs[Long]("filled") == 1L)
    assert(out((h1, 2 * 3600000L)).getAs[Long]("filled") == 0L)
    // single-bucket series: grid is just itself
    assert(out.keys.count(_._1 == "host=h2") == 1)
  }
}
