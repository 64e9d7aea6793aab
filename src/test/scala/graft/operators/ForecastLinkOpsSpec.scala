package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Round-9 batch: weighted link prediction (Adamic–Adar / resource
 * allocation), blocked pair-cosine histogram, split-half centroid drift,
 * tf-idf cosine retrieval, rolling distinct actors, seasonal-naive
 * baseline error, and Holt linear smoothing — semantics pinned on
 * hand-computable fixtures.
 */
class ForecastLinkOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def edges(rows: (String, String)*): DataFrame = rows.toDF("src", "dst")

  test("adamicAdar scores wedge pairs by hub-discounted center degrees and skips existing edges") {
    // star: hub h linked to a,b,c; plus a-x (so a has deg 2, x deg 1)
    val g = edges("h" -> "a", "h" -> "b", "h" -> "c", "a" -> "x")
    val out = Graph.adamicAdar(g).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // pairs through h (deg 3): (a,b), (a,c), (b,c); through a (deg 2): (h,x) is adjacent? h-x not an edge -> pair (h,x)
    val aa3 = 1.0 / math.log(3.0)
    assert(out(("a", "b"))._1 == 1L && math.abs(out(("a", "b"))._2 - aa3) < 1e-12)
    assert(math.abs(out(("a", "b"))._3 - 1.0 / 3.0) < 1e-12)
    assert(out.contains(("h", "x")) && math.abs(out(("h", "x"))._2 - 1.0 / math.log(2.0)) < 1e-12)
    // no existing edge appears as a candidate
    assert(!out.contains(("a", "h")) && !out.contains(("h", "a")))
  }

  test("adamicAdar maxDeg drops hub centers from wedge generation") {
    val g = edges("h" -> "a", "h" -> "b", "h" -> "c", "a" -> "x")
    val capped = Graph.adamicAdar(g, maxDeg = 2L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // h (deg 3) no longer generates wedges; only a (deg 2) does -> (h, x)
    assert(capped == Set(("h", "x")))
  }

  test("pairCosineHistogram: identical vectors land in the top bin, opposite in bin 0, total pairs = C(n,2) within one block") {
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    // one block so every pair is scored: nBlocks = 1
    val h = Similarity.pairCosineHistogram(e, nBlocks = 1, capPerBlock = 10, bins = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h.values.sum == 3L) // C(3,2)
    assert(h(19L) == 1L)       // (1,2): cos 1 clamps into bin 19
    assert(h(0L) == 2L)        // (1,3), (2,3): cos -1 -> bin 0
  }

  test("pairCosineHistogram cap bounds pairs per block") {
    val e = (1L to 100L).map(i => (i, Array(1.0f, i.toFloat))).toDF("vec_id", "embedding")
    val n = Similarity.pairCosineHistogram(e, nBlocks = 1, capPerBlock = 5, bins = 20)
      .agg(sum("n_pairs")).collect().head.getLong(0)
    assert(n == 10L) // C(5,2), not C(100,2)
  }

  test("centroidDrift: identical halves give cosine 1, opposed halves give cosine -1") {
    val e = Seq(
      (0L, Array(1.0f, 2.0f), 1), (1L, Array(1.0f, 2.0f), 1),   // label 1: even==odd
      (2L, Array(3.0f, 0.0f), 2), (3L, Array(-3.0f, 0.0f), 2))  // label 2: opposed
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDrift(e).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 1L && out(1L)._2 == 1L)
    assert(math.abs(out(1L)._3 - 1.0) < 1e-12)  // sqrt(x)*sqrt(x) rounding
    assert(math.abs(out(2L)._3 + 1.0) < 1e-12)
  }

  test("tfidfTopK ranks by lnc.ltn cosine with full-vector doc norms") {
    val docs = Seq(
      (1L, "b b a"),     // tf(b)=2 -> doc weight 1+ln2; norm over {a, b}
      (2L, "b c c c"),   // tf(b)=1
      (3L, "a a a"))     // no b
      .toDF("doc_id", "text")
    val queries = Seq((100L, "b")).toDF("query_id", "qtext")
    val out = Search.tfidfTopK(docs, queries, k = 10).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getDouble(3)))
    assert(out.map(_._1).toSet == Set(1L, 2L)) // doc 3 has no query term
    val idf = math.log(3.0 / 2.0)
    def q9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w1 = 1.0 + math.log(2.0)
    val norm1 = math.sqrt(q9(1.0 * 1.0) + q9(w1 * w1)) // terms a (tf 1), b (tf 2)
    val s1 = q9(w1 * idf) / norm1
    val norm2 = math.sqrt(q9(1.0) + q9((1.0 + math.log(3.0)) * (1.0 + math.log(3.0))))
    val s2 = q9(1.0 * idf) / norm2
    val byDoc = out.map(r => r._1 -> r._3).toMap
    assert(math.abs(byDoc(1L) - s1) < 1e-9 && math.abs(byDoc(2L) - s2) < 1e-9)
    assert(out.find(_._2 == 1L).get._1 == (if (s1 >= s2) 1L else 2L))
  }

  test("rollingUniques counts trailing-window distinct ids on event days only") {
    val day = 86400000L
    val ev = Seq(
      ("view", 0 * day, 1L), ("view", 0 * day, 2L),      // day 0: {1,2}
      ("view", 2 * day, 2L), ("view", 2 * day, 3L),      // day 2: {2,3}
      ("view", 20 * day, 9L))                            // day 20 (outside any window)
      .toDF("event_type", "ts_ms", "user_id")
    val out = Funnel.rollingUniques(ev, "event_type", "ts_ms", "user_id", windowDays = 7)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 2L)))       // day 0: {1,2} both
    assert(out(2L) == ((2L, 3L)))       // day 2 window [−4, 2]: {1,2,3}
    assert(out(20L) == ((1L, 1L)))
    assert(out.keySet == Set(0L, 2L, 20L)) // day 5 (in day-0's window tail) has no events -> absent
  }

  test("seasonalNaiveError scores only buckets with a 24h-lag partner; exact integer errors") {
    val hour = 3600000L
    // type A: hours 0..47 with count 1 at h<24 and 3 at h>=24 -> 24 scored buckets, |err|=2
    val rows = (0 until 48).flatMap { h =>
      val n = if (h < 24) 1 else 3
      Seq.fill(n)(("A", h * hour, 1L))
    }
    val ev = rows.toDF("event_type", "ts_ms", "user_id")
    val out = Anomaly.seasonalNaiveError(ev, "event_type", "ts_ms").collect().head
    assert(out.getLong(1) == 24L)            // n_scored
    assert(out.getDouble(2) == 2.0)          // mae
    assert(out.getDouble(3) == 48.0 / 72.0)  // wape = sum|err| / sum actual(scored)
    assert(out.getLong(4) == 2L)             // max_abs_err
  }

  test("holtForecast replays the level/trend recursion exactly") {
    val hour = 3600000L
    // metric m: hourly counts 1, 2, 4 (buckets 0, 1, 2)
    val pts = (Seq.fill(1)(0L) ++ Seq.fill(2)(hour) ++ Seq.fill(4)(2 * hour))
      .map(ts => ("m", "s", ts, 1.0)).toDF("metric", "series", "ts", "value")
    val out = TimeSeries.holtForecast(pts).collect().head
    // init l=1, b=2-1=1; fold y=4: l' = .5*4 + .5*(1+1) = 3; b' = .25*(3-1) + .75*1 = 1.25
    assert(out.getLong(1) == 3L)
    assert(out.getDouble(2) == 3.0 && out.getDouble(3) == 1.25)
    assert(out.getDouble(4) == 4.25 && out.getDouble(5) == 3.0 + 24.0 * 1.25)
  }

  test("holtForecast with exactly two buckets returns the init state") {
    val hour = 3600000L
    val pts = (Seq.fill(2)(0L) ++ Seq.fill(5)(hour))
      .map(ts => ("m", "s", ts, 1.0)).toDF("metric", "series", "ts", "value")
    val out = TimeSeries.holtForecast(pts).collect().head
    assert(out.getLong(1) == 2L && out.getDouble(2) == 2.0 && out.getDouble(3) == 3.0)
  }

  test("holtWinters: a perfectly periodic series is absorbed by the seasonal state") {
    val hour = 3600000L
    // period 4, pattern (1,2,3,4) x 3 seasons: l0 = 2.5, s = (-1.5,-.5,.5,1.5);
    // every fold step sees y - s_{t-4} = 2.5 -> level pinned at 2.5, trend 0,
    // seasonal slots unchanged, 1-step forecast = the true next value (1)
    val counts = Seq(1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4)
    val pts = counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("m", "s", h * hour, 1.0))
    }.toDF("metric", "series", "ts", "value")
    val out = TimeSeries.holtWintersForecast(pts, period = 4).collect().head
    assert(out.getAs[Long]("n_buckets") == 12L)
    assert(out.getAs[Double]("level") == 2.5 && out.getAs[Double]("trend") == 0.0)
    assert(out.getAs[Double]("seasonal_next") == -1.5)
    assert(out.getAs[Double]("forecast_1h") == 1.0)
    // h = period uses the freshest slot: 2.5 + 4*0 + 1.5 = 4
    assert(out.getAs[Double]("forecast_24h") == 4.0)
  }

  test("holtWinters: below period+1 buckets excluded; one step replays by hand") {
    val hour = 3600000L
    // period 2, counts 1, 3, 5: l0 = 2, b0 = 0, s = (-1, 1); fold y = 5:
    // l' = .5*(5 - (-1)) + .5*(2 + 0) = 4; b' = .25*(4-2) + .75*0 = 0.5;
    // s' = .25*(5-4) + .75*(-1) = -0.5 -> state [4, .5, s2=1, s'=-0.5]
    val counts = Seq(1, 3, 5)
    val pts = counts.zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("m", "s", h * hour, 1.0))
    }.toDF("metric", "series", "ts", "value")
    val out = TimeSeries.holtWintersForecast(pts, period = 2).collect().head
    assert(out.getAs[Double]("level") == 4.0 && out.getAs[Double]("trend") == 0.5)
    assert(out.getAs[Double]("seasonal_next") == 1.0)  // slot for t+1 (rotated)
    assert(out.getAs[Double]("forecast_1h") == 5.5)
    // too-short series produce no row
    val short = Seq(1, 2).zipWithIndex.flatMap { case (c, h) =>
      Seq.fill(c)(("m", "s", h * hour, 1.0))
    }.toDF("metric", "series", "ts", "value")
    assert(TimeSeries.holtWintersForecast(short, period = 2).count() == 0L)
  }

  test("theilSen recovers a clean linear trend and shrugs off an outlier bucket") {
    val hour = 3600000L
    // metric m: counts 1, 2, 3, ..., 8 (slope exactly 1), with bucket 5
    // replaced by a 100-count outlier
    val pts = (0 until 8).flatMap { h =>
      val n = if (h == 5) 100 else h + 1
      Seq.fill(n)(("m", "s", h * hour, 1.0))
    }.toDF("metric", "series", "ts", "value")
    val out = TimeSeries.theilSen(pts).collect().head
    assert(out.getLong(1) == 8L && out.getLong(2) == 28L) // C(8,2) pairs
    assert(out.getDouble(3) == 1.0)   // median slope survives the outlier
  }

  test("volumeBands flags a spike against the trailing-24 stats, full windows only") {
    val hour = 3600000L
    // 24 buckets at 10, then one spike of 30: first 24 rows have no full
    // trailing window; the spike bucket sees mean 10, sd 0 -> flagged
    val rows = (0 until 24).flatMap(h => Seq.fill(10)(("A", h * hour, 1L))) ++
      Seq.fill(30)(("A", 24 * hour, 1L))
    val out = Anomaly.volumeBands(rows.toDF("event_type", "ts_ms", "user_id"),
      "event_type", "ts_ms").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 24L && r.getLong(2) == 30L)
    assert(r.getDouble(3) == 10.0 && r.getDouble(4) == 0.0 && r.getLong(5) == 1L)
  }

  test("bloomFprAudit: members all hit, salted non-members hit at ~expected rate") {
    val d = (1L to 200L).map(i => (i, s"document number $i with unique content")).toDF("doc_id", "text")
    // members as probes: every one flags (no false negatives)
    val members = Dedup.bloomFprAudit(d, d).collect().head
    assert(members.getLong(0) == 200L && members.getLong(2) == 200L)
    assert(members.getLong(3) == 200L && members.getDouble(4) == 1.0)
    // planted non-members: observed near the analytic rate (tiny for n=200, m=2^20)
    val probes = d.select(col("doc_id"), concat(col("text"), lit(" salt")).as("text"))
    val fpr = Dedup.bloomFprAudit(d, probes).collect().head
    assert(fpr.getLong(1) == 1048576L)
    assert(fpr.getDouble(4) <= 0.01) // expected ~3e-13 at this load
    val k = 4.0; val expect = math.pow(1.0 - math.exp(-k * 200.0 / 1048576.0), k)
    assert(math.abs(fpr.getDouble(5) - expect) < 1e-9)
  }

  test("centroidSilhouette: orthogonal singleton clusters score exactly 1") {
    // 4 orthogonal unit vectors, nLists = 4: every vector IS its centroid
    // (d1 = 0) and the runner-up is orthogonal (d2 = 1) -> s = 1 exactly
    val e = (0 until 4).map { d =>
      (d.toLong, Array.tabulate(4)(i => if (i == d) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val out = SimilarityIvf.centroidSilhouette(e, nLists = 4).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getLong(1) == 1L && r.getDouble(2) == 1.0)
      assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
    }
  }

  test("centroidSilhouette: zero vectors and zero seeds excluded; tied-centroid boundary scores 0") {
    // ids 1, 2 identical unit vectors + a zero vector: both real vectors tie
    // between the two identical centroids (d1 = d2 = 0 -> guard -> s = 0);
    // the zero vector is excluded from corpus AND seeding
    val e = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = SimilarityIvf.centroidSilhouette(e, nLists = 3).collect()
    assert(out.map(_.getLong(1)).sum == 2L) // zero vector dropped
    out.foreach(r => assert(r.getDouble(2) == 0.0))
  }

  test("quotaSample2d keeps exactly cap docs per (lang, source) cell in salted-md5 order") {
    val d = (1L to 60L).map(i => (i, if (i % 2 == 0) "en" else "de", s"src${i % 3}"))
      .toDF("doc_id", "lang", "source")
    val out = Curation.quotaSample2d(d, cap = 3)
    val sizes = out.groupBy("lang", "source").count().collect().map(_.getLong(2)).toSet
    assert(sizes == Set(3L)) // every 10-doc cell capped to 3
    // the kept set per cell is the md5-least 3: recompute expected for one cell
    def h(i: Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"quota2d:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val cell = (1L to 60L).filter(i => i % 2 == 0 && i % 3 == 0) // en, src0
    val expected = cell.sortBy(i => (h(i), i)).take(3).toSet
    val kept = out.where(col("lang") === "en" && col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == expected)
  }
}
