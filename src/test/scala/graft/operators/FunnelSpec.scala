package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Strict-order funnel semantics: first occurrences, strictly-after
  * ordering, per-gap horizon, stall propagation. */
class FunnelSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts", "event_type")

  private def run(rows: (Long, Long, String)*) =
    Funnel.funnel(ev(rows: _*), "user_id", "ts", "event_type",
        Seq("a", "b", "c"), horizonMs = 100L)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("complete funnel uses FIRST qualifying event of each step") {
    val out = run(
      (1L, 10L, "a"), (1L, 50L, "a"),          // first a = 10
      (1L, 30L, "b"), (1L, 40L, "b"),          // first b after 10 = 30
      (1L, 35L, "c"), (1L, 90L, "c"))          // first c after 30 = 35
    val r = out(1L)
    assert(r.getLong(1) == 10L && r.getLong(2) == 30L && r.getLong(3) == 35L)
    assert(r.getLong(4) == 3L)
  }

  test("events before the previous step never count; stall nulls all later steps") {
    val out = run(
      (1L, 10L, "a"),
      (1L, 5L, "b"),                            // b BEFORE a: not a conversion
      (1L, 20L, "c"),                           // c without b: cannot count
      (2L, 10L, "a"), (2L, 10L, "b"))           // equal ts: not strictly after
    assert(out(1L).isNullAt(2) && out(1L).isNullAt(3) && out(1L).getLong(4) == 1L)
    assert(out(2L).isNullAt(2) && out(2L).getLong(4) == 1L)
  }

  test("each gap is horizon-bounded independently") {
    val out = run(
      (1L, 0L, "a"), (1L, 101L, "b"),           // b past the 100ms horizon
      (2L, 0L, "a"), (2L, 100L, "b"), (2L, 199L, "c"), // both gaps <= 100
      (3L, 0L, "a"), (3L, 100L, "b"), (3L, 201L, "c")) // c 101ms after b
    assert(out(1L).isNullAt(2) && out(1L).getLong(4) == 1L)
    assert(out(2L).getLong(3) == 199L && out(2L).getLong(4) == 3L)
    assert(out(3L).getLong(2) == 100L && out(3L).isNullAt(3) && out(3L).getLong(4) == 2L)
  }

  test("retention: cohort by first day, distinct users per offset") {
    val d = 86400000L
    val events = Seq(
      (1L, 0L), (1L, 100L),       // user 1: cohort day 0, two events same day
      (1L, d + 1L),               // returns day 1
      (2L, 0L), (2L, 2 * d),      // user 2: cohort day 0, returns day 2
      (3L, d)                     // user 3: cohort day 1 only
    ).toDF("user_id", "ts")
    val got = Funnel.retention(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L,  // users 1 and 2 on their cohort day (dup events collapse)
      (0L, 1L) -> 1L,  // user 1 returns
      (0L, 2L) -> 1L,  // user 2 returns
      (1L, 0L) -> 1L)) // user 3's cohort
  }

  test("retention: pre-1970 timestamps bucket by FLOOR division (oracle's //)") {
    val d = 86400000L
    // ts = -1 is the last ms of day -1 (floor(-1/d) = -1), NOT day 0 as a
    // truncating `div` would compute; -d exactly is day -1 too
    val events = Seq((1L, -1L), (1L, -d), (1L, 0L)).toDF("user_id", "ts")
    val got = Funnel.retention(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L))
  }

  test("users without step 1 are absent") {
    val out = run((1L, 10L, "b"), (1L, 20L, "c"), (2L, 1L, "a"))
    assert(!out.contains(1L) && out.contains(2L))
  }

  test("heavyHitters: per-(key, day) top-k by count, ties to the lower id") {
    val day = 86400000L
    // day 0 type a: user 1 x3, user 2 x3 (tie -> 1 first), user 3 x1
    val ev = Seq(
      (1L, 0L, "a"), (1L, 1L, "a"), (1L, 2L, "a"),
      (2L, 3L, "a"), (2L, 4L, "a"), (2L, 5L, "a"),
      (3L, 6L, "a"),
      (7L, day + 1L, "a"), // day 1
      (9L, 10L, "b")
    ).map { case (u, t, k) => (u, t, k) }
      .toDF("user_id", "ts_ms", "event_type")
    val out = Funnel.heavyHitters(ev, "event_type", "ts_ms", "user_id", k = 2)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(4)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(("a", 0L, 1L)) == ((1L, 3L))) // rank 1: user 1, count 3
    assert(out(("a", 0L, 2L)) == ((2L, 3L))) // rank 2: tie broken to user 2
    assert(out(("a", 1L, 1L)) == ((7L, 1L)))
    assert(out(("b", 0L, 1L)) == ((9L, 1L)))
    assert(!out.contains(("a", 0L, 3L))) // k=2 cuts user 3
  }

  test("dailyTrend: deltas vs the previous observed day; first day NULL") {
    val day = 86400000L
    val ev = (Seq.fill(3)(0L) ++ Seq.fill(5)(day) ++ Seq.fill(2)(3 * day))
      .zipWithIndex.map { case (t, i) => (i.toLong, t + 7L, "a") }
      .toDF("user_id", "ts_ms", "event_type")
    val out = Funnel.dailyTrend(ev, "event_type", "ts_ms").collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(out(0L).isNullAt(4) && out(0L).isNullAt(5))       // no previous day
    assert(out(1L).getLong(4) == 3L && out(1L).getLong(5) == 2L) // prev_n, delta
    assert(out(1L).getDouble(6) == 2.0 / 3.0)
    // gap: day 3 compares against day 1 (previous OBSERVED day)
    assert(out(3L).getLong(3) == 1L && out(3L).getLong(5) == -3L)
  }

  test("heavyHitters is bit-identical across parallelism") {
    val ev = (0L until 1000L)
      .map(i => (i % 37, i * 3600000L, s"t${i % 4}"))
      .toDF("user_id", "ts_ms", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      Funnel.heavyHitters(df, "event_type", "ts_ms", "user_id", k = 3).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._1, t._2, t._5)).toSeq
    assert(run(ev) == run(ev.repartition(13)))
  }

  test("paretoReport: boundary groups split exactly; floor at one user") {
    // counts: u1=10, u2=5, u3=3, u4=1, u5=1 -> 5 users, 20 events
    val rows = Seq.fill(10)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(3)(3L) ++
      Seq(4L, 5L)
    val df = rows.zipWithIndex.map { case (u, i) => (u, i.toLong) }
      .toDF("user_id", "event_id")
    val out = Funnel.paretoReport(df, pcts = Seq(1, 20, 40, 60, 100))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((1L, 10L, 0.5)))   // floor: at least one user
    assert(out(20L) == ((1L, 10L, 0.5)))  // top user alone is half the events
    assert(out(40L) == ((2L, 15L, 0.75)))
    assert(out(60L) == ((3L, 18L, 0.9)))
    assert(out(100L) == ((5L, 20L, 1.0)))
  }

  test("cohortLtv: first-purchase cohorts, per-offset revenue, running cumulative") {
    val d = 86400000L
    val ev = Seq(
      (1L, 0L, "purchase", 10.0),          // u1 cohort day 0
      (1L, d, "purchase", 5.0),            // day 1: two purchases -> one cell
      (1L, d + 1, "purchase", 5.0),
      (2L, d, "purchase", 20.0),           // u2 cohort day 1
      (2L, d, "view", 999.0)               // non-conversions never count
    ).toDF("user_id", "ts_ms", "event_type", "value")
    val out = Funnel.cohortLtv(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out == Map(
      (0L, 0L) -> ((1L, 10.0, 10.0)),
      (0L, 1L) -> ((1L, 10.0, 20.0)),
      (1L, 0L) -> ((1L, 20.0, 20.0))))
  }

  test("hourEntropy: one-hour burst reads 0, even split reads ln 2") {
    val h = 3600000L
    val burst = (1L to 5L).map(i => (1L, 2 * h + i)).toDF("user_id", "ts_ms")
      .withColumn("event_type", lit("cron"))
    val b = Funnel.hourEntropy(burst).collect().head
    assert(b.getLong(1) == 5L && b.getLong(2) == 1L)
    assert(b.getDouble(3) == 1.0 && b.getDouble(4) == 0.0)
    // two hours, two events each: H = -2 * 0.5 ln 0.5 = ln 2
    val even = Seq((1L, 0L), (2L, 1L), (3L, h), (4L, h + 1))
      .toDF("user_id", "ts_ms").withColumn("event_type", lit("organic"))
    val e = Funnel.hourEntropy(even).collect().head
    assert(e.getLong(2) == 2L && e.getDouble(3) == 0.5)
    assert(math.abs(e.getDouble(4) - math.log(2.0)) < 1e-9)
  }

  test("paretoReport: ties inside a count group split by interchangeability") {
    // four users all with 2 events: top 25% = 1 user = exactly 1/4 of events
    val df = (1L to 4L).flatMap(u => Seq(u, u)).zipWithIndex
      .map { case (u, i) => (u, i.toLong) }.toDF("user_id", "event_id")
    val out = Funnel.paretoReport(df, pcts = Seq(25, 50))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(25L) == ((1L, 2L, 0.25)))
    assert(out(50L) == ((2L, 4L, 0.5)))
  }

  test("markovStationary: a 2-cycle stays uniform; an absorbing state takes all mass") {
    def run(rows: Seq[(Long, Long, Long, String)]) =
      Funnel.markovStationary(rows.toDF("user_id", "ts_ms", "event_id", "event_type"),
        "user_id", "ts_ms", "event_id", "event_type")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // A -> B -> A: doubly stochastic, uniform is stationary
    val cyc = run(Seq((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A")))
    assert(cyc == Map("A" -> 500000000000L, "B" -> 500000000000L))
    // A -> B, B absorbing (self-loop): all mass drains to B
    val abs = run(Seq((1L, 1L, 1L, "A"), (1L, 2L, 2L, "B")))
    assert(abs == Map("A" -> 0L, "B" -> 1000000000000L))
    // no observed transition (single events per user): empty frame, no
    // division-by-zero on the empty state set
    val empty = run(Seq((1L, 1L, 1L, "A"), (2L, 1L, 2L, "B")))
    assert(empty.isEmpty)
  }

  test("pathTrigrams: counts in time order, total-order rank, k cut") {
    val ev = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "C"),
      (1L, 4L, 4L, "B"), (1L, 5L, 5L, "C"),
      (2L, 1L, 6L, "A"), (2L, 2L, 7L, "B"), (2L, 3L, 8L, "C"))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val out = Funnel.pathTrigrams(ev, "user_id", "ts_ms", "event_id", "event_type", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getString(3)), r.getLong(4))).toMap
    assert(out(1L) == ((("A", "B", "C"), 2L)), "shared path counted across users")
    assert(out(2L) == ((("B", "C", "B"), 1L)), "t1 tie-break after count")
    assert(out.size == 2, "k cut applied")
  }

  test("srmCheck: chi2 against the designed split; duplicate events count users once") {
    def ev(treatIds: Set[Long]) = (1L to 10L).flatMap(u => Seq(u, u))
      .map(u => (if (treatIds.contains(u)) "treat" else "control", u))
      .toDF("variant", "user_id")
    // 2 of 10 treat vs designed 50%: chi2 = 9/5 + 9/5 = 3.6 -> no flag
    val near = Funnel.srmCheck(ev(Set(1L, 2L))).collect().head
    assert(near.getAs[Long]("n_users") == 10L && near.getAs[Long]("n_treat") == 2L)
    assert(near.getAs[Double]("chi2") == 3.6)
    assert(near.getAs[Long]("srm_flag") == 0L)
    // 1 of 10: chi2 = 16/5 + 16/5 = 6.4 -> flag
    val bad = Funnel.srmCheck(ev(Set(1L))).collect().head
    assert(bad.getAs[Double]("chi2") == 6.4)
    assert(bad.getAs[Long]("srm_flag") == 1L)
    // perfect split: chi2 = 0
    val good = Funnel.srmCheck(ev((1L to 5L).toSet)).collect().head
    assert(good.getAs[Double]("chi2") == 0.0 && good.getAs[Long]("srm_flag") == 0L)
  }

  test("ctrWilson: bound sits below p, clamps click>view hours, drops zero-view hours") {
    val h = 3600000L
    val ev = (Seq.fill(4)(("view", 0L)) ++ Seq(("click", 1L)) ++      // h0: 4v 1c
      Seq(("view", h)) ++ Seq.fill(2)(("click", h + 1)) ++            // h1: 1v 2c
      Seq(("click", 2 * h)))                                          // h2: 0v -> absent
      .toDF("event_type", "ts_ms")
    val out = Funnel.ctrWilson(ev).collect().map(r => r.getLong(0) / h -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    val r0 = out(0L)
    assert(r0.getAs[Long]("n_views") == 4L && r0.getAs[Long]("n_clicks") == 1L)
    assert(r0.getAs[Double]("ctr") == 0.25)
    assert(r0.getAs[Double]("wilson_low") > 0.0 && r0.getAs[Double]("wilson_low") < 0.25)
    val r1 = out(1L)
    assert(r1.getAs[Double]("ctr") == 1.0, "clicks past views clamp to 1")
    assert(r1.getAs[Double]("wilson_low") < 1.0, "one-view certainty is not certainty")
  }

  test("cupedReport: hand-computed pooled theta, adjusted means; zero-variance covariate -> raw means") {
    val day = 86400000L
    // days 0..3 -> mid = 1; (x, y) per user: u0=(2,4) u2=(1,2) control,
    // u1=(3,6) u3=(2,5) treat. Pooled: n=4 sx=8 sy=17 sxy=38 sxx=18 ->
    // theta = (4*38-8*17)/(4*18-64) = 16/8 = 2; mean_x_all = 2.
    def mk(u: Long, d: Long, k: Int) = Seq.fill(k)((u, d * day + u))
    val rows = mk(0L, 0L, 2) ++ mk(0L, 2L, 4) ++ mk(2L, 0L, 1) ++ mk(2L, 2L, 2) ++
      mk(1L, 0L, 3) ++ mk(1L, 2L, 6) ++ mk(3L, 0L, 2) ++ mk(3L, 2L, 5)
    val ev = rows.toDF("user_id", "ts_ms")
      .withColumn("variant", when(col("user_id") % 2 === 0, "control").otherwise("treat"))
    val out = Funnel.cupedReport(ev, "variant")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("control").getAs[Double]("theta") == 2.0)
    assert(out("control").getAs[Double]("mean_pre") == 1.5 &&
      out("control").getAs[Double]("mean_post") == 3.0 &&
      out("control").getAs[Double]("mean_adjusted") == 4.0)
    assert(out("treat").getAs[Double]("mean_pre") == 2.5 &&
      out("treat").getAs[Double]("mean_post") == 5.5 &&
      out("treat").getAs[Double]("mean_adjusted") == 4.5)
    // adjusted means keep the pooled post mean: the correction is zero-sum
    // here because both variants have 2 users
    assert(out("control").getAs[Double]("mean_adjusted") +
      out("treat").getAs[Double]("mean_adjusted") == 3.0 + 5.5)

    // identical pre-period counts -> var(x) = 0 -> theta NULL, raw means kept
    val flat = (mk(0L, 0L, 2) ++ mk(0L, 2L, 4) ++ mk(1L, 0L, 2) ++ mk(1L, 2L, 6))
      .toDF("user_id", "ts_ms")
      .withColumn("variant", when(col("user_id") % 2 === 0, "control").otherwise("treat"))
    val f = Funnel.cupedReport(flat, "variant")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(f("control").isNullAt(4) &&
      f("control").getAs[Double]("mean_adjusted") == f("control").getAs[Double]("mean_post"))
  }

  test("funnelRates: threshold counts, step-1 NULL conversion, ctrWilson's exact bound") {
    // 4 users enter, 2 reach b, 1 reaches c
    val out = Funnel.funnelRates(ev(
        (1L, 0L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
        (2L, 0L, "a"), (2L, 10L, "b"),
        (3L, 0L, "a"),
        (4L, 0L, "a"),
        (5L, 0L, "b")), // never step 1 -> not in any count
      "user_id", "ts", "event_type", Seq("a", "b", "c"), horizonMs = 100L)
      .collect().map(r => r.getAs[Long]("step") -> r).toMap
    assert(out(1L).getAs[Long]("n_reached") == 4L && out(1L).isNullAt(3) && out(1L).isNullAt(4))
    assert(out(2L).getAs[Long]("n_reached") == 2L && out(2L).getAs[Double]("conv_from_prev") == 0.5)
    assert(out(3L).getAs[Long]("n_reached") == 1L && out(3L).getAs[Double]("conv_from_prev") == 0.5)
    // the bound is the exact ctrWilson chain: recompute for p=0.5, n=4
    def wilson(p: Double, n: Double): Double = {
      val z = 1.96; val z2 = z * z
      (p + z2 / (n * 2.0) - z * math.sqrt(p * (1.0 - p) / n + z2 / (n * n * 4.0))) /
        (1.0 + z2 / n)
    }
    assert(out(2L).getAs[Double]("wilson_low") == wilson(0.5, 4.0))
    assert(out(3L).getAs[Double]("wilson_low") == wilson(0.5, 2.0))
    assert(out(2L).getAs[Double]("wilson_low") > out(3L).getAs[Double]("wilson_low"),
      "same ratio at lower volume must bound lower")
  }
}
