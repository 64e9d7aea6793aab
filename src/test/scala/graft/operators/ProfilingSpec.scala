package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Column profiler: hand-checked stats, NULL handling, empty frames, and
  * the one-scan plan contract. */
class ProfilingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def d = Seq(
    (1L, Some("aa"), Some(2.0)),
    (2L, Some("bbbb"), None),
    (3L, None, Some(-1.5)),
    (3L, Some("c"), Some(2.0))
  ).toDF("id", "s", "v")

  test("hand-checked per-column stats") {
    val p = Profiling.columnProfile(d, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val id = p("id")
    assert(id.getAs[Long]("n_rows") == 4L && id.getAs[Long]("n_null") == 0L &&
      id.getAs[Long]("n_distinct") == 3L)
    assert(id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 3.0)
    assert(id.isNullAt(id.fieldIndex("min_str")) && id.isNullAt(id.fieldIndex("avg_len")))
    val s = p("s")
    assert(s.getAs[Long]("n_null") == 1L && s.getAs[Long]("n_distinct") == 3L)
    assert(s.getAs[String]("min_str") == "aa" && s.getAs[String]("max_str") == "c")
    assert(s.getAs[Double]("avg_len") == (2 + 4 + 1) / 3.0)
    assert(s.isNullAt(s.fieldIndex("min_num")))
    val v = p("v")
    assert(v.getAs[Long]("n_null") == 1L && v.getAs[Long]("n_distinct") == 2L)
    assert(v.getAs[Double]("min_num") == -1.5 && v.getAs[Double]("max_num") == 2.0)
  }

  test("empty frame profiles to zero counts, no throw") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val p = Profiling.columnProfile(empty, Seq("id", "s"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.size == 2)
    assert(p("id").getAs[Long]("n_rows") == 0L &&
      p("id").getAs[Long]("n_null") == 0L &&
      p("id").getAs[Long]("n_distinct") == 0L)
  }

  test("all columns profile in ONE scan of the input") {
    val plan = Profiling.columnProfile(d, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single input scan, got $scans:\n$plan")
  }

  test("unknown column is rejected eagerly") {
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(d, Seq("nope"))
    }
  }

  test("columnProfileApprox matches the exact profiler on everything but n_distinct") {
    // 5000 rows x 3 columns, distinct cardinalities 5000 / 100 / 50
    val big = (0 until 5000).map(i => (i.toLong, s"s${i % 100}", (i % 50).toDouble))
      .toDF("id", "s", "v")
    val exact = Profiling.columnProfile(big, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val approx = Profiling.columnProfileApprox(big, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    Seq("id", "s", "v").foreach { c =>
      val e = exact(c); val a = approx(c)
      assert(a.getAs[Long]("n_rows") == e.getAs[Long]("n_rows"))
      assert(a.getAs[Long]("n_null") == e.getAs[Long]("n_null"))
      Seq("min_num", "max_num", "avg_len").foreach { f =>
        assert(a.isNullAt(a.fieldIndex(f)) == e.isNullAt(e.fieldIndex(f)))
        if (!a.isNullAt(a.fieldIndex(f)))
          assert(a.getAs[Double](f) == e.getAs[Double](f), s"$c.$f")
      }
      // HLL++ at rsd=0.015: allow 5% (loose bound; seeds are deterministic)
      val eD = e.getAs[Long]("n_distinct").toDouble
      val aD = a.getAs[Long]("n_distinct").toDouble
      assert(math.abs(aD - eD) / eD <= 0.05, s"$c distinct: exact=$eD approx=$aD")
    }
  }

  test("columnProfileApprox plans WITHOUT the Expand row multiplier") {
    val exactPlan = Profiling.columnProfile(d, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    val approxPlan = Profiling.columnProfileApprox(d, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    // the exact multi-countDistinct plans via Expand (k-way row blowup
    // before the shuffle — the documented audit-tier cost); the HLL form
    // must not
    assert(exactPlan.contains("Expand"), s"exact profiler plan changed:\n$exactPlan")
    assert(!approxPlan.contains("Expand"),
      s"approx profiler must fold sketches without Expand:\n$approxPlan")
  }

  test("joinSkewProfile: exact extremes, nearest-rank picks, shard balance") {
    // key counts: k1 x 8, k2 x 4, k3..k6 x 1 -> 6 keys, 16 rows
    val rows = (Seq.fill(8)(1L) ++ Seq.fill(4)(2L) ++ Seq(3L, 4L, 5L, 6L))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
    val df = rows.toDF("event_id", "user_id")
    val r = Profiling.joinSkewProfile(df, "user_id").collect().head
    assert(r.getAs[Long]("n_rows") == 16L && r.getAs[Long]("n_keys") == 6L)
    assert(r.getAs[Long]("max_key_rows") == 8L)
    // sorted counts (1,1,1,1,4,8): p50 = ceil(0.5*6)=3rd = 1; p99 = 6th = 8
    assert(r.getAs[Long]("p50_key_rows") == 1L)
    assert(r.getAs[Long]("p99_key_rows") == 8L)
    assert(r.getAs[Double]("top1_share") == 0.5)
    // shard stats exist and bound each other
    assert(r.getAs[Long]("max_shard") >= r.getAs[Long]("min_shard"))
    assert(r.getAs[Double]("shard_skew") >= 1.0)
  }

  test("neymanAllocation: zero-variance strata get zero, allocation sums to budget") {
    // stratum a: constant values (S=0) -> no allocation; b and c split by N*S
    val df = (Seq.fill(10)(("a", 100L)) ++
      Seq.tabulate(10)(i => ("b", (i * 10).toLong)) ++
      Seq.tabulate(20)(i => ("c", (i * 10).toLong)))
      .toDF("source", "n_chars")
    val r = Curation.neymanAllocation(df, "source", "n_chars", budget = 10L)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getAs[Long]("w_u") == 0L && r("a").getAs[Long]("alloc") == 0L)
    assert(r("b").getAs[Long]("alloc") + r("c").getAs[Long]("alloc") == 10L)
    // c has both more rows and a larger spread: it must get more
    assert(r("c").getAs[Long]("alloc") > r("b").getAs[Long]("alloc"))
    // rerun bit-identical
    val r2 = Curation.neymanAllocation(df, "source", "n_chars", budget = 10L)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("alloc")).toMap
    assert(r.keySet.forall(k => r(k).getAs[Long]("alloc") == r2(k)))
  }

  test("neymanSample keeps exactly alloc_h rows per stratum, deterministically") {
    val df = (Seq.tabulate(30)(i => ("b", i.toLong * 10, i.toLong)) ++
      Seq.tabulate(60)(i => ("c", i.toLong * 10, 100L + i)))
      .toDF("source", "n_chars", "doc_id")
    val alloc = Curation.neymanAllocation(df, "source", "n_chars", budget = 9L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    val sample = Curation.neymanSample(df, "source", "n_chars", "doc_id", budget = 9L)
    val bySource = sample.collect().groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySource.map { case (k, v) => k -> v.toLong } == alloc.filter(_._2 > 0))
    assert(sample.count() == 9L)
    val again = Curation.neymanSample(df, "source", "n_chars", "doc_id", budget = 9L)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(again == sample.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("referentialAudit counts orphan rows and distinct orphan keys; null keys are orphans") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), Some(9L), Some(8L), None)
      .toDF("fk")
    val r = Profiling.referentialAudit(child, parent, "fk", "pk", "c->p")
      .collect().head
    assert(r.getString(0) == "c->p")
    assert(r.getAs[Long]("n_child") == 6L)
    assert(r.getAs[Long]("n_orphan_rows") == 4L, "9, 9, 8 and the NULL key")
    assert(r.getAs[Long]("n_orphan_keys") == 2L, "countDistinct skips the NULL key")
  }

  test("contractCheck: a NULL verdict is a violation") {
    val df = Seq(Some(1L), Some(-1L), None).toDF("v")
    val r = Profiling.contractCheck(df, "v positive", col("v") > 0).collect().head
    assert(r.getAs[Long]("n_rows") == 3L && r.getAs[Long]("n_violations") == 2L)
  }

  test("completeness: planted hour gaps are counted per (type, day)") {
    // day 0: hours 0..23 all present; day 1: only hours 24, 25
    val rows = (0L until 24L).map(h => ("a", h * 3600000L)) ++
      Seq(("a", 24L * 3600000L), ("a", 25L * 3600000L + 1L))
    val df = rows.toDF("event_type", "ts_ms")
    val r = Profiling.completeness(df, "event_type", "ts_ms")
      .collect().map(x => x.getAs[Long]("day") ->
        (x.getAs[Long]("hours_present"), x.getAs[Long]("hours_missing"),
          x.getAs[Long]("is_complete"))).toMap
    assert(r(0L) == (24L, 0L, 1L))
    assert(r(1L) == (2L, 22L, 0L))
  }

  test("completenessStream one-batch run equals batch completeness minus open days") {
    // type a: full day 0 then two hours of day 1 (open); type b: one hour day 0 (open)
    val rows = (0L until 24L).map(h => ("a", h * 3600000L)) ++
      Seq(("a", 24L * 3600000L), ("a", 25L * 3600000L), ("b", 5L * 3600000L))
    val df = rows.toDF("event_type", "ts_ms")
    val streamed = Profiling.completenessStream(df, "event_type", "ts_ms")
      .collect().map(_.toSeq).toSet
    // batch, minus each type's LAST (still-open) day
    val batch = Profiling.completeness(df, "event_type", "ts_ms")
    val lastDay = batch.groupBy("event_type").agg(max("day").as("day"))
    val expected = batch.join(lastDay, Seq("event_type", "day"), "left_anti")
      .select("event_type", "day", "n_events", "hours_present", "hours_missing", "is_complete")
      .collect().map(_.toSeq).toSet
    assert(streamed == expected)
    assert(streamed.size == 1, "only type a's day 0 closed")
    assert(streamed.head(5) == 1L, "day 0 is complete")
  }

  test("heavyKeysStream: one-batch run == batch keys at/over the threshold") {
    // key 1: 5 rows, key 2: 3 rows, key 3: 1 row; threshold 3
    val df = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("user_id")
    val got = Profiling.heavyKeysStream(df, "user_id", threshold = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.keySet == Set("1", "2"))
    // n_at_cross is the running count when the batch folded (whole batch here)
    assert(got("1") == 5L && got("2") == 3L)
  }

  test("heavyKeysStream: string and NULL keys get their own state slots") {
    // the batch twin joinSkewProfile groups raw columns of any type — the
    // stream twin must not be numeric-only, and a null key must count, not NPE
    val df = (Seq.fill(3)(Option("alpha")) ++ Seq.fill(2)(Option.empty[String]) ++
      Seq(Option("beta"))).toDF("user_id")
    val got = Profiling.heavyKeysStream(df, "user_id", threshold = 2L)
      .collect().map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0), r.getLong(1))).toMap
    assert(got == Map("alpha" -> 3L, "<null>" -> 2L))
  }

  test("heavyKeysStream crosses exactly once across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val seen = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val q = Profiling.heavyKeysStream(input.toDS().toDF("user_id"), "user_id", 4L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val f = b.collect().map(r => (r.getString(0), r.getLong(1)))
        seen.synchronized { seen ++= f }
        ()
      }.start()
    input.addData(1L, 1L, 1L)        // below threshold: silent
    q.processAllAvailable()
    assert(seen.isEmpty)
    input.addData(1L, 1L, 2L)        // key 1 crosses at 5
    q.processAllAvailable()
    input.addData(1L, 1L)            // already heavy: no re-emit
    q.processAllAvailable()
    q.stop()
    assert(seen.toSeq == Seq(("1", 5L)))
  }

  test("benford2: second digit picked, sub-two-digit rows excluded, expectations sum to 1") {
    // values scale to n6 = 1234567 (d2=2), 9 (excluded: one digit), 105000000 (d2=0)
    val df = Seq(1.234567, 0.000009, 105.0).map(Tuple1(_)).toDF("value")
    val r = Profiling.benford2(df, "value")
      .collect().map(x => x.getAs[Long]("digit") -> x.getAs[Long]("n_obs")).toMap
    assert(r == Map(2L -> 1L, 0L -> 1L))
    assert(math.abs(Profiling.benford2Expected.map(_._2).sum - 1.0) < 1e-12)
  }
}
