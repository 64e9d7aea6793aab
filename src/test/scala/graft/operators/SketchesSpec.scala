package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * The sketch family's contracts: exact-below-k KMV, HLL register
 * mergeability (the property that makes the state shardable across a
 * 100 TB corpus), CMS's one-sided error, and parallelism invariance of
 * every estimate (the determinism the DuckDB gates pin end-to-end).
 */
class SketchesSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def keyed(n: Int) =
    (1 to n).map(i => ("k", i.toLong)).toDF("key", "elem")

  test("KMV below k is exact; estimator branch lands near truth") {
    val small = Sketches.kmvDistinct(keyed(40), "key", "elem", k = 64).collect()(0)
    assert(small.getAs[Long]("n_held") == 40L)
    assert(small.getAs[Double]("est_distinct") == 40.0)
    assert(small.getAs[Long]("exact_distinct") == 40L)

    val big = Sketches.kmvDistinct(keyed(5000), "key", "elem", k = 64).collect()(0)
    assert(big.getAs[Long]("n_held") == 64L)
    val est = big.getAs[Double]("est_distinct")
    // k=64 -> ~12.5% relative error; 3 sigma bounds
    assert(est > 3000 && est < 8000, s"KMV estimate $est implausible for 5000")
  }

  test("KMV is parallelism-invariant (1 vs 13 partitions)") {
    val d = keyed(3000)
    val a = Sketches.kmvDistinct(d.repartition(1), "key", "elem", k = 32).collect()(0)
    val b = Sketches.kmvDistinct(d.repartition(13), "key", "elem", k = 32).collect()(0)
    assert(a.getAs[Double]("est_distinct") == b.getAs[Double]("est_distinct"))
    assert(a.getAs[Long]("kth_h") == b.getAs[Long]("kth_h"))
  }

  test("HLL registers merge by max: union state == max of shard states") {
    val d1 = keyed(900)
    val d2 = (600 to 1500).map(i => ("k", i.toLong)).toDF("key", "elem")
    val merged = Sketches.hllRegisters(d1.union(d2), "key", "elem")
    val shardMax = Sketches.hllRegisters(d1, "key", "elem")
      .union(Sketches.hllRegisters(d2, "key", "elem"))
      .groupBy("key", "bucket").agg(max("m_reg").as("m_reg"))
    assert(merged.except(shardMax).count() == 0 &&
      shardMax.except(merged).count() == 0)
  }

  test("HLL raw estimate lands near truth in the raw regime") {
    val r = Sketches.hllDistinct(keyed(5000), "key", "elem").collect()(0)
    assert(r.getAs[Long]("n_buckets") <= 256L)
    val est = r.getAs[Double]("est_distinct")
    // m=256 -> ~6.5% relative error; generous 4-sigma bounds
    assert(est > 3500 && est < 6500, s"HLL estimate $est implausible for 5000")
    assert(r.getAs[Long]("exact_distinct") == 5000L)
  }

  test("CMS never under-counts, and is exact without collisions") {
    val skewed = (1 to 500).flatMap(i =>
      Seq.fill(if (i <= 3) 50 else 1)(("k", i.toLong))).toDF("key", "elem")
    val r = Sketches.cmsTopK(skewed, "elem", depth = 4, width = 1024,
      nCandidates = 10).collect()
    assert(r.length == 10)
    r.foreach(row => assert(row.getAs[Long]("cms_n") >= row.getAs[Long]("exact_n")))
    // heads are unambiguous: exact 50s rank first
    assert(r.count(_.getAs[Long]("exact_n") == 50L) == 3)

    // 3 elements in a wide table: no collisions possible to matter
    val tiny = Seq(("k", 1L), ("k", 1L), ("k", 2L), ("k", 3L)).toDF("key", "elem")
    Sketches.cmsTopK(tiny, "elem", depth = 4, width = 1048576, nCandidates = 3)
      .collect().foreach(row =>
        assert(row.getAs[Long]("cms_n") == row.getAs[Long]("exact_n")))
  }

  test("CMS counters merge by sum across corpus shards") {
    val d1 = keyed(300)
    val d2 = keyed(200)
    val merged = Sketches.cmsCounters(d1.union(d2), "elem", 4, 256)
    val summed = Sketches.cmsCounters(d1, "elem", 4, 256)
      .union(Sketches.cmsCounters(d2, "elem", 4, 256))
      .groupBy("salt", "bucket").agg(sum("c").as("c"))
    assert(merged.except(summed).count() == 0 &&
      summed.except(merged).count() == 0)
  }

  test("kmvSetOps: not-full sketches give exact union/differences; disjoint and identical sets") {
    // disjoint: A = 1..40, B = 101..130 — below k, theta = 2^60, estimates exact
    val d = ((1 to 40).map(i => ("a", i.toLong)) ++
      (101 to 130).map(i => ("b", i.toLong))).toDF("key", "elem")
    val r = Sketches.kmvSetOps(d, "key", "elem", k = 64).collect()(0)
    assert(r.getAs[String]("key_a") == "a" && r.getAs[String]("key_b") == "b")
    assert(r.getAs[Long]("n_common") == 0L)
    assert(r.getAs[Double]("est_union") == 70.0 && r.getAs[Long]("exact_union") == 70L)
    assert(r.getAs[Double]("est_diff_a") == 40.0 && r.getAs[Long]("exact_diff_a") == 40L)
    assert(r.getAs[Double]("est_diff_b") == 30.0 && r.getAs[Long]("exact_diff_b") == 30L)

    // identical sets: union = either, both differences empty
    val same = ((1 to 25).map(i => ("x", i.toLong)) ++
      (1 to 25).map(i => ("y", i.toLong))).toDF("key", "elem")
    val s = Sketches.kmvSetOps(same, "key", "elem", k = 64).collect()(0)
    assert(s.getAs[Double]("est_union") == 25.0 && s.getAs[Long]("exact_union") == 25L)
    assert(s.getAs[Double]("est_diff_a") == 0.0 && s.getAs[Long]("exact_diff_a") == 0L)
    assert(s.getAs[Double]("est_diff_b") == 0.0 && s.getAs[Long]("exact_diff_b") == 0L)
  }

  test("kmvSetOps estimates are parallelism-invariant and consistent with kmvIntersect") {
    val d = ((1 to 3000).map(i => ("a", i.toLong)) ++
      (2001 to 5000).map(i => ("b", i.toLong))).toDF("key", "elem")
    val r1 = Sketches.kmvSetOps(d.repartition(1), "key", "elem", k = 32).collect()(0)
    val r13 = Sketches.kmvSetOps(d.repartition(13), "key", "elem", k = 32).collect()(0)
    assert(r1.getAs[Double]("est_union") == r13.getAs[Double]("est_union"))
    assert(r1.getAs[Double]("est_diff_a") == r13.getAs[Double]("est_diff_a"))
    // inclusion-exclusion ties the family together on the same sketches:
    // est_union = est(n_a) + est(n_b) - est_overlap (all share theta)
    val ov = Sketches.kmvIntersect(d, "key", "elem", k = 32).collect()(0)
    assert(r1.getAs[Long]("theta") == ov.getAs[Long]("theta"))
    assert(r1.getAs[Long]("n_common") == ov.getAs[Long]("n_common"))
    assert(r1.getAs[Long]("exact_union") == 5000L &&
      r1.getAs[Long]("exact_diff_a") == 2000L)
  }

  test("hllStream one-batch run reproduces the batch estimator bit-for-bit") {
    val d = keyed(1200).union(
      (1 to 300).map(i => ("k2", i.toLong)).toDF("key", "elem"))
    val batch = Sketches.hllDistinct(d, "key", "elem")
      .select("key", "n_buckets", "est_distinct").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val stream = Sketches.hllStream(d, "key", "elem").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(stream == batch)
  }

  test("qdigestStream one-batch run reproduces the batch sketch bit-for-bit") {
    // fractional values exercise the HALF_UP decimal scaling path too
    val d = ((1 to 100).map(i => ("k", i.toDouble)) ++
      (1 to 40).map(i => ("k2", i * 0.33335))).toDF("key", "value")
    def cols(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n_points"), r.getAs[Long]("n_buckets"),
        r.getAs[Double]("p50_est"), r.getAs[Double]("p95_est"),
        r.getAs[Double]("p99_est"))
    val batch = Sketches.qdigestQuantiles(d, "key", "value").collect()
      .map(r => r.getAs[String]("key") -> cols(r)).toMap
    val stream = Sketches.qdigestStream(d, "key", "value").collect()
      .map(r => r.getAs[String]("key") -> cols(r)).toMap
    assert(stream == batch)
    // the merge IS the update: feeding halves through state equals the whole
    assert(batch("k")._1 == 100L)
  }

  test("sketches drop NULL elements and survive empty frames") {
    val withNull = Seq(("k", Some(1L)), ("k", None), ("k", Some(2L)))
      .toDF("key", "elem")
    val kmv = Sketches.kmvDistinct(withNull, "key", "elem", k = 8).collect()(0)
    assert(kmv.getAs[Long]("n_held") == 2L && kmv.getAs[Long]("exact_distinct") == 2L)
    val hll = Sketches.hllDistinct(withNull, "key", "elem").collect()(0)
    assert(hll.getAs[Long]("exact_distinct") == 2L)
    assert(Sketches.cmsTopK(withNull, "elem", 2, 64, 5).count() == 2)

    val empty = Seq.empty[(String, Long)].toDF("key", "elem")
    assert(Sketches.kmvDistinct(empty, "key", "elem", k = 8).count() == 0)
    assert(Sketches.hllDistinct(empty, "key", "elem").count() == 0)
    assert(Sketches.cmsTopK(empty, "elem", 2, 64, 5).count() == 0)
  }

  test("qdigest: hand-computed buckets over 1..100, one-sided <2x rank guarantee") {
    // sv = 10000*i -> power-of-2 buckets 14..20; cum at b19 = 52 >= 50
    val df = (1 to 100).map(i => ("k", i.toDouble)).toDF("key", "value")
    val r = Sketches.qdigestQuantiles(df, "key", "value").collect()(0)
    assert(r.getAs[Long]("n_points") == 100L)
    assert(r.getAs[Long]("n_buckets") == 7L)
    assert(r.getAs[Double]("p50_est") == 52.4287)  // (2^19 - 1) / 10000
    assert(r.getAs[Double]("p95_est") == 104.8575) // (2^20 - 1) / 10000
    assert(r.getAs[Long]("rank_le_p50") == 52L)
    assert(r.getAs[Long]("rank_le_p99") == 100L)
    // the q-digest contract: est covers the target rank, within one bucket
    // (value error < 2x the true quantile)
    assert(r.getAs[Long]("rank_le_p50") >= 50L)
    assert(r.getAs[Double]("p50_est") >= 50.0 && r.getAs[Double]("p50_est") < 100.0)
    assert(r.getAs[Double]("p95_est") >= 95.0 && r.getAs[Double]("p95_est") < 190.0)
  }

  test("qdigest: zero/constant values collapse to one bucket; keys independent") {
    val df = (Seq.fill(5)(("z", 0.0)) ++ Seq.fill(3)(("c", 7.0)))
      .toDF("key", "value")
    val out = Sketches.qdigestQuantiles(df, "key", "value")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(out("z").getAs[Long]("n_buckets") == 1L)
    assert(out("z").getAs[Double]("p99_est") == 0.0)   // bucket 0 -> ub 0
    assert(out("c").getAs[Long]("n_buckets") == 1L)
    // 7.0 -> sv 70000, 17 bits -> ub (2^17 - 1) / 10000 = 13.1071
    assert(out("c").getAs[Double]("p50_est") == 13.1071)
    assert(out("c").getAs[Long]("rank_le_p50") == 3L)
  }

  test("AMS F2: single-key stream is exact (every counter = ±n); audit columns exact") {
    import spark.implicits._
    // one distinct element, frequency 7: every counter is ±7, every square
    // 49 -> the median IS the exact F2
    val one = Seq.fill(7)("k").toDF("e")
    // F2 columns emit as DOUBLE (decimal internally; see amsF2 scaladoc)
    def dec(row: org.apache.spark.sql.Row, c: String): Long = {
      val d = row.getAs[Double](c)
      assert(d == math.rint(d), s"$c not integral: $d")
      d.toLong
    }
    val r1 = Sketches.amsF2(one, "e", r = 16).collect().head
    assert(r1.getAs[Long]("r") == 16L)
    assert(dec(r1, "est_f2") == 49L)
    assert(dec(r1, "exact_f2") == 49L && r1.getAs[Long]("n_rows") == 7L)
    // mixed stream: audit = sum f^2 = 9 + 4 + 1; estimate is key-set
    // dependent but nonnegative and parallelism-independent
    val df = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("c")).toDF("e")
    val r2 = Sketches.amsF2(df, "e", r = 16).collect().head
    assert(dec(r2, "exact_f2") == 14L && r2.getAs[Long]("n_rows") == 6L)
    assert(dec(r2, "est_f2") >= 0L)
    val again = Sketches.amsF2(df.repartition(7), "e", r = 16).collect().head
    assert(dec(again, "est_f2") == dec(r2, "est_f2"))
  }

  test("cmsStream one-batch run: min over salt lanes equals the batch CMS estimate") {
    import spark.implicits._
    val elems = (Seq.fill(9)("hot") ++ Seq.fill(4)("warm") ++ Seq("cold")).toDF("e")
    val probes = Seq("hot", "warm", "cold", "absent")
    val stream = Sketches.cmsStream(elems, "e", probes).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    // 4 lanes x 4 probes reported
    assert(stream.size == 16)
    val minOverLanes = probes.map(p =>
      p -> (0 until 4).map(s => stream((s, p))).min).toMap
    val batch = Sketches.cmsTopK(elems, "e", nCandidates = 10).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(minOverLanes("hot") == batch("hot"))
    assert(minOverLanes("warm") == batch("warm"))
    assert(minOverLanes("cold") == batch("cold"))
    // CMS never under-counts; an absent probe can only over-count
    assert(minOverLanes("absent") >= 0L)
    assert(minOverLanes("hot") >= 9L)
  }

  test("kmvIntersect: not-full sketches are exact; disjoint pairs read zero") {
    import spark.implicits._
    // A = {1..30}, B = {21..50} (overlap 10), C = {100..109} (disjoint):
    // all below k=64, so theta = 2^60 and the estimate IS the exact overlap
    val df = ((1L to 30L).map(e => ("A", e)) ++ (21L to 50L).map(e => ("B", e)) ++
      (100L to 109L).map(e => ("C", e))).toDF("key", "e")
    val out = Sketches.kmvIntersect(df, "key", "e", k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_common") == 10L)
    assert(ab.getAs[Long]("exact_overlap") == 10L)
    assert(ab.getAs[Double]("est_overlap") == 10.0, "not-full sketch is exact")
    assert(out(("A", "C")).getAs[Long]("n_common") == 0L)
    assert(out(("A", "C")).getAs[Double]("est_overlap") == 0.0)
    assert(out(("B", "C")).getAs[Long]("exact_overlap") == 0L)
  }
}
