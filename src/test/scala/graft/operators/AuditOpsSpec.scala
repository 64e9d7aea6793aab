package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Session-5 audit/window operators: link prediction, sliding-window counts,
  * percentile downsample, cluster-size distribution, threshold sweep, dedup
  * savings. Hand-computed fixtures + degenerate inputs. */
class AuditOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // ---- Graph.linkPredict ----

  test("linkPredict: 4-cycle diagonals score jaccard 1.0 with 2 common neighbors") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")).toDF("src", "dst")
    val out = Graph.linkPredict(edges).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(5)))).toMap
    assert(out.keySet == Set(("A", "C"), ("B", "D")))
    assert(out(("A", "C")) == (2L, 1.0))
    assert(out(("B", "D")) == (2L, 1.0))
  }

  test("linkPredict: adjacent pairs are excluded (triangle yields no candidates)") {
    val edges = Seq(("A", "B"), ("B", "C"), ("A", "C")).toDF("src", "dst")
    assert(Graph.linkPredict(edges).isEmpty)
  }

  test("linkPredict: direction and multi-edges don't change the result") {
    val e1 = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "A")).toDF("src", "dst")
    val e2 = Seq(("B", "A"), ("B", "C"), ("C", "B"), ("C", "D"), ("A", "D")).toDF("src", "dst")
    val k1 = Graph.linkPredict(e1).collect().map(_.toSeq).toSet
    val k2 = Graph.linkPredict(e2).collect().map(_.toSeq).toSet
    assert(k1 == k2)
  }

  test("linkPredict: maxDeg drops hub CENTERS from wedge generation only") {
    // star: S-L0..L4; every leaf pair meets only through S
    val edges = (0 until 5).map(i => ("S", s"L$i")).toDF("src", "dst")
    assert(Graph.linkPredict(edges).count() == 10L) // C(5,2)
    // cap excludes S as a center; leaves have degree 1 and no shared wedge left
    assert(Graph.linkPredict(edges, maxDeg = 2L).isEmpty)
  }

  test("linkPredict: jaccard uses full degrees even when the center set is capped") {
    // path A-S-B plus A-X, so deg(A)=2: capping S out removes the (A,B) wedge
    val edges = Seq(("A", "S"), ("S", "B"), ("A", "X")).toDF("src", "dst")
    val full = Graph.linkPredict(edges).where(col("a") === "A" && col("b") === "B").collect()
    assert(full.length == 1 && full(0).getLong(2) == 1L)
    assert(full(0).getDouble(5) == 1.0 / (2 + 1 - 1)) // da=2, db=1
  }

  // ---- Sessionize.slidingCounts ----

  test("slidingCounts: each event lands in exactly window/slide windows") {
    val ev = Seq((1L, 10L, "a")).toDF("user_id", "ts_ms", "event_type")
    val out = Sessionize.slidingCounts(ev, "event_type", "ts_ms", "user_id").collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).sorted.toSeq ==
      Seq(-2700000L, -1800000L, -900000L, 0L))
    assert(out.forall(r => r.getLong(2) == 1L && r.getLong(3) == 1L))
  }

  test("slidingCounts: distinct users and negative-epoch floor boundaries") {
    // two events, same window set (both in [0, 900000)), one user repeated
    val ev = Seq((7L, 100L, "a"), (7L, 200L, "a"), (9L, 100L, "a"),
      (1L, -1L, "b")) // negative ts: boundary floors to -900000
      .toDF("user_id", "ts_ms", "event_type")
    val out = Sessionize.slidingCounts(ev, "event_type", "ts_ms", "user_id")
    val a0 = out.where(col("event_type") === "a" && col("window_start") === 0L).collect()
    assert(a0.length == 1 && a0(0).getLong(2) == 3L && a0(0).getLong(3) == 2L)
    val b = out.where(col("event_type") === "b").collect().map(_.getLong(1)).sorted
    assert(b.toSeq == Seq(-3600000L, -2700000L, -1800000L, -900000L))
  }

  test("slidingCounts: window must be a positive multiple of slide") {
    val ev = Seq((1L, 0L, "a")).toDF("user_id", "ts_ms", "event_type")
    intercept[IllegalArgumentException] {
      Sessionize.slidingCounts(ev, "event_type", "ts_ms", "user_id", 1000L, 300L)
    }
  }

  // ---- TimeSeries.downsamplePercentile ----

  private def pts(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      ("m", Map("user" -> "1"), i.toLong, v)
    }.toDF("metric", "tags", "ts", "value")

  test("downsamplePercentile: nearest-rank pick, p=1 max, small-n floor") {
    val d = pts((1 to 100).map(_.toDouble))
    def v(p: Double) =
      TimeSeries.downsamplePercentile(d, 3600000L, p).collect()(0).getDouble(3)
    assert(v(0.95) == 95.0) // ceil(0.95*100)=95
    assert(v(1.0) == 100.0)
    assert(v(0.001) == 1.0) // ceil rounds up to rank 1
    val one = pts(Seq(42.0))
    assert(TimeSeries.downsamplePercentile(one, 3600000L, 0.5).collect()(0).getDouble(3) == 42.0)
  }

  test("downsamplePercentile: buckets and series are independent") {
    val d = Seq(
      ("m", Map("user" -> "1"), 0L, 1.0),
      ("m", Map("user" -> "1"), 1L, 9.0),
      ("m", Map("user" -> "1"), 3600000L, 5.0),
      ("m", Map("user" -> "2"), 0L, 7.0)).toDF("metric", "tags", "ts", "value")
    val out = TimeSeries.downsamplePercentile(d, 3600000L, 0.95).collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(out == Map(("user=1", 0L) -> 9.0, ("user=1", 3600000L) -> 5.0,
      ("user=2", 0L) -> 7.0))
    intercept[IllegalArgumentException] {
      TimeSeries.downsamplePercentile(d, 3600000L, 0.0)
    }
  }

  // ---- Dedup.clusterSizes / thresholdSweep ----

  private val dupDocs = Seq(
    (1L, "the quick brown fox jumps over dogs"),
    (2L, "the quick brown fox jumps over dogs"), // dup of 1
    (3L, "completely different text about spark clusters here"),
    (4L, "unrelated singleton words nothing shared at all"),
    (5L, "another lonely document with unique content entirely")
  ).toDF("doc_id", "text")

  test("clusterSizes: histogram includes singletons and fractions partition 1") {
    val out = Dedup.clusterSizes(dupDocs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(2L) == ((1L, 2L, 0.4))) // docs 1+2
    assert(out(1L) == ((3L, 3L, 0.6))) // docs 3,4,5
    assert(out.values.map(_._2).sum == 5L)
  }

  test("clusterSizes: fully-unique corpus is all singletons") {
    val solo = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = Dedup.clusterSizes(solo).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
  }

  test("thresholdSweep: cumulative counts are monotone non-increasing, zeros kept") {
    val out = Dedup.thresholdSweep(dupDocs).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).sortBy(_._1)
    assert(out.length == 10)
    // identical pair scores jaccard 1.0 -> present at every threshold
    assert(out.forall(_._2 == 1L))
    val mixed = dupDocs.union(Seq(
      (6L, "the quick brown fox jumps over cats")).toDF("doc_id", "text")) // near-dup of 1/2
    val m = Dedup.thresholdSweep(mixed).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).sortBy(_._1)
    assert(m.zip(m.tail).forall { case ((_, a), (_, b)) => a >= b })
    assert(m.head._2 > m.last._2) // the near-dup pair drops out at high t
  }

  test("thresholdSweep: thresholds must be ascending and distinct") {
    intercept[IllegalArgumentException] {
      Dedup.thresholdSweep(dupDocs, thresholds = Seq(0.9, 0.5))
    }
    intercept[IllegalArgumentException] {
      Dedup.thresholdSweep(dupDocs, thresholds = Seq.empty)
    }
  }

  // ---- Curation.dedupSavings ----

  test("dedupSavings: mirror source saves 100% under both exact and near dedup") {
    val base = Seq(
      (1L, "the quick brown fox jumps over dogs", "web"),
      (2L, "completely different text about spark clusters", "web"),
      (11L, "the quick brown fox jumps over dogs", "mirror"), // byte-dup of 1
      (12L, "completely different text about spark clusters", "mirror")
    ).toDF("doc_id", "text", "source")
    val out = Curation.dedupSavings(base).collect()
      .map(r => r.getString(0) -> r).toMap
    val web = out("web"); val mir = out("mirror")
    // web keeps everything (min doc_ids), mirror loses everything
    assert(web.getLong(3) == 2L && web.getDouble(7) == 0.0)
    assert(mir.getLong(3) == 0L && mir.getDouble(7) == 1.0)
    assert(mir.getLong(5) == 0L && mir.getDouble(8) == 1.0)
    // token totals are the whitespace counts
    assert(web.getLong(2) == 7L + 6L)
  }

  test("dedupSavings: NULL text hashes as one group, savings stay defined") {
    val d = Seq((1L, null: String, "s"), (2L, null: String, "s"))
      .toDF("doc_id", "text", "source")
    val r = Curation.dedupSavings(d).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(3) == 1L) // one exact survivor
    // NULL -> "" -> one whitespace token each
    assert(r.getLong(2) == 2L && r.getDouble(7) == 0.5)
  }

  // ---- plan-shape guards ----

  private def executedString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def windowExecs(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }

  test("plan: linkPredict's wedge join is equi-keyed — no nested-loop product anywhere") {
    val edges = (0L until 600L)
      .map(i => (s"d${i % 23}", s"d${(i * 7 + 3) % 19}")).toDF("src", "dst")
    val s = executedString(Graph.linkPredict(edges, maxDeg = 8L))
    assert(!s.contains("CartesianProduct"), "corpus-sized cartesian in linkPredict")
    assert(!s.contains("BroadcastNestedLoopJoin"), "non-equi join in linkPredict")
  }

  test("plan: slidingCounts and downsamplePercentile run without window functions") {
    val ev = Seq((1L, 10L, "a")).toDF("user_id", "ts_ms", "event_type")
    assert(windowExecs(Sessionize.slidingCounts(ev, "event_type", "ts_ms", "user_id")).isEmpty,
      "slidingCounts must be explode + aggregate, not a window sweep")
    val d = pts(Seq(1.0, 2.0))
    assert(windowExecs(TimeSeries.downsamplePercentile(d, 3600000L, 0.5)).isEmpty,
      "percentile downsample must be a bounded per-group pick, not a corpus window")
  }

  test("plan: thresholdSweep's non-equi probe join joins only AGGREGATED (bounded) inputs") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LocalRelation}
    val plan = Dedup.thresholdSweep(dupDocs).queryExecution.optimizedPlan
    val nonEqui = plan.collect {
      case j: Join if j.condition.exists(c =>
        c.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual]).isDefined) => j
    }
    assert(nonEqui.nonEmpty, "sanity: the cumulative >= probe join exists")
    for (j <- nonEqui; side <- Seq(j.left, j.right))
      assert(side.collectFirst { case a: Aggregate => a }.isDefined ||
        side.collectFirst { case l: LocalRelation => l }.isDefined,
        s"non-equi join over a non-aggregated (corpus-sized) side:\n$j")
  }

  test("plan: clusterSizes/dedupSavings attach only 1-row aggregates via cross joins") {
    for (df <- Seq(Dedup.clusterSizes(dupDocs),
      Curation.dedupSavings(dupDocs.withColumn("source", lit("s"))))) {
      val s = executedString(df)
      assert(!s.contains("CartesianProduct"), "corpus-sized cartesian product")
    }
  }
}
