package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Plan-shape guards for the round-2 scale paths: the distributed percentile
 * sort must be a PARTITIONED window (an unpartitioned WindowExec funnels the
 * whole dataset through one task — the anti-pattern the IVF centroid pick
 * had in round 1), and the cross-series fold must really be two aggregation
 * levels with the shard key in the inner one.
 */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def windows(df: org.apache.spark.sql.DataFrame): Seq[WindowExec] = {
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    unwrapped.collect { case w: WindowExec => w }
  }

  private def pts = (0L until 64L)
    .map(i => (s"m${i % 4}", i * 1000L, (i % 7).toDouble, Map("host" -> s"h$i")))
    .toDF("metric", "ts", "value", "tags")

  test("summarize's rank window is partitioned by (metric, window)") {
    val ws = windows(Summarization.summarize(pts, 60000L))
    assert(ws.nonEmpty, "expected a WindowExec for the percentile rank")
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "unpartitioned window in summarize: whole dataset on one task")
  }

  test("crossSeries sum/avg/dev plan two aggregation levels, sharded inner") {
    for (agg <- Seq("sum", "avg", "dev")) {
      val df = TimeSeries.crossSeries(
        TimeSeries.downsample(pts, 60000L, "avg", exact = true), agg)
      // three aggregation levels: downsample, per-shard fold, cross-shard fold
      val aggs = df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }
      assert(aggs.length >= 3, s"$agg: expected two fold levels above downsample, got ${aggs.length}")
      // the md5 shard is computed below the fold (the optimizer pre-projects
      // it, so the grouping key is an attribute ref) — assert it's in the plan
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("pmod"),
        s"$agg: no md5 series shard in the plan")
      // and no window function sneaks into the fold path
      assert(windows(df).isEmpty, s"$agg: unexpected WindowExec in crossSeries plan")
    }
  }
}
