package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.MetricPoint

/** Bucketed layout removes the aggregation shuffle on the bucket key. */
class BucketedStoreSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("groupBy(metric) on a bucketed table plans without a shuffle exchange") {
    val pts = (0 until 100).map { i =>
      MetricPoint(s"m${i % 4}", 1704067200000L + i * 1000L, i.toDouble, Map("h" -> "a"), None)
    }
    PointStore.writeBucketed(pts.toDF(), "bucketed_points", buckets = 8)
    try {
      val agg = spark.table("bucketed_points").groupBy("metric").count()
      val shuffles = agg.queryExecution.executedPlan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"expected no shuffle, got: ${agg.queryExecution.executedPlan}")
      assert(agg.count() == 4)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bucketed_points")
    }
  }
}
