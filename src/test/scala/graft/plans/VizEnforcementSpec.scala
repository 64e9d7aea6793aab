package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.MetricPoint

/**
 * The session-level visibility-injection rule: every scan of a viz-bearing
 * relation gets the viz_visible filter, it can't stack twice, and it is
 * driven by session confs (enforce flag + auth set).
 */
class VizEnforcementSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-viz").toString
    Seq(
      MetricPoint("m", 0L, 1.0, Map("h" -> "a"), Some("A")),
      MetricPoint("m", 1L, 2.0, Map("h" -> "a"), Some("A&B")),
      MetricPoint("m", 2L, 3.0, Map("h" -> "a"), None)
    ).toDF().write.parquet(s"$d/pts")
    s"$d/pts"
  }

  private def applyRule(auths: String, enforce: Boolean = true) = {
    spark.conf.set(VizEnforcement.EnforceConf, enforce.toString)
    spark.conf.set(VizEnforcement.AuthsConf, auths)
    try {
      val plan = spark.read.parquet(dir).queryExecution.analyzed
      new VizEnforcementRule().apply(plan)
    } finally {
      spark.conf.set(VizEnforcement.EnforceConf, "false")
    }
  }

  test("scan of a viz-bearing relation is wrapped and filters rows") {
    val wrapped = applyRule("A")
    assert(wrapped.collectFirst { case f: Filter => f }.isDefined)
    // A -> visible, A&B -> not (no B), null viz -> visible
    val rows = GraftSqlBridge.ofRows(spark, wrapped).select("value").as[Double].collect().sorted
    assert(rows.toSeq == Seq(1.0, 3.0))
  }

  test("rule is idempotent (no filter stacking on reanalysis)") {
    val once = applyRule("A")
    spark.conf.set(VizEnforcement.EnforceConf, "true")
    val twice = try new VizEnforcementRule().apply(once)
      finally spark.conf.set(VizEnforcement.EnforceConf, "false")
    val filters = twice.collect { case f: Filter => f }
    assert(filters.length == 1)
  }

  test("disabled by default; no auths means only unlabelled rows") {
    val plainPlan = spark.read.parquet(dir).queryExecution.analyzed
    spark.conf.set(VizEnforcement.EnforceConf, "false")
    assert(new VizEnforcementRule().apply(plainPlan).collect { case f: Filter => f }.isEmpty)
    val noAuths = applyRule("")
    val rows = GraftSqlBridge.ofRows(spark, noAuths).select("value").as[Double].collect().sorted
    assert(rows.toSeq == Seq(3.0)) // only the null-viz point
  }
}
