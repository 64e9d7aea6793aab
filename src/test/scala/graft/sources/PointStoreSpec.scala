package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.model.MetricPoint

/** Partitioned store round trip, pruning layout, and age-off maintenance. */
class PointStoreSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val Day = 86400000L
  private val T = 1704067200000L

  test("write/read round trip with partition pruning layout") {
    val dir = Files.createTempDirectory("graft-ps").toString + "/data"
    val pts = Seq(
      MetricPoint("sys.cpu.user", T, 1.0, Map("host" -> "a"), None),
      MetricPoint("sys.cpu.idle", T + 3600000L, 2.0, Map("host" -> "b"), None))
    PointStore.write(pts.toDF(), dir)
    val back = PointStore.read(spark, dir)
    assert(back.count() == 2)
    // metric partition dirs exist -> `metric = x` prunes at the source
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("metric="))
    assert(dirs.toSet == Set("metric=sys.cpu.user", "metric=sys.cpu.idle"))
  }

  test("partition-drop age-off deletes expired day dirs AND boundary-day hr dirs") {
    val dir = Files.createTempDirectory("graft-dropage").toString + "/data"
    val now = T + 10 * Day + 90 * 60000L // 1.5h into day 10
    val pts = Seq(
      MetricPoint("sys.a", T, 1.0, Map("h" -> "a"), None),             // day 0: whole day expired -> dir dropped
      MetricPoint("sys.a", T + 7 * Day, 2.0, Map("h" -> "a"), None),   // horizon day, hr=0 wholly expired -> hr dir dropped
      MetricPoint("sys.a", T + 7 * Day + 3600000L, 2.5, Map("h" -> "a"), None), // horizon HOUR: kept (slack < 1h)
      MetricPoint("sys.a", now - Day, 3.0, Map("h" -> "a"), None),     // live
      MetricPoint("other", T, 4.0, Map("h" -> "a"), None))             // 30d default: live
    PointStore.write(pts.toDF(), dir)
    val dropped = PointStore.ageOffDropPartitions(spark, dir,
      Map("default" -> 30 * Day, "sys" -> 3 * Day), now)
    // sys.a horizon = now - 3d = day 7 (2024-01-08) at 01:30: strictly older
    // day dirs AND the boundary day's wholly-expired hr=0 are deleted; only
    // the horizon hour itself retains expired rows for the clamp to hide
    assert(dropped == Seq("sys.a/2024-01-01", "sys.a/2024-01-08/hr=0"))
    val left = PointStore.read(spark, dir).select("metric", "value")
      .as[(String, Double)].collect().toSet
    assert(left == Set(("sys.a", 2.5), ("sys.a", 3.0), ("other", 4.0)))
    // pairing with the query-time clamp: rows past the horizon stay invisible
    val clamped = PointStore.clampStart(T, now, 3 * Day)
    assert(clamped == now - 3 * Day)
    assert(clamped > T + 7 * Day + 3600000L, "the surviving expired row is clamp-hidden")
  }

  test("age-off drops per-metric-prefix expired data, longest prefix wins") {
    val base = Files.createTempDirectory("graft-ageoff").toString
    val now = T + 10 * Day
    val pts = Seq(
      MetricPoint("keep.long", now - 5 * Day, 1.0, Map("h" -> "a"), None),   // ttl 7d -> kept
      MetricPoint("keep.long", now - 9 * Day, 1.0, Map("h" -> "a"), None),   // ttl 7d -> dropped
      MetricPoint("other.m", now - 2 * Day, 1.0, Map("h" -> "a"), None),     // default 3d -> kept
      MetricPoint("other.m", now - 4 * Day, 1.0, Map("h" -> "a"), None))     // default 3d -> dropped
    PointStore.write(pts.toDF(), s"$base/data")
    PointStore.ageOff(spark, s"$base/data", s"$base/out",
      Map("default" -> 3 * Day, "keep." -> 7 * Day), now)
    val kept = PointStore.read(spark, s"$base/out")
      .select("metric", "ts").as[(String, Long)].collect().toSet
    assert(kept == Set(("keep.long", now - 5 * Day), ("other.m", now - 2 * Day)))
  }

  test("metric equality prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-prune").toString + "/data"
    val pts = Seq(
      MetricPoint("sys.cpu.user", T, 1.0, Map("h" -> "a"), None),
      MetricPoint("sys.cpu.idle", T, 2.0, Map("h" -> "a"), None))
    PointStore.write(pts.toDF(), dir)
    val q = PointStore.read(spark, dir).where($"metric" === "sys.cpu.user")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the metric predicate must land in PartitionFilters (directory pruning),
    // not in the data filters
    assert(scan.partitionFilters.exists(_.toString.contains("metric")))
    assert(q.count() == 1)
  }

  test("meta age-off removes catalog rows for fully-aged metrics") {
    val base = Files.createTempDirectory("graft-metaageoff").toString
    val now = T + 10 * Day
    val pts = Seq(
      MetricPoint("live.m", now - 1 * Day, 1.0, Map("host" -> "a"), None),
      MetricPoint("dead.m", now - 9 * Day, 1.0, Map("host" -> "b", "rack" -> "r1"), None))
    PointStore.write(pts.toDF(), s"$base/data")
    PointStore.writeMeta(pts.toDF(), s"$base/meta")
    PointStore.ageOff(spark, s"$base/data", s"$base/aged",
      Map("default" -> 3 * Day), now)
    PointStore.metaAgeOff(spark, s"$base/meta", s"$base/aged", s"$base/metaOut")
    // dead.m has no surviving points -> all of its meta rows (both tags) drop;
    // suggest over the aged catalog no longer offers it
    val before = spark.read.parquet(s"$base/meta").select("metric").distinct()
      .as[String].collect().toSet
    assert(before == Set("live.m", "dead.m"))
    val after = spark.read.parquet(s"$base/metaOut")
      .select("metric", "tagk", "tagv").as[(String, String, String)].collect().toSet
    assert(after == Set(("live.m", "host", "a")))
  }

  test("age-off horizon is a codegen'd when-chain, longest prefix first") {
    val h = PointStore.horizonExpr(
      Map("default" -> 100L, "a" -> 200L, "ab" -> 300L), nowMs = 1000L)
    val got = Seq("abc", "ax", "zzz").toDF("metric").select(h.as("hz"))
      .as[Long].collect().toSeq
    assert(got == Seq(700L, 800L, 900L)) // ab beats a; default for zzz
    // no ScalaUDF anywhere in the expression tree
    val e = org.apache.spark.sql.GraftSqlBridge.expression(h)
    assert(e.find(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]).isEmpty)
  }

  test("query-time retention clamp") {
    assert(PointStore.clampStart(0L, 1000000L, 10000L) == 990000L)
    assert(PointStore.clampStart(995000L, 1000000L, 10000L) == 995000L)
  }

  test("census: per (metric, dt) hour partitions, rows, gaps, files") {
    val dir = Files.createTempDirectory("graft-census").toString + "/data"
    // metric m: hours 0, 1 and 3 on one day (gap at hour 2), 2 rows in hr 0
    val pts = Seq(
      MetricPoint("m", T, 1.0, Map("host" -> "a"), None),
      MetricPoint("m", T + 1000L, 2.0, Map("host" -> "b"), None),
      MetricPoint("m", T + 3600000L, 3.0, Map("host" -> "a"), None),
      MetricPoint("m", T + 3 * 3600000L, 4.0, Map("host" -> "a"), None),
      MetricPoint("other", T + Day, 5.0, Map("host" -> "a"), None))
    PointStore.write(pts.toDF(), dir)
    val c = PointStore.census(spark, dir)
      .collect().map(r => (r.getAs[String]("metric"), r.getAs[Any]("dt").toString) -> r).toMap
    assert(c.size == 2)
    val m = c.collectFirst { case ((met, _), r) if met == "m" => r }.get
    assert(m.getAs[Long]("n_hr_partitions") == 3L)
    assert(m.getAs[Long]("n_rows") == 4L)
    assert(m.getAs[Long]("hr_min") == 0L && m.getAs[Long]("hr_max") == 3L)
    assert(m.getAs[Long]("hr_gaps") == 1L, "hour 2 is missing")
    assert(m.getAs[Long]("n_files") >= 3L)
    val o = c.collectFirst { case ((met, _), r) if met == "other" => r }.get
    assert(o.getAs[Long]("n_rows") == 1L && o.getAs[Long]("hr_gaps") == 0L)
  }
}
