package graft.planner

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Catalog endpoints: suggest/lookup/aggregators over a meta frame. */
class TimelyApiSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private lazy val meta = Seq(
    ("sys.cpu.user", "host", "web01"), ("sys.cpu.user", "host", "web02"),
    ("sys.cpu.user", "rack", "r1"), ("sys.cpu.idle", "host", "web01"),
    ("net.bytes", "iface", "eth0")).toDF("metric", "tagk", "tagv")

  test("suggest: metrics substring, tagk/tagv scoping, limit") {
    assert(TimelyApi.suggest(meta, "metrics", "cpu").as[String].collect().toSeq ==
      Seq("sys.cpu.idle", "sys.cpu.user"))
    assert(TimelyApi.suggest(meta, "metrics", "cpu", max = 1).as[String].collect().toSeq ==
      Seq("sys.cpu.idle"))
    assert(TimelyApi.suggest(meta, "tagk", "sys.cpu.user").as[String].collect().toSeq ==
      Seq("host", "rack"))
    assert(TimelyApi.suggest(meta, "tagv", "host").as[String].collect().toSeq ==
      Seq("web01", "web02"))
    intercept[IllegalArgumentException](TimelyApi.suggest(meta, "bogus", "x"))
  }

  test("lookup: regex tag values for one metric + total count") {
    val (rows, total) = TimelyApi.lookup(meta, "sys.cpu.user", "web.*", limit = 1)
    assert(total == 2 && rows.count() == 1)
  }

  test("aggregators list matches the reference set") {
    assert(TimelyApi.Aggregators == Seq("avg", "dev", "max", "min", "sum", "count", "none"))
    assert(TimelyApi.aggregatorsJson == """["avg","dev","max","min","sum","count","none"]""")
  }
}
