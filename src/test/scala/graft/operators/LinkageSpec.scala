package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Blocked fuzzy linkage: hand-checked pairs, the block/length contracts,
  * the skew cap, singleton entities, and the no-cartesian plan guard. */
class LinkageSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("fuzzyPairs finds in-block distance-1 pairs only") {
    val d = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "abcd"))
      .toDF("id", "name")
    val p = Linkage.fuzzyPairs(d, "id", "name", blockLen = 2, maxDist = 1)
      .collect()
    assert(p.length == 1)
    assert(p(0).getAs[Long]("id_a") == 1L && p(0).getAs[Long]("id_b") == 2L)
    assert(p(0).getAs[Long]("dist") == 1L)
    // abcd shares the "ab" prefix but not the length: blocked apart (the
    // documented recall contract for length-changing edits)
  }

  test("maxBlock drops oversized blocks entirely") {
    val hub = (1 to 10).map(i => (i.toLong, s"aa$i")).toDF("id", "name")
    assert(Linkage.fuzzyPairs(hub, "id", "name", blockLen = 2, maxDist = 2,
      maxBlock = 5L).count() == 0)
  }

  test("NULL ids/names are excluded, empty input survives") {
    val d = Seq((Some(1L), Some("abc")), (Some(2L), None),
      (None, Some("abd")), (Some(4L), Some("abe"))).toDF("id", "name")
    val p = Linkage.fuzzyPairs(d, "id", "name", blockLen = 2, maxDist = 1).collect()
    assert(p.length == 1 && p(0).getAs[Long]("id_a") == 1L &&
      p(0).getAs[Long]("id_b") == 4L)
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    assert(Linkage.entities(empty, "id", "name").count() == 0)
  }

  test("entities: components get min-id labels, singletons keep their id") {
    val d = Seq((5L, "abc"), (2L, "abd"), (9L, "abe"), (7L, "zzz"))
      .toDF("id", "name")
    val e = Linkage.entities(d, "id", "name", blockLen = 2, maxDist = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("entity_id")).toMap
    assert(e == Map(5L -> 2L, 2L -> 2L, 9L -> 2L, 7L -> 7L))
  }

  test("the block self-join is an equi-join, never a cartesian product") {
    val d = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
    val plan = Linkage.fuzzyPairs(d, "id", "name", blockLen = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"fuzzyPairs must join on the block key:\n$plan")
  }
}
