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

  test("blockingQuality: exact candidate/total accounting and precision") {
    import spark.implicits._
    // block 'aa' has 3 names (3 pairs, 2 verify at dist<=1); 'bb' has 1
    val df = Seq((1L, "aaX"), (2L, "aaY"), (3L, "aaZZ"), (4L, "bbQ"))
      .toDF("id", "name")
    val r = Linkage.blockingQuality(df, "id", "name", blockLen = 2, maxDist = 1,
      maxBlock = 100L).collect().head
    assert(r.getAs[Long]("n_records") == 4L)
    // blocks are (prefix, LENGTH): (aa,3)x2, (aa,4)x1, (bb,3)x1 -> 3 blocks
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Long]("n_candidates") == 1L, "only the (aa,3) block pairs")
    assert(r.getAs[Long]("n_total_pairs") == 6L)
    assert(r.getAs[Long]("n_matches") == 1L, "aaX~aaY at dist 1")
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("reduction_ratio") == 1.0 - 1.0 / 6.0)
  }
}
