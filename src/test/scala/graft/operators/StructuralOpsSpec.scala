package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-8 session-5 operators: k-core peeling and degree assortativity. */
class StructuralOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("kcore: pendant peels off a triangle at k=2; core degrees exact") {
    // triangle a-b-c plus pendant d hanging off a
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"))
      .toDF("src", "dst")
    val out = Graph.kcore(edges, k = 2, rounds = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kcore: a path peels from both ends, one layer per round, to empty") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    // after round 1 the endpoints are gone; enough rounds -> nothing has
    // degree 2 anywhere, the 2-core is empty
    assert(Graph.kcore(path, k = 2, rounds = 4).count() == 0L)
    // with only ONE round, just the endpoints (a, e) have peeled: b and d
    // keep their path degree 2 within {b,c,d} ... b-c and c-d remain, so
    // b and d now have degree 1 — visible as core_deg < k mid-peel
    val mid = Graph.kcore(path, k = 2, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mid == Map("b" -> 1L, "c" -> 2L, "d" -> 1L))
  }

  test("kcore: k=1 keeps every non-isolated node; direction/multi-edge collapse") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "c"))
      .toDF("src", "dst")
    val out = Graph.kcore(edges, k = 1, rounds = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // self-loop c-c dropped; a-b multiplicity collapses to one edge
    assert(out == Map("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  test("assortativity: star graph is exactly -1") {
    val edges = Seq(("h", "x"), ("h", "y"), ("h", "z")).toDF("src", "dst")
    val r = Graph.assortativity(edges).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == -1.0)
  }

  test("assortativity: regular ring has zero degree variance -> NULL") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r = Graph.assortativity(edges).collect().head
    assert(r.isNullAt(2))
  }

  test("assortativity: empty edge list -> NULL, zero counts") {
    val edges = Seq.empty[(String, String)].toDF("src", "dst")
    val r = Graph.assortativity(edges).collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2))
  }
}
