package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-8 session-5 operators: k-core peeling, degree assortativity,
  * Flesch-style readability, and TF-IDF keyword extraction. */
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

  test("readability: hand-counted words/sentences/vowel groups; exact formula") {
    val docs = Seq((1L, "the cat sat. it ran away.")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L && r.getLong(3) == 7L)
    assert(r.getDouble(4) == 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (7.0 / 6.0))
  }

  test("readability: no sentence punctuation floors sentences at 1; empty/NULL") {
    val docs = Seq(
      (1L, "one two three"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) == 0L)
    assert(out(1L).getDouble(4) ==
      206.835 - 1.015 * (3.0 / 1.0) - 84.6 * (4.0 / 3.0))
    assert(out(2L).getLong(1) == 0L && out(2L).isNullAt(4))
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(4))
  }

  test("tfidfKeywords: characteristic terms outrank shared ones; ties by term") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry durian cherry")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfKeywords(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3))).toMap
    // d1: apple tf=2 df=1 -> 2·ln3 beats banana tf=1 df=2 -> ln1.5
    assert(out((1L, 1L)) == (("apple", 2L)))
    assert(out((1L, 2L)) == (("banana", 1L)))
    // d2: both terms df=2 tf=1 -> equal score ln1.5, tie broken by term asc
    assert(out((2L, 1L)) == (("banana", 1L)))
    assert(out((2L, 2L)) == (("cherry", 1L)))
    // d3: durian (df=1) characteristic despite tf=1 < cherry's 2?
    // cherry: 2·ln(3/2)=0.81, durian: ln3=1.10 -> durian first
    assert(out((3L, 1L)) == (("durian", 1L)))
    assert(out((3L, 2L)) == (("cherry", 2L)))
  }

  test("tfidfKeywords: ubiquitous terms score exactly zero") {
    val docs = Seq((1L, "x"), (2L, "x y"), (3L, "x")).toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, k = 3).collect()
    val x = rows.filter(_.getString(2) == "x")
    assert(x.length == 3 && x.forall(_.getDouble(4) == 0.0))
  }

  test("centroidSimilarity: orthogonal, diagonal, and scaled-parallel centroids") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0), // centroid (1, 0)
      (3L, Array(0f, 1f), 1),                         // centroid (0, 1)
      (4L, Array(1f, 1f), 2),                         // centroid (1, 1)
      (5L, Array(2f, 2f), 3)                          // parallel to label 2
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidSimilarity(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((0L, 1L)) == 0.0)                      // orthogonal, exact
    assert(math.abs(out((0L, 2L)) - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(math.abs(out((2L, 3L)) - 1.0) < 1e-12)     // scale-invariant
  }

  test("weightedSample: heavy weights dominate; draw is deterministic") {
    val docs = ((1 to 10).map(i => (i.toLong, 10000L)) ++
      (11 to 100).map(i => (i.toLong, 1L))).toDF("doc_id", "wcol")
    val sel = Curation.weightedSample(docs, k = 10, weightCol = "wcol")
    val rows = sel.collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 10L))
    // ∝-weight draw: the 10000x-heavier docs crowd out the light ones
    assert(rows.count(_.getLong(1) <= 10L) >= 9)
    // same seed, same draw
    assert(Curation.weightedSample(docs, k = 10, weightCol = "wcol")
      .collect().map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).toSeq)
  }

  test("weightedSample: nonpositive weights floor at 1; k past n ranks all") {
    val docs = Seq((1L, 0L), (2L, -5L), (3L, 2L)).toDF("doc_id", "wcol")
    val rows = Curation.weightedSample(docs, k = 10, weightCol = "wcol").collect()
    assert(rows.length == 3)
    val w = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(w == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("tfidfKeywords: empty and NULL docs emit nothing but count in n_docs") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, k = 3).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
    // df(x)=2 but n_docs=4: the empty docs still dilute — score ln(4/2) > 0
    assert(rows.forall(r => r.getDouble(4) > 0.0))
    assert(rows.map(_.getDouble(4)).distinct.length == 1)
  }
}
