package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Hand-computed fixtures for [[Dedup.containment]] and
 * [[Curation.nearDupSourceMatrix]] — the doc-in-doc detector and its
 * source-pair rollup.
 */
class ContainmentSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // doc 1 (3 shingles) is fully contained in doc 2 (8 shingles):
  // jaccard = 3/8 = 0.375 (a symmetric screen at 0.5 misses it), but
  // containment = 3/min(3,8) = 1.0. docs 4/5 are identical (both scores 1).
  // doc 3 shares nothing.
  private def docs: DataFrame = Seq(
    (1L, "a b c d e", "s1"),
    (2L, "a b c d e f g h i j", "s2"),
    (3L, "z y x w v", "s1"),
    (4L, "p q r s t", "s2"),
    (5L, "p q r s t", "s2")
  ).toDF("doc_id", "text", "source")

  test("containment catches the doc-in-doc pair Jaccard misses") {
    val pairs = Dedup.containment(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(pairs.keySet == Set((1L, 2L), (4L, 5L)))
    val p12 = pairs((1L, 2L))
    assert(p12.getLong(p12.fieldIndex("n_a")) == 3L)
    assert(p12.getLong(p12.fieldIndex("n_b")) == 8L)
    assert(p12.getDouble(p12.fieldIndex("containment")) == 1.0)
    val p45 = pairs((4L, 5L))
    assert(p45.getDouble(p45.fieldIndex("containment")) == 1.0)
    // the symmetric score really does miss (1,2) at the same threshold
    val jac = Dedup.ngramJaccard(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)) && jac.contains((4L, 5L)))
  }

  test("containment respects the doc-frequency cap contract") {
    // cap=1 removes every shared shingle from candidate generation -> no pairs
    assert(Dedup.containment(docs, threshold = 0.5, maxDocFreq = 1L).count() == 0)
    // cap=5 keeps everything on this corpus (max df is 2)
    assert(Dedup.containment(docs, threshold = 0.5, maxDocFreq = 5L).count() == 2)
  }

  test("nearDupSourceMatrix rolls pairs up to unordered source pairs") {
    val m = Curation.nearDupSourceMatrix(docs, Dedup.containment(docs, threshold = 0.5))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // (1,2) links s1-s2; (4,5) is within-source s2 (the diagonal row)
    assert(m == Map(("s1", "s2") -> 1L, ("s2", "s2") -> 1L))
  }
}
