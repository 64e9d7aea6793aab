package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BestWindowCover must be indistinguishable from the quadratic form it
  * replaced in [[graft.operators.Search.bestSnippetsFromPositions]] — the
  * anchor×member position-band self-join + countDistinct + (coverage DESC,
  * start ASC) argmax — on randomized position/term layouts. The DuckDB
  * oracle for `search_snippets` / `search_highlight` still RUNS the
  * quadratic plan, so this equivalence is what keeps those gates
  * hash-exact. */
class BestWindowCoverSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** The reference semantics, computed naively on the driver. */
  private def naive(pw: Seq[(Int, String)], window: Int): (Long, Long) = {
    val best = pw.map { case (a, _) =>
      val covered = pw.filter { case (p, _) => p >= a && p < a + window }
        .map(_._2).distinct.size
      (a, covered)
    }.distinct
    // ties on coverage: earliest start
    val bestCov = best.map(_._2).max
    val bestStart = best.filter(_._2 == bestCov).map(_._1).min
    (bestStart.toLong, bestCov.toLong)
  }

  private def viaExpr(pw: Seq[(Int, String)], window: Int): (Long, Long) = {
    val df = pw.toDF("pos", "w")
      .agg(sort_array(collect_list(struct(col("pos"), col("w")))).as("pw"))
      .select(TextFunctions.bestWindowCover(col("pw"), window).as("bw"))
      .select(col("bw.snip_start"), col("bw.n_covered"))
    val r = df.collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("matches the quadratic reference on randomized layouts") {
    val rnd = new scala.util.Random(12)
    for (trial <- 0 until 40) {
      val n = 1 + rnd.nextInt(30)
      val terms = Array("alpha", "beta", "gamma", "delta")
      // distinct positions (the matchedPositions contract)
      val positions = rnd.shuffle((0 until 200).toList).take(n).sorted
      val pw = positions.map(p => (p, terms(rnd.nextInt(terms.length))))
      val window = 1 + rnd.nextInt(15)
      assert(viaExpr(pw, window) == naive(pw, window),
        s"trial $trial window=$window pw=$pw")
    }
  }

  test("earliest span wins coverage ties") {
    // two disjoint windows each covering {a, b}: starts 0 and 100
    val pw = Seq((0, "a"), (1, "b"), (100, "a"), (101, "b"))
    assert(viaExpr(pw, 4) == (0L, 2L))
  }

  test("duplicate positions evict by position, not index") {
    // can't arise from matchedPositions, but the expression is exact anyway
    val pw = Seq((5, "a"), (5, "b"), (6, "c"))
    assert(viaExpr(pw, 2) == naive(pw, 2))
    assert(viaExpr(pw, 1) == naive(pw, 1))
  }

  test("single position; window 1") {
    assert(viaExpr(Seq((7, "x")), 1) == (7L, 1L))
  }

  test("null array stays null; empty array yields null") {
    val df = Seq(Tuple1(Seq.empty[(Int, String)])).toDF("raw")
      .select(expr("transform(raw, x -> struct(x._1 as pos, x._2 as w))").as("pw"))
      .select(TextFunctions.bestWindowCover(col("pw"), 3).as("bw"))
    assert(df.collect()(0).isNullAt(0))
    val dfNull = spark.sql(
      "SELECT CAST(NULL AS ARRAY<STRUCT<pos: INT, w: STRING>>) AS pw")
      .select(TextFunctions.bestWindowCover(col("pw"), 3).as("bw"))
    assert(dfNull.collect()(0).isNullAt(0))
  }
}
