package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Dimension-truncation recall audit: identity at full dim, bounded range,
  * and a hand fixture where the truncated prefix provably misranks. */
class TruncRecallSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def corpus = (0L until 40L).map { i =>
    (i, Array.tabulate(8)(j => ((i * 7 + j * 3) % 11 - 5).toFloat / 5f))
  }.toDF("vec_id", "embedding")

  test("recall at the full dimension is exactly 1") {
    val r = Similarity.truncRecall(corpus, dims = Seq(8), k = 5, probeMod = 10L)
      .collect()(0)
    assert(r.getAs[Long]("dim") == 8L)
    assert(r.getAs[Double]("recall_at_k") == 1.0)
    assert(r.getAs[Long]("n_match_total") ==
      r.getAs[Long]("n_queries") * 5L)
  }

  test("recalls are in (0,1] and rows cover every audited dim") {
    val rs = Similarity.truncRecall(corpus, dims = Seq(2, 4, 8), k = 5,
      probeMod = 10L).collect()
    assert(rs.map(_.getAs[Long]("dim")).sorted.toSeq == Seq(2L, 4L, 8L))
    rs.foreach { r =>
      val rec = r.getAs[Double]("recall_at_k")
      assert(rec > 0.0 && rec <= 1.0, s"recall $rec out of range")
    }
  }

  test("a prefix that hides the signal dimension misranks: recall < 1") {
    // vectors identical in dim 0, discriminative only in dim 1: truncating
    // to d=1 makes all cosines equal -> ties resolve by id, not similarity
    val d = Seq(
      (0L, Array(1f, 1f)), (1L, Array(1f, 0.9f)), (2L, Array(1f, -1f)),
      (3L, Array(1f, -0.9f)), (4L, Array(1f, 0.8f)), (5L, Array(1f, -0.8f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.truncRecall(d, dims = Seq(1), k = 2, probeMod = 6L)
      .collect()(0) // probe = vec 0; full top-2 = {1, 4}; trunc ties -> {1, 2}
    assert(r.getAs[Long]("n_queries") == 1L)
    assert(r.getAs[Double]("recall_at_k") < 1.0)
  }
}
