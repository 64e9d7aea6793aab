package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * The compressed ends of the quantization ladder (binary sign-bit kNN) and
 * the two-stage prefix-dimension retrieval: plan shape, determinism, and
 * agreement with exact search where the configuration forces it.
 */
class SimilarityLadderSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** 4 axis-aligned clusters of 30 vectors in 64-d (the gate dimension). */
  private def clustered: DataFrame = {
    (0L until 120L).map { i =>
      val axis = (i % 4).toInt
      val v = Array.tabulate(64) { d =>
        val base = if (d / 16 == axis) 10.0 else 0.0
        (base + ((i * 31 + d * 7) % 100) / 100.0 - 0.5).toFloat
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("bqKnn: hamming in range, self excluded, deterministic across parallelism") {
    val queries = clustered.where(col("vec_id") < 4)
    def run(df: DataFrame) = Similarity.bqKnn(df, queries, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val out = run(clustered)
    assert(out.length == 32)
    assert(out.forall(t => t._3 >= 0L && t._3 <= 64L))
    assert(out.forall(t => t._1 != t._2))
    assert(out.toSeq == run(clustered.repartition(11)).toSeq)
  }

  test("bqKnn ranks same-cluster vectors first on separable data") {
    val queries = clustered.where(col("vec_id") < 4)
    val byQuery = Similarity.bqKnn(clustered, queries, k = 10).collect().groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      val same = rows.count(r => r.getLong(1) % 4 == q % 4)
      assert(same >= 8, s"query $q: only $same/10 same-cluster by hamming")
    }
  }

  test("prefixKnn with full-dim prefix equals brute force exactly") {
    val queries = clustered.where(col("vec_id") < 4)
    // prefixDim = dim: stage 1 is already exact, so the two-stage result
    // must be bit-identical to bruteForceKnn
    val two = Similarity.prefixKnn(clustered, queries, k = 5, prefixDim = 64, overfetch = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    val bf = Similarity.bruteForceKnn(clustered, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))
    assert(two.toSeq == bf.toSeq)
  }

  test("prefixKnn two-stage recall on separable data and cross-parallelism determinism") {
    val queries = clustered.where(col("vec_id") < 4)
    def run(df: DataFrame) =
      Similarity.prefixKnn(df, queries, k = 5, prefixDim = 16, overfetch = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
    val out = run(clustered)
    assert(out.length == 20)
    // the first 16 dims carry cluster 0's axis only; still, exact re-rank of
    // 20 candidates must produce 5 valid rows per query with sims in [-1, 1]
    assert(out.forall(t => t._3 >= -1.0 && t._3 <= 1.0001))
    assert(out.toSeq == run(clustered.repartition(7)).toSeq)
  }
}
