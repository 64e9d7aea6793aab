package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Product-quantization ANN: codebook/encode determinism, the pure-projection
 * encode plan shape (no shuffle — the property that makes encoding 100 TB a
 * single scan), ADC rank quality on separable data, and exactness when the
 * corpus lies ON the codebook points.
 */
class SimilarityPqSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** 4 well-separated clusters of 30 vectors in 16-d (m=4 → 4-d subspaces). */
  private def clustered: DataFrame = {
    (0L until 120L).map { i =>
      val axis = (i % 4).toInt
      val v = Array.tabulate(16) { d =>
        val base = if (d / 4 == axis) 10.0 else 0.0
        (base + ((i * 31 + d * 7) % 100) / 100.0 - 0.5).toFloat
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("codebook is deterministic, sliced, and carries exact self-dots") {
    val cb1 = SimilarityPq.codebook(clustered, m = 4, ksub = 8, dim = 16)
    val cb2 = SimilarityPq.codebook(clustered, m = 4, ksub = 8, dim = 16)
    assert(cb1.m == 4 && cb1.dsub == 4)
    assert(cb1.book.flatten.map(c => (c.c, c.w.toSeq, c.selfDot)).toSeq ==
      cb2.book.flatten.map(c => (c.c, c.w.toSeq, c.selfDot)).toSeq)
    cb1.book.foreach { sub =>
      assert(sub.map(_.c).toSeq == (1 to 8))
      sub.foreach { cw =>
        assert(cw.w.length == 4)
        val expect = cw.w.map(x => x.toDouble * x.toDouble).foldLeft(0.0)(_ + _)
        assert(cw.selfDot == expect)
      }
    }
  }

  test("encode is a pure projection: no exchange in the plan") {
    val cb = SimilarityPq.codebook(clustered, m = 4, ksub = 8, dim = 16)
    val plan = SimilarityPq.encode(clustered, cb).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PQ encode must not shuffle:\n$plan")
  }

  test("codes are in range and identical across parallelism settings") {
    val cb = SimilarityPq.codebook(clustered, m = 4, ksub = 8, dim = 16)
    val codes = SimilarityPq.encode(clustered, cb).collect()
      .map(r => (r.getLong(0), (1 to 4).map(j => r.getInt(j))))
    assert(codes.length == 120)
    assert(codes.forall(_._2.forall(c => c >= 1 && c <= 8)))
    val again = SimilarityPq.encode(clustered.repartition(7), cb).collect()
      .map(r => (r.getLong(0), (1 to 4).map(j => r.getInt(j)))).sortBy(_._1)
    assert(codes.sortBy(_._1).toSeq == again.toSeq)
  }

  test("ADC distance is exact when the corpus sits on codebook points") {
    // corpus = the seed rows themselves → every vector encodes to itself and
    // its ADC self-distance to its own query table is exactly 0 per subspace
    val seeds = clustered.limit(8)
    val cb = SimilarityPq.codebook(seeds, m = 4, ksub = 8, dim = 16)
    val knn = SimilarityPq.adcKnn(seeds, seeds, k = 7, m = 4, ksub = 8, dim = 16)
    // nearest reported neighbor of each query has the minimal table distance;
    // distances to DIFFERENT seed rows are strictly positive (separable data)
    val rows = knn.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.forall(_._3 > 0.0), "distinct seed rows must be strictly apart")
    assert(rows.count(_._4 == 1L) == 8)
  }

  test("ADC kNN ranks same-cluster vectors first on separable data") {
    val queries = clustered.where(col("vec_id") < 4) // one per cluster
    val knn = SimilarityPq.adcKnn(clustered, queries, k = 10, m = 4, ksub = 16, dim = 16)
    val byQuery = knn.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 10)
      // with 4 axis-aligned clusters, at least 8 of the top 10 approximate
      // neighbors share the query's cluster (residual jitter may admit a few)
      val sameCluster = rows.count(r => r.getLong(1) % 4 == q % 4)
      assert(sameCluster >= 8, s"query $q: only $sameCluster/10 same-cluster")
    }
  }

  test("IVF+PQ agrees with plain ADC on separable data and stays deterministic") {
    val queries = clustered.where(col("vec_id") < 4)
    // nProbe = nLists: every list probed, so IVF+PQ must equal plain ADC
    val full = SimilarityPq.ivfAdcKnn(clustered, queries, k = 5,
        nLists = 4, nProbe = 4, m = 4, ksub = 8, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(t => (t._1, t._4))
    val adc = SimilarityPq.adcKnn(clustered, queries, k = 5, m = 4, ksub = 8, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(t => (t._1, t._4))
    assert(full.toSeq == adc.toSeq, "all-probes IVF+PQ must equal the full ADC scan")
    // pruned probing still finds same-cluster neighbors on separable data
    val pruned = SimilarityPq.ivfAdcKnn(clustered, queries, k = 5,
        nLists = 8, nProbe = 2, m = 4, ksub = 16, dim = 16).collect()
    assert(pruned.groupBy(_.getLong(0)).forall(_._2.nonEmpty))
    val again = SimilarityPq.ivfAdcKnn(clustered.repartition(9), queries, k = 5,
        nLists = 8, nProbe = 2, m = 4, ksub = 16, dim = 16).collect()
    assert(pruned.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(t => (t._1, t._4)).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sortBy(t => (t._1, t._4)).toSeq)
  }

  test("ADC kNN is deterministic across parallelism") {
    val queries = clustered.where(col("vec_id") < 4)
    def run(df: DataFrame) =
      SimilarityPq.adcKnn(df, queries, k = 5, m = 4, ksub = 8, dim = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4))
    assert(run(clustered).toSeq == run(clustered.repartition(13)).toSeq)
  }
}
