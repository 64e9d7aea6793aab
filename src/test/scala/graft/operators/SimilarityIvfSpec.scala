package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * IVF ANN: determinism of the seeded configuration (the oracle-gated path)
 * and recall of the k-means-refined configuration vs brute-force truth.
 */
class SimilarityIvfSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  /** 4 well-separated clusters of 30 vectors each in 8-d. */
  private def clustered: DataFrame = {
    val centers = Seq(
      Array(10.0, 0, 0, 0, 0, 0, 0, 0), Array(0, 10.0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 10.0, 0, 0, 0, 0, 0), Array(0, 0, 0, 10.0, 0, 0, 0, 0))
    (0L until 120L).map { i =>
      val c = centers((i % 4).toInt)
      // deterministic per-(vector, dim) jitter in [-0.5, 0.5)
      val v = c.zipWithIndex.map { case (x, d) => (x + ((i * 31 + d * 7) % 100) / 100.0 - 0.5).toFloat }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("seeded centroids are deterministic and indexed without a global window") {
    val c1 = SimilarityIvf.centroids(clustered, 8).collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    val c2 = SimilarityIvf.centroids(clustered, 8).collect().map(r => (r.getInt(0), r.getSeq[Float](1)))
    assert(c1.toSeq == c2.toSeq)
    assert(c1.length == 8 && c1.map(_._1).toSeq == (1 to 8))
  }

  test("kmeans centroids converge toward cluster means and stay deterministic") {
    val k1 = SimilarityIvf.kmeansCentroids(clustered, 4, iters = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val k2 = SimilarityIvf.kmeansCentroids(clustered, 4, iters = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(k1.toSeq == k2.toSeq, "k-means refinement must be deterministic")
    assert(k1.nonEmpty && k1.forall(_._2.length == 8))
    // every refined centroid should point dominantly at one cluster axis
    k1.foreach { case (_, c) =>
      val mags = c.map(math.abs)
      assert(mags.max > 2 * (mags.sum - mags.max) / 7, s"centroid not cluster-aligned: ${c.mkString(",")}")
    }
  }

  test("kmeans-refined IVF reaches recall >= 0.8 vs brute force") {
    val data = clustered.cache()
    val queries = data.where(col("vec_id") % 17 === 0)
    val truth = Similarity.bruteForceKnn(data, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = SimilarityIvf.ivfKnnKmeans(data, queries, k = 5, nLists = 4, nProbe = 1, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (truth intersect approx).size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall below 0.8 (truth=${truth.size}, approx=${approx.size})")
  }

  test("kmeans-par trainer: deterministic, recall >= the plain-seeded trainer at equal config") {
    val data = clustered.cache()
    val queries = data.where(col("vec_id") % 17 === 0)
    val p1 = SimilarityIvf.kmeansParCentroids(data, 4, oversample = 8, iters = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val p2 = SimilarityIvf.kmeansParCentroids(data, 4, oversample = 8, iters = 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    assert(p1.toSeq == p2.toSeq, "k-means-par training must be deterministic")
    def recall(approx: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      (truth intersect approx).size.toDouble / truth.size
    val truth = Similarity.bruteForceKnn(data, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val plain = recall(SimilarityIvf.ivfKnnKmeans(data, queries, k = 5, nLists = 4, nProbe = 1, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet, truth)
    val par = recall(SimilarityIvf.ivfKnnKmeansPar(data, queries, k = 5, nLists = 4, nProbe = 1,
        oversample = 8, iters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet, truth)
    // both trainers are deterministic on this fixture, so >= is an exact,
    // repeatable comparison — the oversampled trainer must never be worse
    assert(par >= plain, s"k-means-par recall $par below plain-seeded $plain")
    assert(par >= 0.8, s"k-means-par recall $par below 0.8")
  }

  test("recall is monotone in nProbe: more probed lists never lose ground truth") {
    val rnd = new scala.util.Random(11)
    val data = (1L to 120L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val queries = data.where(col("vec_id") <= 4)
    val truth = Similarity.bruteForceKnn(data, queries, k = 5)
    def recallsAt(np: Int): Map[Long, Double] =
      Similarity.recallReport(
        SimilarityIvf.ivfKnn(data, queries, k = 5, nLists = 8, nProbe = np), truth)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("recall")).toMap
    val r1 = recallsAt(1); val r2 = recallsAt(2); val r8 = recallsAt(8)
    r1.keys.foreach { q =>
      assert(r2(q) >= r1(q), s"query $q: nProbe 2 below 1")
      assert(r8(q) >= r2(q), s"query $q: nProbe 8 below 2")
    }
    // probing every list IS brute force: recall exactly 1 everywhere
    assert(r8.values.forall(_ == 1.0))
  }

  test("assignStream == batch assign, bit-exact (vec_id -> list_id and vnorm)") {
    val cents = SimilarityIvf.centroids(clustered, 8)
    val batch = SimilarityIvf.assign(clustered, cents)
      .select("vec_id", "list_id", "vnorm")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val stream = SimilarityIvf.assignStream(clustered, cents)
      .select("vec_id", "list_id", "vnorm")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(stream == batch)
    assert(batch.values.map(_._1).toSet.size > 1, "fixture should span several lists")
  }

  test("assignStream per micro-batch equals the batch assignment restricted to new ids") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cents = SimilarityIvf.centroids(clustered, 8) // the persisted index
    val rows = clustered.as[(Long, Array[Float])].collect()
    val input = MemoryStream[(Long, Array[Float])]
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    val q = SimilarityIvf.assignStream(
        input.toDS().toDF("vec_id", "embedding"), cents)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val f = b.select("vec_id", "list_id").collect()
          .map(r => (r.getLong(0), r.getInt(1)))
        seen.synchronized { seen ++= f }
        ()
      }.start()
    input.addData(rows.take(40).toSeq: _*)
    q.processAllAvailable()
    input.addData(rows.drop(40).toSeq: _*) // the "new embeddings" increment
    q.processAllAvailable()
    q.stop()
    val batch = SimilarityIvf.assign(clustered, cents)
      .select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(seen.size == rows.length)
    assert(seen.toMap == batch)
  }
}
