package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * IVF-style (inverted-file) approximate nearest neighbor — the coarse-quantizer
 * scale path complementing [[Similarity.lshBucketedPairs]]:
 *
 * 1. pick `nLists` deterministic centroids (the corpus vectors whose vec_id
 *    hashes lowest — a seeded sample; on a real corpus you'd run a few k-means
 *    sweeps, which is just this assignment step iterated);
 * 2. assign every corpus vector to its nearest centroid (broadcast of the
 *    centroid table, one scan — no corpus shuffle);
 * 3. at query time, probe only the `nProbe` nearest lists per query, computing
 *    exact cosine inside them.
 *
 * Search cost drops from O(N) to O(N * nProbe / nLists) per query; the join
 * key (list id) distributes across the cluster, so the index build and the
 * probe are both shuffle-partitioned operations — no driver loops beyond the
 * tiny centroid table.
 */
object SimilarityIvf {

  import Similarity.{dot, norm}

  /** Deterministic centroid pick: the `nLists` corpus rows with the smallest
    * md5(vec_id) — a uniform seeded sample, reproducible across runs. */
  def centroids(corpus: DataFrame, nLists: Int): DataFrame =
    corpus
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h")
      .limit(nLists)
      .select(row_number().over(Window.orderBy("h")).as("list_id"),
        col("embedding").as("centroid"), norm("embedding").as("cnorm"))

  /** Assign each corpus vector to its nearest centroid (max cosine). */
  def assign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val scored = corpus
      .select(col("vec_id"), col("embedding"), norm("embedding").as("vnorm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", dot("embedding", "centroid") / (col("vnorm") * col("cnorm")))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("list_id"))
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("vnorm"), col("list_id"))
  }

  /**
   * Top-k search probing `nProbe` lists per query. Returns
   * (query_id, neighbor_id, sim, rank) like [[Similarity.bruteForceKnn]] —
   * approximate: recall depends on nProbe/nLists.
   */
  def search(indexed: DataFrame, cents: DataFrame, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), norm("embedding").as("qnorm"))
    // nearest lists per query (tiny: |queries| x nLists)
    val probeW = Window.partitionBy("query_id").orderBy(col("csim").desc, col("list_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("csim", dot("qe", "centroid") / (col("qnorm") * col("cnorm")))
      .withColumn("rn", row_number().over(probeW))
      .where(col("rn") <= nProbe)
      .select(col("query_id"), col("qe"), col("qnorm"), col("list_id"))
    // exact cosine only inside probed lists
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    indexed.join(broadcast(probes), Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot("embedding", "qe") / (col("vnorm") * col("qnorm"))).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** Convenience: build + search in one call. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = centroids(corpus, nLists).cache()
    search(assign(corpus, cents), cents, queries, k, nProbe)
  }
}
