package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * IVF-style (inverted-file) approximate nearest neighbor — the coarse-quantizer
 * scale path complementing [[Similarity.lshBucketedPairs]]:
 *
 * 1. pick `nLists` deterministic seed centroids (the corpus vectors whose
 *    vec_id hashes lowest — a seeded sample, reproducible in any engine);
 * 2. optionally refine them with a few k-means sweeps ([[kmeansCentroids]] —
 *    the assignment step iterated, recall-gated in spec);
 * 3. assign every corpus vector to its nearest centroid (broadcast of the
 *    tiny centroid table, one scan — no corpus shuffle);
 * 4. at query time, probe only the `nProbe` nearest lists per query, computing
 *    exact cosine inside them.
 *
 * Search cost drops from O(N) to O(N * nProbe / nLists) per query; the join
 * key (list id) distributes across the cluster, so the index build and the
 * probe are both shuffle-partitioned operations. The only driver-side step is
 * indexing the <= nLists seed rows (explicitly tiny — this replaces an
 * unpartitioned global window, which would funnel the frame through a single
 * task).
 */
object SimilarityIvf {

  import Similarity.{dot, norm}

  private val centroidSchema = StructType(Seq(
    StructField("list_id", IntegerType, nullable = false),
    StructField("centroid", ArrayType(FloatType), nullable = false)))

  /** Deterministic centroid pick: the `nLists` corpus rows with the smallest
    * md5(vec_id) — a uniform seeded sample, reproducible across runs and
    * engines. The <= nLists survivors are indexed on the driver (tiny by
    * construction) instead of through a global window. */
  def centroids(corpus: DataFrame, nLists: Int): DataFrame = {
    val spark = corpus.sparkSession
    val seeds: Array[Row] = corpus
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h")
      .limit(nLists)
      .select(col("embedding"))
      .collect()
    val rows = seeds.zipWithIndex.map { case (r, i) => Row(i + 1, r.getSeq[Float](0)) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), centroidSchema)
      .select(col("list_id"), col("centroid"), norm("centroid").as("cnorm"))
  }

  /**
   * K-means refinement: seed with [[centroids]], then `iters` sweeps of
   * (assign to nearest, recompute per-list mean). Each sweep is one corpus
   * scan + a partial-aggregatable per-(list, dim) average — no collect of
   * member vectors, so it scales to any list size. Lists that lose all
   * members drop out (their id is skipped), like any IVF trainer.
   */
  def kmeansCentroids(corpus: DataFrame, nLists: Int, iters: Int = 2): DataFrame =
    lloydSweeps(corpus, centroids(corpus, nLists), iters)

  /** `iters` distributed Lloyd sweeps from an arbitrary seed frame — the
    * shared refinement loop of [[kmeansCentroids]] and
    * [[kmeansParCentroids]]. */
  private def lloydSweeps(corpus: DataFrame, seed: DataFrame, iters: Int): DataFrame = {
    var cents = seed
    for (_ <- 0 until iters) {
      val assigned = assign(corpus, cents)
      // per-(list, dim) mean via the two-level deterministic fold (same
      // pattern as TimeSeries.crossSeries): a plain avg() sums doubles in
      // partition order and the refined centroids would differ across
      // parallelism — here the result is identical on 4 threads or 1000
      // executors, with bounded buffers
      val shard = TimeSeries.seriesShard(col("vec_id").cast("string"), TimeSeries.CrossSeriesShards)
      val partials = TimeSeries.shardPartials("avg", valueCol = "v")
      val perDim = assigned
        .select(col("list_id"), shard.as("shard"),
          posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as(Seq("d", "v")))
        .groupBy("list_id", "d", "shard")
        .agg(partials.head, partials.tail: _*)
        .groupBy("list_id", "d")
        .agg(TimeSeries.shardFinal("avg").as("m"))
      cents = perDim
        .groupBy("list_id")
        .agg(expr("transform(array_sort(collect_list(struct(d, m))), s -> CAST(s.m AS FLOAT))").as("centroid"))
        .select(col("list_id"), col("centroid"), norm("centroid").as("cnorm"))
    }
    cents
  }

  /**
   * k-means‖-style trainer (Bahmani et al., "Scalable k-means++"), fully
   * deterministic: where [[kmeansCentroids]] refines `nLists` seeds picked
   * blindly, this OVERSAMPLES `oversample x nLists` deterministic candidates
   * (salted md5 order — independent of the plain seed pick), weights each
   * candidate by how much of the corpus it attracts (one distributed
   * [[assign]] pass + count), re-clusters the tiny weighted candidate set to
   * `nLists` centers on the driver (weighted farthest-first init + weighted
   * Lloyd — sequential, so bit-deterministic; the paper's random D²-sampling
   * replaced by its deterministic argmax analog), and finishes with the same
   * distributed [[lloydSweeps]]. High-mass regions get centers
   * proportional to their weight instead of their sample luck, which is what
   * raises recall at high nLists.
   *
   * Driver-bounded by construction: the ONLY driver state is the
   * `oversample x nLists` candidate rows and their weights (e.g. 8 x 256
   * candidates at 64 dims ≈ 0.5 MiB) — the corpus itself only ever streams
   * through distributed assign/average passes.
   */
  def kmeansParCentroids(corpus: DataFrame, nLists: Int,
      oversample: Int = 8, iters: Int = 2): DataFrame = {
    require(nLists >= 1 && oversample >= 1, "nLists, oversample >= 1")
    val spark = corpus.sparkSession
    // 1. deterministic oversampled candidates (bounded collect)
    val cands: Array[(String, Array[Double])] = corpus
      .withColumn("h", md5(concat(lit("kmpp:"), col("vec_id").cast("string"))))
      .orderBy("h")
      .limit(oversample * nLists)
      .select(col("h"), col("embedding"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    require(cands.nonEmpty, "empty corpus")
    // 2. weight candidates by attracted corpus mass (distributed pass)
    val candRows = cands.zipWithIndex.map { case ((_, v), i) => Row(i + 1, v.toIndexedSeq.map(_.toFloat)) }
    val candDf = spark.createDataFrame(
        spark.sparkContext.parallelize(candRows.toIndexedSeq, 1), centroidSchema)
      .select(col("list_id"), col("centroid"), norm("centroid").as("cnorm"))
    val weightByIdx: Map[Int, Double] = assign(corpus, candDf)
      .groupBy("list_id").count()
      .collect().map(r => (r.getInt(0) - 1) -> r.getLong(1).toDouble).toMap
    val w = cands.indices.map(i => weightByIdx.getOrElse(i, 0.0)).toArray
    // driver-side cosine on the candidate set
    val norms = cands.map { case (_, v) => math.sqrt(v.map(x => x * x).sum) }
    def cos(v: Array[Double], c: Array[Double], vn: Double): Double = {
      var s = 0.0; var d = 0; val cn = math.sqrt(c.map(x => x * x).sum)
      while (d < v.length) { s += v(d) * c(d); d += 1 }
      if (vn == 0.0 || cn == 0.0) 0.0 else s / (vn * cn)
    }
    // 3a. weighted farthest-first init (deterministic D²-argmax): first the
    // heaviest candidate, then repeatedly the candidate maximizing
    // weight x (1 - cos to nearest chosen), ties to the smaller salt hash
    val k = math.min(nLists, cands.length)
    val chosen = scala.collection.mutable.ArrayBuffer[Int]()
    def pickNext(): Int = {
      var best = -1
      var bestKey: (Double, Double, String) = null
      for (i <- cands.indices if !chosen.contains(i)) {
        val d2 =
          if (chosen.isEmpty) 1.0
          else 1.0 - chosen.map(j => cos(cands(i)._2, cands(j)._2, norms(i))).max
        // primary: weighted distance mass; then raw distance (so zero-weight
        // candidates still order); then the salt hash for total order
        val key = (w(i) * d2, d2, cands(i)._1)
        val better = best < 0 ||
          key._1 > bestKey._1 ||
          (key._1 == bestKey._1 && (key._2 > bestKey._2 ||
            (key._2 == bestKey._2 && key._3 < bestKey._3)))
        if (better) { best = i; bestKey = key }
      }
      best
    }
    for (_ <- 0 until k) chosen += pickNext()
    // 3b. weighted Lloyd on the candidate set (sequential -> deterministic)
    var centers: Array[Array[Double]] = chosen.map(i => cands(i)._2.clone()).toArray
    for (_ <- 0 until 5) {
      val sums = Array.fill(k)(new Array[Double](centers(0).length))
      val mass = new Array[Double](k)
      for (i <- cands.indices) {
        var bestJ = 0; var bestC = Double.NegativeInfinity
        for (j <- 0 until k) {
          val c = cos(cands(i)._2, centers(j), norms(i))
          if (c > bestC) { bestC = c; bestJ = j }
        }
        var d = 0
        while (d < sums(bestJ).length) { sums(bestJ)(d) += w(i) * cands(i)._2(d); d += 1 }
        mass(bestJ) += w(i)
      }
      centers = (0 until k).map { j =>
        if (mass(j) == 0.0) centers(j) else sums(j).map(_ / mass(j))
      }.toArray
    }
    // 4. distributed refinement from the driver-trained seed
    val seedRows = centers.zipWithIndex.map { case (c, j) =>
      Row(j + 1, c.toIndexedSeq.map(_.toFloat))
    }
    val seed = spark.createDataFrame(
        spark.sparkContext.parallelize(seedRows.toIndexedSeq, 1), centroidSchema)
      .select(col("list_id"), col("centroid"), norm("centroid").as("cnorm"))
    lloydSweeps(corpus, seed, iters)
  }

  /** Build + search with k-means‖-trained centroids ([[kmeansParCentroids]]);
    * recall-gated by spec like [[ivfKnnKmeans]]. */
  def ivfKnnKmeansPar(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, oversample: Int = 8, iters: Int = 2): DataFrame = {
    val cents = kmeansParCentroids(corpus, nLists, oversample, iters).cache()
    search(assign(corpus, cents), cents, queries, k, nProbe)
  }

  /** Assign each corpus vector to its nearest centroid (max cosine, ties to
    * the lowest list_id — the same selection a `ROW_NUMBER ... ORDER BY csim
    * DESC, list_id` makes, but as a partial-aggregatable `max_by` hash
    * aggregate instead of a window: no corpus-sized shuffle-sort, map-side
    * combine does most of the work. */
  def assign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val scored = corpus
      .select(col("vec_id"), col("embedding"), norm("embedding").as("vnorm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim", dot("embedding", "centroid") / (col("vnorm") * col("cnorm")))
    scored
      .groupBy(col("vec_id"))
      .agg(
        // embedding/vnorm are constant within the group (one corpus row
        // fanned out over centroids) — any representative is exact
        first(col("embedding")).as("embedding"),
        first(col("vnorm")).as("vnorm"),
        expr("max_by(list_id, struct(csim, -list_id))").as("list_id"))
  }

  /** Streaming twin of [[assign]]: the incremental-index maintenance shape —
    * new embeddings arrive per micro-batch and each is assigned to its
    * nearest centroid from the PERSISTED centroid frame (the index built by
    * [[centroids]]/[[kmeansCentroids]] stays fixed between retrains, so the
    * increment never re-clusters). The centroid frame collects once at plan
    * build (bounded by nLists, the same driver-side bound the batch builders
    * use) and inlines as literals: every row's argmax is a pure codegen'd
    * projection — no shuffle, no state, no aggregate — so the operator is
    * legal in append-mode streaming and embarrassingly parallel at 100 TB.
    *
    * Equivalence contract (spec-pinned): same csim arithmetic as [[assign]]
    * (one [[Similarity.dot]] per centroid / vnorm*cnorm) and the same
    * tie-break (max csim, then lowest list_id) via one `array_max` over
    * (csim, -list_id) structs — bit-identical to the batch `max_by`. */
  def assignStream(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val cl = cents.select(col("list_id").cast("int"), col("centroid"), col("cnorm"))
      .collect().sortBy(_.getInt(0))
    require(cl.nonEmpty, "empty centroid frame")
    // the literal inlining is the right trade only while the centroid count
    // stays plan-sized; far above any sane nLists the generated code would
    // blow up quietly — refuse loudly instead (retrain coarser, or shard
    // the assignment over centroid subsets)
    require(cl.length <= 1024,
      s"assignStream inlines centroids as literals: ${cl.length} lists exceeds the 1024 bound")
    val entries = cl.map { r =>
      val lid = r.getInt(0)
      val cvec = typedLit(r.getSeq[Float](1))
      val csim = graft.functions.VectorFunctions.floatDot(col("embedding"), cvec) /
        (col("vnorm") * lit(r.getDouble(2)))
      struct(csim.as("csim"), lit(-lid).as("nlid"))
    }
    vecs
      .select(col("vec_id"), col("embedding"), norm("embedding").as("vnorm"))
      .withColumn("_best", array_max(array(entries.toIndexedSeq: _*)))
      .select(col("vec_id"), col("embedding"), col("vnorm"),
        (-col("_best.nlid")).cast("int").as("list_id"))
  }

  /** The `nProbe` nearest lists per query by float cosine against the
    * broadcast centroid table (tiny: |queries| × nLists before the cut);
    * emits `payload` columns + `list_id`. The ONE probe-selection
    * definition shared by [[search]] and [[searchInt8]] — tie-breaks
    * (csim desc, list_id) cannot drift between the two paths. Requires
    * `query_id`/`qe`/`qnorm` on the input. */
  /** The DISTINCT list ids a query batch probes (bounded by nLists, so the
    * collect is driver-safe at any query count) — what a maintained-store
    * read passes as a filter on its list_id-PARTITIONED assignments scan,
    * turning the probe into a partition-pruned fetch. Filtering on a
    * superset of each query's own probes is sound: [[search]] re-derives
    * per-query probe membership from the same deterministic selection. */
  def probedListIds(queries: DataFrame, cents: DataFrame, nProbe: Int): Array[Int] = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), norm("embedding").as("qnorm"))
    probeLists(q, cents, nProbe, Seq("query_id"))
      .select("list_id").distinct().collect().map(_.getInt(0)).sorted
  }

  private[operators] def probeLists(q: DataFrame, cents: DataFrame, nProbe: Int,
      payload: Seq[String]): DataFrame = {
    val probeW = Window.partitionBy("query_id").orderBy(col("csim").desc, col("list_id"))
    q.crossJoin(broadcast(cents))
      .withColumn("csim", dot("qe", "centroid") / (col("qnorm") * col("cnorm")))
      .withColumn("rn", row_number().over(probeW))
      .where(col("rn") <= nProbe)
      .select(payload.map(col) :+ col("list_id"): _*)
  }

  /**
   * Per-list label purity — the clustering-quality audit of an IVF index
   * against a labeled column: a list whose members share a label says the
   * coarse quantizer respects the data's semantic structure; low purity
   * plus many labels per list predicts poor recall at small nProbe (the
   * query's true neighbors are split across lists). Per list: member count,
   * distinct labels, the majority label (ties to the LOWER label id), its
   * count, and `purity = n_majority / n_vecs`.
   *
   * Scale shape: one [[assign]] pass (broadcast centroid argmax), a
   * (list × label) aggregate that partial-aggregates map-side, then windows
   * over the TINY counts frame (nLists × |labels| rows) — the corpus never
   * sorts. One mirrored IEEE division per output row.
   */
  def cellPurity(emb: DataFrame, nLists: Int = 16,
      labelCol: String = "label"): DataFrame = {
    val cents = centroids(emb, nLists)
    val counts = assign(emb, cents)
      .select(col("vec_id"), col("list_id").cast("long").as("list_id"))
      .join(emb.select(col("vec_id"), col(labelCol).as("label")), Seq("vec_id"))
      .groupBy("list_id", "label").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("list_id").orderBy(col("n").desc, col("label"))
    val maj = counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("list_id"), col("label").as("majority_label"), col("n").as("n_majority"))
    counts.groupBy("list_id")
      .agg(sum(col("n")).as("n_vecs"), countDistinct(col("label")).as("n_labels"))
      .join(maj, Seq("list_id"))
      .select(col("list_id"), col("n_vecs"), col("n_labels"),
        col("majority_label"), col("n_majority"),
        (col("n_majority").cast("double") / col("n_vecs")).as("purity"))
  }

  /**
   * Top-k search probing `nProbe` lists per query. Returns
   * (query_id, neighbor_id, sim, rank) like [[Similarity.bruteForceKnn]] —
   * approximate: recall depends on nProbe/nLists.
   */
  def search(indexed: DataFrame, cents: DataFrame, queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), norm("embedding").as("qnorm"))
    val probes = probeLists(q, cents, nProbe, Seq("query_id", "qe", "qnorm"))
    // exact cosine only inside probed lists; per-query rank via the k-bounded
    // map-side top-k (Similarity.rankTopK) instead of a corpus-sized window
    val scored = indexed.join(broadcast(probes), Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot("embedding", "qe") / (col("vnorm") * col("qnorm"))).as("sim"))
    Similarity.rankTopK(scored, "sim", k)
  }

  /** Convenience: build + search in one call (seeded centroids — the
    * deterministic, oracle-gated configuration). */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = centroids(corpus, nLists).cache()
    search(assign(corpus, cents), cents, queries, k, nProbe)
  }

  /** Build + search with k-means-refined centroids (higher recall; gated by
    * a recall-vs-brute-force spec rather than a SQL oracle). */
  def ivfKnnKmeans(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val cents = kmeansCentroids(corpus, nLists, iters).cache()
    search(assign(corpus, cents), cents, queries, k, nProbe)
  }

  /**
   * [[search]] with INT8-QUANTIZED inverted lists — the representation a
   * 100 TB ANN store actually holds: list membership decided on the float
   * vectors (same [[assign]]), but the stored list entries compress to
   * `(scale, q ARRAY<TINYINT>)` ([[graft.functions.QuantizeInt8Vec]] — 4×
   * smaller reads) and in-list scoring runs the integer kernel
   * ([[graft.functions.Int8DotProduct]]), dequantized once per pair like
   * [[Similarity.bruteForceKnnInt8]]. Probing stays float against the tiny
   * centroid table (it is nLists rows — compressing it buys nothing).
   * Zero/non-finite vectors (scale 0) are excluded from lists and queries —
   * they have no direction to score. The integer dot is exact, so ranking
   * is bit-deterministic and the whole pipeline keeps a SQL oracle.
   *
   * Scores are dequantized INNER PRODUCTS (maximum-inner-product search,
   * like [[Similarity.bruteForceKnnInt8]]), NOT cosine: the orders coincide
   * exactly on unit-normalized stores — normalize upstream when cosine
   * semantics are required.
   */
  def searchInt8(indexed: DataFrame, cents: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val vf = graft.functions.VectorFunctions
    val q = Similarity.withInt8(
        queries.select(col("vec_id").as("query_id"), col("embedding")), "q_")
      .select(col("query_id"), col("embedding").as("qe"), norm("embedding").as("qnorm"),
        col("q_scale"), col("q_q"))
    val probes = probeLists(q, cents, nProbe, Seq("query_id", "q_scale", "q_q"))
    val inv = Similarity.withInt8(
        indexed.select(col("vec_id").as("neighbor_id"), col("list_id"), col("embedding")), "d_")
      .select(col("neighbor_id"), col("list_id"), col("d_scale"), col("d_q"))
    val scored = inv.join(broadcast(probes), Seq("list_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (vf.int8Dot(col("q_q"), col("d_q")).cast("double") *
          (col("q_scale") * col("d_scale"))).as("score"))
    Similarity.rankTopK(scored, "score", k)
  }

  /** Convenience: seeded-centroid build + int8-list search in one call (the
    * deterministic, oracle-gated configuration of [[searchInt8]]). */
  def ivfKnnInt8(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = centroids(corpus, nLists).cache()
    searchInt8(assign(corpus, cents), cents, queries, k, nProbe)
  }

  /**
   * IVF list-size BALANCE report — the index-health audit that predicts
   * query latency before any query runs: per list, the vector count and its
   * load factor vs the uniform ideal (n_total / nLists). IVF probe cost is
   * driven by the lists a query lands in, so a hot list (load factor ≫ 1 —
   * duplicated embeddings, a dominant topic, a degenerate seed) makes every
   * query probing it pay that list's full scan; the fix (re-seed, split, or
   * raise nLists) needs exactly this view. Complements [[cellPurity]]
   * (label mixing) with size skew.
   *
   * Scale: the [[assign]] argmax aggregate (centroid table broadcast, the
   * corpus shuffles once on vec_id), one nLists-sized count aggregate, and
   * a 1-row broadcast total. Empty lists do not appear (counts are never
   * 0); `n_lists_used` on every row makes the gap visible.
   *
   * @return (list_id, n_vecs, n_lists_used, load_factor) with load_factor
   *         = n_vecs * nLists / n_total as one pinned double expression.
   */
  def listBalance(emb: DataFrame, nLists: Int = 16): DataFrame = {
    val cents = centroids(emb, nLists)
    val sizes = assign(emb, cents)
      .groupBy(col("list_id").cast("long").as("list_id"))
      .agg(count(lit(1)).as("n_vecs"))
    val totals = broadcast(sizes.agg(sum("n_vecs").as("n_total"),
      count(lit(1)).as("n_lists_used")))
    sizes.crossJoin(totals)
      .select(col("list_id"), col("n_vecs"), col("n_lists_used"),
        (col("n_vecs").cast("double") * nLists / col("n_total").cast("double"))
          .as("load_factor"))
  }

  /**
   * Centroid-based SILHOUETTE per list — the clustering-quality audit
   * [[cellPurity]] can't give on unlabeled data: for each vector,
   * d₁ = 1 − cos(v, assigned centroid), d₂ = 1 − cos(v, runner-up), and
   * s = (d₂ − d₁)/max(d₁, d₂) ∈ [0, 1] (the centroid simplification of
   * Rousseeuw 1987 — the full formula needs pairwise member distances; the
   * centroid form is what ANN index monitoring actually computes). A list
   * whose mean s ≈ 0 sits on a cell boundary — its members' true neighbors
   * live in the runner-up list, predicting recall loss at small nProbe.
   *
   * Scale: one broadcast-centroid fan-out (nLists rows per vector), a
   * per-vector rank window over ≤ nLists rows, then a per-list aggregate.
   * Determinism: cosines are the [[assign]] expression; per-row s is one
   * pinned double chain quantized to DECIMAL(18,9) so the per-list MEAN is
   * an exact decimal sum (order-free); min/max are picks of identical
   * doubles. Zero-norm vectors (cos undefined) are excluded like
   * [[Similarity.bruteForceKnnInt8]] excludes them.
   *
   * @return (list_id, n_vecs, mean_silhouette, min_silhouette,
   *         max_silhouette) per non-empty assigned list.
   */
  def centroidSilhouette(emb: DataFrame, nLists: Int = 16): DataFrame = {
    // a zero-norm SEED has no direction to measure against (and its cosine
    // division is undefined) — drop it like the zero-norm corpus vectors
    val cents = centroids(emb, nLists).where(col("cnorm") > 0.0d)
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("list_id"))
    val top2 = emb
      .select(col("vec_id"), col("embedding"), norm("embedding").as("vnorm"))
      .where(col("vnorm") > 0.0d)
      .crossJoin(broadcast(cents))
      .withColumn("csim", dot("embedding", "centroid") / (col("vnorm") * col("cnorm")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy("vec_id")
      .agg(max(when(col("rn") === 1, col("list_id"))).as("list_id"),
        max(when(col("rn") === 1, col("csim"))).as("sim1"),
        max(when(col("rn") === 2, col("csim"))).as("sim2"))
    val d1 = lit(1.0d) - col("sim1")
    val d2 = lit(1.0d) - col("sim2")
    val s = when(greatest(d1, d2) === 0.0d, lit(0.0d))
      .otherwise((d2 - d1) / greatest(d1, d2))
    top2
      // a silhouette needs a runner-up: if fewer than two centroids survive
      // the zero-norm filter, sim2 is NULL everywhere — emit NO rows (an
      // explicit "not measurable" signal) instead of a misleading mean of
      // NULL-skipped sums over a non-NULL count
      .where(col("sim2").isNotNull)
      .select(col("list_id"), s.as("s"),
        s.cast(DecimalType(18, 9)).as("sq"))
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_vecs"), sum(col("sq")).as("ssum"),
        min(col("s")).as("min_silhouette"), max(col("s")).as("max_silhouette"))
      .select(col("list_id"), col("n_vecs"),
        (col("ssum").cast("double") / col("n_vecs").cast("double")).as("mean_silhouette"),
        col("min_silhouette"), col("max_silhouette"))
  }
}
