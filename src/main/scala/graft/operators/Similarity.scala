package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`vec_id, embedding ARRAY<FLOAT>`).
 *
 * - [[bruteForceKnn]]: exact cosine top-k — the correctness baseline. The query
 *   set is broadcast (it is small by construction); the corpus streams through
 *   executors, so the plan is a single scan + per-row top-k: no corpus shuffle.
 * - [[lshBucketedPairs]]: the scale path — random-hyperplane LSH signatures
 *   block the corpus into buckets; only co-bucketed pairs get exact cosine.
 *   Hyperplane weights are derived from md5 parity (deterministic, so a SQL
 *   oracle reproduces the same buckets; at 100 TB you'd seed the same way).
 *
 * All arithmetic is a sequential double-precision dot product (the native
 * [[graft.functions.FloatVectorDot]] / [[graft.functions.FloatDotWeights]]
 * expressions — index order, accumulator seeded 0.0), matching an
 * element-order sequential dot product in the oracle engine bit-for-bit.
 */
object Similarity {

  /** Sequential double dot product of two float-array columns — a native
    * codegen'd expression ([[graft.functions.FloatVectorDot]]) with the same
    * fold order as the declarative
    * `aggregate(zip_with(...), 0D, +)` it replaces (bit-exact, much faster:
    * no per-element lambda dispatch in the ANN scoring loop). */
  def dot(a: String, b: String): Column =
    graft.functions.VectorFunctions.floatDot(col(a), col(b))

  def norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Rank a scored frame `(query_id, neighbor_id, <scoreCol>)` to per-query
   * top-k via the k-bounded [[graft.functions.TopKScoreIdAgg]] — the map-side
   * replacement for `ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score
   * DESC, neighbor_id)`: each task folds its scored rows into a local k-entry
   * buffer, so the one exchange carries at most `tasks x k` rows per query
   * (vs. ALL |corpus| x |queries| scored rows funneling into |queries|
   * window partitions), and no corpus-sized sort runs anywhere. Ordering is
   * identical (score desc on Spark's DOUBLE total order, ties to the lower
   * neighbor_id), so results are bit-identical to the window form. Shared by
   * every kNN scorer — float/int8, brute-force/IVF — so rank semantics
   * cannot drift between them.
   */
  private[operators] def rankTopK(scored: DataFrame, scoreCol: String, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKScoreIdAgg.topKScoreId(col(scoreCol), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.id").as("neighbor_id"), col("e.score").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank"))

  /**
   * Exact cosine top-k: for each query vector, the k nearest corpus vectors.
   * Similarities are raw doubles: the sequential fold makes them bit-identical
   * across engines, and vec_id breaks ranking ties.
   */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Precompute each side's norm ONCE per row (not per pair): the per-pair
    // work drops from three 64-dim dot products to one. sqrt(dot(v,v)) is the
    // same double either way, so oracle parity is unaffected.
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qe"), norm("embedding").as("qn")))
    val d = corpus.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("de"), norm("embedding").as("dn"))
    val scored = d.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot("qe", "de") / (col("qn") * col("dn"))).as("sim"))
    rankTopK(scored, "sim", k)
  }

  /** +-1 weight for hyperplane j, dimension d: parity of hex digit (d % 32)
    * of md5("j:d"). Evaluated ONCE at plan time (same md5 the oracle computes
    * per-row) and inlined as array literals — per-row cost is just the dot. */
  private def hyperplaneWeight(j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val digit = Integer.parseInt(hex.charAt(d % 32).toString, 16)
    if (digit % 2 == 1) 1.0 else -1.0
  }

  /**
   * Random-hyperplane signature: bit j = sign of <v, w_j> where w_j[d] = +-1
   * from the parity of hex digit (d % 32) of md5("j:d"). Deterministic and
   * reproducible in any engine with md5.
   */
  def hyperplaneSignature(emb: String, bits: Int, dim: Int = 64): Column = {
    val bitCols = (0 until bits).map { j =>
      val w = (0 until dim).map(hyperplaneWeight(j, _))
      // native literal-weight dot (same sequential fold the declarative
      // zip_with form computed — bit-exact, codegen'd)
      when(graft.functions.VectorFunctions.floatDotWeights(col(emb), w) > 0, "1").otherwise("0")
    }
    concat(bitCols: _*)
  }

  /** LSH-bucketed near-dup pairs: exact cosine only within equal-signature
    * buckets. `bits` controls bucket granularity (recall/cost trade). */
  def lshBucketedPairs(corpus: DataFrame, bits: Int = 8, minCosine: Double = 0.3): DataFrame = {
    val signed = signedFrame(corpus, bits)
    signed.as("x").join(signed.as("y"),
        col("x.sig") === col("y.sig") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        (dot("x.embedding", "y.embedding") / (col("x.n") * col("y.n"))).as("cos_sim"))
      .where(col("cos_sim") >= minCosine)
  }

  /** Cross-corpus LSH pairs: incoming vectors against an existing set, exact
    * cosine only where the hyperplane signatures collide — the embedding
    * analog of [[Dedup.crossNgramJaccard]] (screen a new batch against the
    * training set without the existing-x-existing quadrant). Both sides
    * shuffle on the signature; neither corpus broadcasts. */
  def crossLshPairs(incoming: DataFrame, existing: DataFrame,
                    bits: Int = 8, minCosine: Double = 0.3): DataFrame =
    signedFrame(incoming, bits).as("x")
      .join(signedFrame(existing, bits).as("y"), col("x.sig") === col("y.sig"))
      .select(col("x.vec_id").as("incoming_id"), col("y.vec_id").as("existing_id"),
        (dot("x.embedding", "y.embedding") / (col("x.n") * col("y.n"))).as("cos_sim"))
      .where(col("cos_sim") >= minCosine)

  private def signedFrame(corpus: DataFrame, bits: Int): DataFrame =
    corpus.select(col("vec_id"), col("embedding"),
      norm("embedding").as("n"),
      hyperplaneSignature("embedding", bits).as("sig"))

  /** Int8 max-abs scalar quantization summary per vector — the compression an
    * embedding store applies before ANN at 100 TB (4× smaller vectors,
    * integer dot products). One native codegen'd pass per row
    * ([[graft.functions.FloatQuantStats]]; SQL: `quant_int8`), zero shuffle;
    * the LONG accumulators make every stat order-independent, so no
    * sorted-fold machinery is needed for oracle parity. `scale` dequantizes
    * (`x_i ≈ q_i * scale`), `q_sq` is the self-dot an int8 scorer uses, and
    * `q_l1`/`q_max` are the saturation audit (max-abs quantization pins
    * `q_max` to 127 for any nonzero vector — a different value flags a
    * degenerate embedding). */
  /**
   * Int8 RECONSTRUCTION-ERROR audit — the "can we serve quantized" number
   * that pairs with the recall audits: per vector, the mean squared error
   * of dequantized (q·scale) against the original floats, the max absolute
   * per-dimension error, and a flag past `flagAt` MSE. Max-abs int8 bounds
   * each |error| by scale/2, so the flag catches only degenerate inputs
   * (non-finite elements quantize to the scale-0 form — their "error" IS
   * the vector), which is exactly what a serving gate wants to route away.
   *
   * Determinism: errors fold in array-index order via zip_with + aggregate
   * (fixed order, input-order-free); all arithmetic is one pinned chain.
   * Row-wise over one scan — no shuffle, no corpus frame.
   *
   * @return (vec_id, n_dims, scale, mse, max_abs_err, lossy_flag)
   */
  def quantizeError(emb: DataFrame, flagAt: Double = 1e-4): DataFrame = {
    val s = emb.select(col("vec_id"), col("embedding"),
      graft.functions.VectorFunctions.quantizeInt8Vec(col("embedding")).as("qs"))
    val errs = zip_with(col("embedding"), col("qs.q"),
      (x, q) => x.cast("double") - q.cast("double") * col("qs.scale"))
    s.select(col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        col("qs.scale").as("scale"),
        errs.as("errs"))
      .select(col("vec_id"), col("n_dims"), col("scale"),
        (aggregate(col("errs"), lit(0.0), (acc, e) => acc + e * e) /
          col("n_dims").cast("double")).as("mse"),
        aggregate(col("errs"), lit(0.0),
          (acc, e) => greatest(acc, abs(e))).as("max_abs_err"))
      .withColumn("lossy_flag",
        when(col("mse") > flagAt, 1L).otherwise(0L))
  }

  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        graft.functions.VectorFunctions.quantInt8(col("embedding")).as("s"))
      .select(col("vec_id"), col("s.scale").as("scale"), col("s.q_sum").as("q_sum"),
        col("s.q_l1").as("q_l1"), col("s.q_max").as("q_max"), col("s.q_sq").as("q_sq"))

  /** Append int8 quantization columns `{pre}scale`/`{pre}q` (all input
    * columns retained) and drop zero/non-finite (scale-0) vectors — the ONE
    * definition of the int8 store representation shared by every int8
    * scorer ([[bruteForceKnnInt8]], [[SimilarityIvf.searchInt8]]), so the
    * exclusion rule cannot drift between them. */
  private[operators] def withInt8(df: DataFrame, pre: String): DataFrame =
    df.withColumn("_qs", graft.functions.VectorFunctions.quantizeInt8Vec(col("embedding")))
      .withColumn(s"${pre}scale", col("_qs.scale"))
      .withColumn(s"${pre}q", col("_qs.q"))
      .drop("_qs")
      .where(col(s"${pre}scale") > 0.0)

  /**
   * Int8 dot-product top-k — [[bruteForceKnn]]'s scoring loop on QUANTIZED
   * vectors: both sides compress to `(scale, q ARRAY<TINYINT>)`
   * ([[graft.functions.QuantizeInt8Vec]]), each candidate pair costs one
   * integer multiply-accumulate kernel ([[graft.functions.Int8DotProduct]]),
   * and the dequantized score is `int_dot * (scale_q * scale_d)` — floats
   * touched once per pair, not once per element. Same plan shape as the
   * float path (broadcast queries, corpus streams, per-query top-k window);
   * at 100 TB the corpus side reads 4× fewer bytes and the kernel runs in
   * integer registers. The integer dot is EXACT, so ranking (and the oracle)
   * is bit-deterministic; only the final score carries float rounding.
   * Zero vectors (scale 0) are excluded from both sides — they have no
   * direction to score.
   */
  def bruteForceKnnInt8(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def quant(df: DataFrame, idAs: String, pre: String) =
      withInt8(df.select(col("vec_id").as(idAs), col("embedding")), pre).drop("embedding")
    val q = broadcast(quant(queries, "query_id", "q_"))
    val d = quant(corpus, "neighbor_id", "d_")
    val scored = d.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VectorFunctions.int8Dot(col("q_q"), col("d_q")).cast("double") *
          (col("q_scale") * col("d_scale"))).as("score"))
    rankTopK(scored, "score", k)
  }

  /** Fixed-point grid for [[centroids]]: 2^20 steps per unit. */
  val CentroidScaleBits = 20

  /**
   * Per-group embedding centroids: the mean vector of each `groupCol` value,
   * emitted one row per (group, dimension) — class prototypes, k-means
   * seeding, per-source embedding profiles.
   *
   * A plain `avg(v)` over distributed partials is order-DEPENDENT in floating
   * point (partial sums merge in task-completion order), so the mean here is
   * computed on a fixed-point grid: each element snaps to
   * `floor(v * 2^20 + 0.5)` (a LONG — the same round-half-up family as
   * [[graft.functions.FloatQuantStats]]), the per-(group, dim) sum is exact
   * integer arithmetic (order-independent), and the mean is one final
   * long/long division — bit-reproducible in any engine, at 2^-20 ≈ 1e-6
   * resolution (below float32's own noise floor for unit-scale embeddings).
   *
   * Scale: `posexplode` multiplies rows by `dim` but partial aggregation
   * collapses them to (groups × dim) partials per task before the only
   * shuffle, so the exchange carries kilobytes regardless of corpus size.
   */
  def centroids(emb: DataFrame, groupCol: String = "label"): DataFrame = {
    val grid = math.pow(2, CentroidScaleBits).toLong
    emb
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col(groupCol), (col("d") + 1).as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(floor(col("v").cast("double") * grid + 0.5)).as("fp_sum"))
      .select(col(groupCol), col("dim").cast("long").as("dim"), col("n_vecs"),
        (col("fp_sum") / (col("n_vecs") * grid)).as("mean"))
  }

  /**
   * Pairwise cosine similarity between the per-group [[centroids]] — the
   * source/label-confusion audit (two sources whose centroids cosine ≈ 1
   * are near-duplicate distributions; a mix report flags them before both
   * are paid for in the training budget). Cosine is SCALE-INVARIANT, so
   * the per-vector `1/(n·grid)` factors cancel and the whole computation
   * stays on the exact integer fixed-point sums: per-pair dot and per-group
   * norm terms accumulate in DECIMAL(38,0) (|fp_sum| ≤ n·2^20 — squares
   * fit 38 digits up to n ≈ 10^12 vectors per group), and ONE pinned-order
   * double expression per output row converts at the end — bit-exact in
   * any engine, like [[Graph.assortativity]].
   *
   * Scale: the centroid frame is (groups × dim) rows regardless of corpus
   * size, so the pair join is tiny; all corpus-sized work is [[centroids]]'
   * one map-side-collapsed shuffle.
   */
  def centroidSimilarity(emb: DataFrame, groupCol: String = "label"): DataFrame = {
    val grid = math.pow(2, CentroidScaleBits).toLong
    val dec = "DECIMAL(38,0)"
    // cached ((groups x dims)-bounded): the norm aggregate and both pair-
    // join sides read it — uncut, each re-ran the corpus posexplode
    val fp = Frames.cached(emb
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col(groupCol), col("d"))
      .agg(sum(floor(col("v").cast("double") * grid + 0.5)).as("fp")))
    // cast BEFORE multiplying: fp ≤ n·2^20, so a LONG×LONG product overflows
    // past n ≈ 3000 vectors — the products must form in DECIMAL(38,0)
    val norms = fp.groupBy(groupCol)
      .agg(sum(col("fp").cast(dec) * col("fp").cast(dec)).as("nrm"))
    val pairs = fp.as("x")
      .join(fp.as("y"),
        col("x.d") === col("y.d") && col(s"x.$groupCol") < col(s"y.$groupCol"))
      .groupBy(col(s"x.$groupCol").as("ga"), col(s"y.$groupCol").as("gb"))
      .agg(sum(col("x.fp").cast(dec) * col("y.fp").cast(dec)).as("num"))
    pairs
      .join(norms.select(col(groupCol).as("ga"), col("nrm").as("na")), "ga")
      .join(norms.select(col(groupCol).as("gb"), col("nrm").as("nb")), "gb")
      .select(col("ga").cast("long").as("label_a"), col("gb").cast("long").as("label_b"),
        expr("""CASE WHEN na = 0 OR nb = 0 THEN NULL
               |     ELSE CAST(num AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
               |END""".stripMargin).as("cosine"))
  }

  /**
   * Per-dimension embedding health audit: count, exact min/max, grid-exact
   * mean and variance for every dimension of the corpus — the monitoring
   * table behind ANN-index and encoder-drift checks (a dead dimension shows
   * var≈0, a scale blowup shows |max| outliers, a biased encoder shows
   * off-zero means). At 100 TB this is one scan: `posexplode` fans out by
   * `dim` but partial aggregation collapses each task to `dim` partials
   * before the only shuffle (same shape as [[centroids]]).
   *
   * Determinism: min/max are rank-picked (no accumulation, exact on the raw
   * float values); mean/variance accumulate on the 2^-20 fixed-point grid in
   * LONG (sum ≤ n·2^20, sum of squares ≤ n·2^40 — both far inside LONG),
   * then ONE mirrored double expression per output row:
   * `mean = fp_sum/(n·g)`, `variance = sumsq/(n·g²) − (fp_sum/(n·g))²`
   * (the population variance of the grid-snapped values).
   */
  def dimStats(emb: DataFrame): DataFrame = {
    val grid = math.pow(2, CentroidScaleBits).toLong
    val fp = floor(col("v").cast("double") * grid + 0.5)
    emb
      .select(posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy((col("d") + 1).as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("v").cast("double")).as("min_v"),
        max(col("v").cast("double")).as("max_v"),
        sum(fp).as("fp_sum"),
        sum(fp * fp).as("fp_sumsq"))
      .select(col("dim").cast("long").as("dim"), col("n_vecs"),
        col("min_v"), col("max_v"),
        (col("fp_sum") / (col("n_vecs") * grid)).as("mean"),
        ((col("fp_sumsq") / (col("n_vecs") * grid * grid)) -
          (col("fp_sum") / (col("n_vecs") * grid)) *
            (col("fp_sum") / (col("n_vecs") * grid))).as("variance"))
  }

  /**
   * Diagonal-covariance MAHALANOBIS OOD score — the PARAMETRIC outlier
   * complement to the kNN-density scorer ([[knnDensity]] asks "are my
   * neighbors far"; this asks "am I far from the per-dimension corpus
   * distribution"): score = Σ_d (x_d − μ_d)² / σ²_d over [[dimStats]]'
   * exact-grid moments, which is the χ²-shaped distance under an
   * axis-aligned Gaussian fit. Catches exploding norms AND dead (zeroed)
   * inputs — a zero vector sits μ²/σ² from every non-centered dimension —
   * without generating a single pair.
   *
   * Determinism: μ/σ² come from the dimStats exact integer moments (shared
   * expressions); each per-(vector, dim) term is one pinned double
   * expression, and the per-vector sum folds in ASCENDING dim order (the
   * sorted-fold contract — the fold is over the fixed dim axis, so it is
   * also input-order-free). Zero-variance dims contribute 0.
   *
   * Scale: one posexplode joined against the BROADCAST dim-stats frame
   * (≤ dims rows), one per-vector aggregate whose state is the dim-bounded
   * term array. No pairs, no windows, no driver round-trips.
   *
   * @return (vec_id, n_dims, m2, m2_per_dim, ood_flag) — flag fires when
   *         the per-dimension average exceeds `flagAt` (χ²/dof heuristic:
   *         E[m2/dims] = 1 for in-distribution data).
   */
  def mahalanobisDiag(emb: DataFrame, flagAt: Double = 4.0): DataFrame = {
    val stats = dimStats(emb).select(col("dim"), col("mean"), col("variance"))
    val comps = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), (col("d") + 1).cast("long").as("dim"),
        col("v").cast("double").as("x"))
    val term = when(col("variance") > 0.0,
        (col("x") - col("mean")) * (col("x") - col("mean")) / col("variance"))
      .otherwise(lit(0.0))
    comps.join(broadcast(stats), "dim")
      .select(col("vec_id"), struct(col("dim"), term.as("t")).as("dt"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_dims"),
        aggregate(array_sort(collect_list(col("dt"))), lit(0.0),
          (acc, s) => acc + s.getField("t")).as("m2"))
      .select(col("vec_id"), col("n_dims"), col("m2"),
        (col("m2") / col("n_dims").cast("double")).as("m2_per_dim"))
      .withColumn("ood_flag",
        when(col("m2_per_dim") > flagAt, 1L).otherwise(0L))
  }

  /**
   * Corpus-level ISOTROPY audit — the one-row report on whether the
   * embedding space has collapsed toward a common direction (Ethayarajh's
   * anisotropy finding: contextual encoders often emit vectors with mean
   * pairwise cosine far above 0, which wrecks cosine-threshold dedup and
   * flattens ANN recall curves). Two numbers:
   *
   *  - `mean_pair_cosine`: the average cosine over ALL ordered pairs of
   *    normalized vectors — computed WITHOUT generating pairs, from the
   *    identity Σ_{i≠j} q̂_i·q̂_j = ‖Σq̂‖² − Σ‖q̂_i‖². Isotropic ≈ 0;
   *    collapsed → the cosine floor every threshold must sit above.
   *  - `mean_vector_norm`: ‖mean normalized vector‖ — ≈ 1/√n when
   *    isotropic, O(1) when collapsed.
   *
   * Determinism: normalized components are snapped to a fixed-point grid
   * (`1 << gridBits` steps per unit, [[dimStats]]' trick), so every sum is
   * an exact integer in any engine and only the FINAL arithmetic (two
   * divisions, one sqrt — pinned order, mirrored in the oracle) is floating
   * point. Zero-norm vectors are excluded (they have no direction).
   *
   * Scale shape: one explode + per-dim aggregate (map-side combine collapses
   * each task to ≤ dim partials) + one dim-count-sized final fold — no pair
   * frame, no corpus shuffle beyond the per-dim exchange. The exact-integer
   * cross term Σ‖S_d‖² must stay below 2^53 for the double cast to be exact:
   * (n·grid)² < 2^53, i.e. n < 9.2e8 at the default grid — raise gridBits
   * down / shrink it for larger corpora (the audit is a sampled statistic at
   * that scale anyway).
   */
  def isotropy(emb: DataFrame, gridBits: Int = 14): DataFrame = {
    val grid = (1L << gridBits).toDouble
    val base = emb
      .select(col("vec_id"), col("embedding"), norm("embedding").as("nrm"))
      .where(col("nrm") > 0)
      .select(posexplode(col("embedding")).as(Seq("d", "v")), col("nrm"))
      .select(col("d"),
        floor(col("v").cast("double") / col("nrm") * lit(grid) + lit(0.5))
          .cast("long").as("fp"))
    val perDim = base.groupBy("d").agg(
      count(lit(1)).as("cnt"),
      sum(col("fp")).as("sd"),
      sum(col("fp") * col("fp")).as("ssq"))
    perDim.agg(
        max(col("cnt")).as("n"),
        sum(col("sd").cast("decimal(38,0)") * col("sd").cast("decimal(38,0)")).as("a"),
        sum(col("ssq").cast("decimal(38,0)")).as("b"))
      .select(col("n").as("n_vecs"),
        ((col("a").cast("double") - col("b").cast("double")) / lit(grid * grid) /
          (col("n") * (col("n") - 1)).cast("double")).as("mean_pair_cosine"),
        (sqrt(col("a").cast("double")) / (col("n").cast("double") * lit(grid)))
          .as("mean_vector_norm"))
  }

  /**
   * kNN DENSITY audit — distance-based OOD/outlier scoring for embeddings:
   * each probe's mean cosine to its k nearest corpus neighbors. Low scores
   * are vectors in sparse regions — encoder failures, off-distribution
   * content, mislabeled modality — exactly the rows a curation pass reviews
   * before they poison contrastive training or ANN recall measurements
   * (kNN distance is the classic non-parametric outlier score; LOF et al.
   * are refinements of this statistic).
   *
   * Probes are a deterministic 1-in-`probeMod` id sample: density is a
   * distributional audit, so a sample estimates it — the full-corpus variant
   * routes every vector through its IVF cell ([[SimilarityIvf]]) instead of
   * brute force. Scoring rides [[bruteForceKnn]] (broadcast probes, k-bounded
   * map-side top-k, no corpus shuffle); the k sims fold in sorted order so
   * the mean is engine-exact.
   */
  def selfKnnDensity(corpus: DataFrame, k: Int = 10, probeMod: Long = 20L): DataFrame = {
    val knn = bruteForceKnn(corpus, corpus.where(col("vec_id") % probeMod === 0), k)
    knn.groupBy("query_id").agg(
      count(lit(1)).as("k_found"),
      (expr("aggregate(sort_array(collect_list(sim)), 0D, (acc, v) -> acc + v)") /
        count(lit(1))).as("mean_topk_sim"))
  }

  /** Fixed-point grid for the [[topPrincipalComponent]] vector: 1e6 steps
    * per unit keeps the renorm multiply inside DECIMAL(38,0) even at the
    * scatter matrix's n²-scaled magnitudes. */
  val PcScale = 1000000L

  /**
   * Top principal component of the embedding COVARIANCE — the drift-
   * direction audit ([[dimStats]] finds per-axis problems; this finds the
   * dominant correlated direction, where encoder drift and dataset shift
   * actually live; it is also the first split direction PQ/OPQ-style
   * quantizers care about).
   *
   * Exact-arithmetic design, engine-replayable end to end:
   *  1. grid moments: per dim-pair (i,j), `sij = Σ fp_i·fp_j` and per dim
   *     `si = Σ fp_i` — LONG sums on the 2^-20 grid via two chained
   *     posexplodes of the SAME row (no self-join, no corpus shuffle: the
   *     n·d² explode partial-aggregates to d² partials per task before one
   *     4096-row exchange);
   *  2. scatter matrix: `S[i][j] = n·sij − si·sj` in DECIMAL(38,0) —
   *     n²·Cov with NO division, so it is exact (eigenvectors are scale-
   *     invariant);
   *  3. power iteration from the dim-index-weighted start on the 1e-6 grid:
   *     `raw_i = Σ_j S[i][j]·v_j`, renormalized L1 with EXPLICIT
   *     round-toward-zero on the magnitude (`sign(raw)·(|raw|·scale div
   *     Σ|raw|)` — Spark `div` and DuckDB `//` agree on nonnegative
   *     operands, so signs are split out rather than trusting negative
   *     floor semantics);
   *  4. sign convention: the lowest dim with a nonzero component is made
   *     positive (eigenvectors are defined up to sign).
   *
   * Iteration frames are d-sized; the scatter frame is d²-sized — the loop
   * never touches the corpus again. Lineage cut per iteration.
   */
  def topPrincipalComponent(emb: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 30, "iters in [1, 30]")
    val grid = math.pow(2, CentroidScaleBits).toLong
    val fps = transform(col("embedding"),
      v => floor(v.cast("double") * grid + 0.5).cast("long"))
    val pairs = emb.select(fps.as("fps"))
      .select(col("fps"), posexplode(col("fps")).as(Seq("i", "vi")))
      .select(col("i"), col("vi"), posexplode(col("fps")).as(Seq("j", "vj")))
    val moments = pairs
      .groupBy((col("i") + 1).as("i"), (col("j") + 1).as("j"))
      .agg(count(lit(1)).as("nn"), sum(col("vi") * col("vj")).as("sij"))
    val sums = emb.select(posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy((col("d") + 1).as("d"))
      .agg(sum(floor(col("v").cast("double") * grid + 0.5).cast("long")).as("s"))
    // nn is the vector count (constant over pairs); keep it per-row so the
    // scatter stays one self-contained d²-frame
    val scatter = moments
      .join(sums.select(col("d").as("i"), col("s").as("si")), Seq("i"))
      .join(sums.select(col("d").as("j"), col("s").as("sj")), Seq("j"))
      .select(col("i"), col("j"),
        expr("CAST(nn AS DECIMAL(38,0)) * sij - CAST(si AS DECIMAL(38,0)) * sj").as("sm"))
      .localCheckpoint(false)
    val dims = scatter.select(col("i").as("dim")).distinct().localCheckpoint(false)
    // start from the dim-index-weighted vector, NOT uniform: the uniform
    // start is exactly orthogonal to any zero-sum eigenvector (e.g. the
    // (1,−1) direction of two anti-correlated axes) and power iteration
    // would die at tot=0. Index weighting is deterministic and has no such
    // generic orthogonality. (Any FIXED start can be defeated by an
    // adversarial matrix — documented limitation of deterministic power
    // iteration.)
    val ss = broadcast(dims.agg(sum(col("dim")).as("ssum")))
    var v = dims.crossJoin(ss)
      .select(col("dim"), expr(s"dim * ${PcScale}L div ssum").as("v_fp"))
    for (k <- 1 to iters) {
      val raw = scatter.join(v, col("j") === col("dim"))
        .groupBy(col("i").as("dim"))
        .agg(sum(expr("sm * v_fp")).as("raw"))
      val tot = broadcast(raw.agg(coalesce(sum(abs(col("raw"))), lit(0L).cast("decimal(38,0)")).as("tot")))
      v = raw.crossJoin(tot).select(col("dim"),
        expr(s"CASE WHEN tot = 0 THEN 0L ELSE " +
          s"CAST(CASE WHEN raw < 0 THEN -(abs(raw) * ${PcScale}L div tot) " +
          s"ELSE abs(raw) * ${PcScale}L div tot END AS BIGINT) END").as("v_fp"))
        .localCheckpoint(false)
    }
    // sign convention: first (lowest-dim) nonzero component positive
    val sgn = broadcast(v.where(col("v_fp") =!= 0L)
      .agg(coalesce(expr("min_by(CASE WHEN v_fp < 0 THEN -1L ELSE 1L END, dim)"), lit(1L)).as("sgn")))
    v.crossJoin(sgn).select(col("dim").cast("long").as("dim"),
      (col("v_fp") * col("sgn")).as("pc_fp"),
      ((col("v_fp") * col("sgn")).cast("double") / PcScale).as("pc"))
  }

  /**
   * Per-vector projection onto [[topPrincipalComponent]] — the drift SCORE:
   * once the dominant covariance direction is known, each vector's
   * coordinate along it is the one number a monitoring job tracks over time
   * (a shifting projection histogram = dataset shift along the drift axis).
   *
   * Exact path: grid elements (LONG) × the fixed-point component (LONG),
   * summed in DECIMAL(38,0); the output `proj_fp` floor-divides by the grid
   * with the SIGN-SPLIT round-toward-zero idiom (Spark `div` truncates,
   * DuckDB `//` floors — splitting |·| makes them agree on negatives).
   * `proj = proj_fp / 10⁶` is the one mirrored IEEE division.
   *
   * Scale: the component frame is d rows (broadcast); the corpus explode
   * collapses back to one partial per vector before the single n-row
   * exchange.
   */
  def pcProjection(emb: DataFrame, iters: Int = 8): DataFrame =
    pcProjectionFrom(emb, topPrincipalComponent(emb, iters))

  /** [[pcProjection]] against a PRECOMPUTED component frame — so a caller
    * (or the gate registry) can share one power-iteration result between the
    * component gate and the projection gate. */
  def pcProjectionFrom(emb: DataFrame, pc: DataFrame): DataFrame = {
    val grid = math.pow(2, CentroidScaleBits).toLong
    val el = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), (col("d") + 1).as("dim"),
        floor(col("v").cast("double") * grid + 0.5).cast("long").as("fp"))
    el.join(broadcast(pc.select(col("dim"), col("pc_fp"))), Seq("dim"))
      .groupBy("vec_id")
      .agg(sum(expr("CAST(fp AS DECIMAL(38,0)) * pc_fp")).as("score"))
      .select(col("vec_id"),
        expr(s"CAST(CASE WHEN score < 0 THEN -(abs(score) div ${grid}L) " +
          s"ELSE score div ${grid}L END AS BIGINT)").as("proj_fp"))
      .select(col("vec_id"), col("proj_fp"),
        (col("proj_fp").cast("double") / PcScale).as("proj"))
  }

  /**
   * Hard TRIPLET mining for contrastive training — for each sampled anchor,
   * the HARDEST positive (same label, LOWEST cosine: the in-class pair the
   * encoder currently separates worst) and the HARDEST negative (different
   * label, HIGHEST cosine: the impostor it confuses most), plus the margin
   * `pos_sim − neg_sim`. Anchors with negative margin are active triplet-
   * loss violations — the rows a metric-learning curriculum feeds first,
   * and the count a training pipeline tracks as "how collapsed are my
   * classes" (the FaceNet/contrastive mining step, batch-ified).
   *
   * Determinism: both picks are single aggregates over a lexicographic
   * struct — (sim, −id) max for the negative, (sim, id) min for the
   * positive — so ties break on the vector id with no rank window anywhere.
   *
   * Scale shape: anchors are a deterministic 1-in-`anchorMod` sample
   * (broadcast); the corpus streams through the scoring scan once; two
   * anchor-keyed aggregates. The full-corpus variant routes anchors through
   * IVF cells per label instead of brute force.
   *
   * @return (anchor_id, label, pos_id, pos_sim, neg_id, neg_sim, margin) —
   *         anchors lacking any same-label or any other-label partner drop.
   */
  def hardTriplets(corpus: DataFrame, anchorMod: Long = 40L): DataFrame = {
    val anchors = broadcast(corpus.where(col("vec_id") % anchorMod === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
        col("embedding").as("ae"), norm("embedding").as("an")))
    val d = corpus.select(col("vec_id").as("neighbor_id"),
      col("label").as("n_label"), col("embedding").as("de"),
      norm("embedding").as("dn"))
    val scored = d.join(anchors, col("neighbor_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("a_label"), col("neighbor_id"),
        col("n_label"), (dot("ae", "de") / (col("an") * col("dn"))).as("sim"))
    val pos = scored.where(col("n_label") === col("a_label"))
      .groupBy("anchor_id")
      .agg(min(struct(col("sim"), col("neighbor_id"))).as("p"))
      .select(col("anchor_id"), col("p.neighbor_id").as("pos_id"),
        col("p.sim").as("pos_sim"))
    val neg = scored.where(col("n_label") =!= col("a_label"))
      .groupBy("anchor_id")
      .agg(max(struct(col("sim"), (-col("neighbor_id")).as("nid"))).as("n"))
      .select(col("anchor_id"), (-col("n.nid")).as("neg_id"),
        col("n.sim").as("neg_sim"))
    anchors.select(col("anchor_id"), col("a_label").cast("long").as("label"))
      .join(pos, "anchor_id").join(neg, "anchor_id")
      .select(col("anchor_id"), col("label"), col("pos_id"), col("pos_sim"),
        col("neg_id"), col("neg_sim"),
        (col("pos_sim") - col("neg_sim")).as("margin"))
  }

  /**
   * Variance EXPLAINED by the top principal component — the one-number
   * verdict on [[topPrincipalComponent]]'s finding: `var_explained` near
   * 1/dim says the space is healthy (no single direction dominates);
   * a large ratio says encoder drift / dataset shift has collapsed the
   * corpus onto one axis (and says how much a rank-1 whitening or the
   * first PQ/OPQ split would capture). Companions: [[isotropy]] measures
   * the MEAN direction; this measures the dominant CENTERED direction.
   *
   * Determinism: the projection coordinates are [[pcProjectionFrom]]'s
   * exact fixed-point LONGs, so Σproj and Σproj² are exact integers;
   * `total_var` is the sorted fold over [[dimStats]]' (dim-count-bounded)
   * per-axis variances — the same oracle-pinned arithmetic, then two
   * pinned closing expressions. Σproj² must stay under 2^53 for the double
   * cast (n·(PcScale·max|proj|)² — holds to ~10M unit-norm vectors; the
   * audit samples above that).
   *
   * Scale shape: rides the shared power-iteration component frame (one
   * per session via the gate memo); one projection aggregate + one
   * dim-bounded fold, crossJoined as 1-row frames.
   */
  def pcVarianceExplained(emb: DataFrame, pc: DataFrame): DataFrame = {
    val proj = pcProjectionFrom(emb, pc)
    val pa = proj.agg(
      count(lit(1)).as("n_vecs"),
      sum(col("proj_fp")).as("sp"),
      sum(expr("CAST(proj_fp AS DECIMAL(38,0)) * proj_fp")).as("spp"))
    val tv = broadcast(dimStats(emb).agg(
      expr("aggregate(sort_array(collect_list(variance)), 0D, (acc, v) -> acc + v)")
        .as("total_var")))
    // the component vector is L1-normalized (the power iteration's renorm),
    // so raw projection coordinates are scaled by ‖u‖₂ — divide the raw
    // variance by ‖u‖₂² (exact integer Σ pc_fp²) to get the variance along
    // the UNIT direction. (Caught by the symmetric-cross fixture: without
    // this, a 64-dim-spread component under-reads by ~64×.)
    val u2 = broadcast(pc.agg(
      sum(expr("CAST(pc_fp AS DECIMAL(38,0)) * pc_fp")).as("u2")))
    val meanP = col("sp").cast("double") / col("n_vecs").cast("double") /
      lit(PcScale.toDouble)
    val pcVarRaw = col("spp").cast("double") / lit(PcScale.toDouble * PcScale) /
      col("n_vecs").cast("double") - meanP * meanP
    // u2 = 0 only for a degenerate (constant/empty) corpus whose component
    // is the zero vector — there is no direction, so pc_var is NULL (and
    // ANSI division must never see the zero)
    val pcVar = when(col("u2") > 0, pcVarRaw /
      (col("u2").cast("double") / lit(PcScale.toDouble * PcScale)))
    pa.crossJoin(tv).crossJoin(u2)
      .select(col("n_vecs"), pcVar.as("pc_var"), col("total_var"),
        when(col("total_var") > 0.0, pcVar / col("total_var")).as("var_explained"))
  }

  /**
   * Norm-outlier screen — the row-level embedding health check ([[dimStats]]
   * is the column-level one): a broken encoder shows up as zero/near-zero
   * norms (dead input) or exploding norms (overflow, bad normalization), and
   * both poison cosine ANN. Flags vectors whose squared grid norm falls
   * outside `[loBp, hiBp]` basis points of the corpus mean squared norm.
   *
   * Determinism: the squared norm is the native [[graft.functions
   * .FloatNormFp]] LONG (2^-20 grid, no accumulation drift); the corpus mean
   * is one DECIMAL(38,0) sum floor-divided by the count; the flag is pure
   * LONG compares (`n2·10⁴` vs `bp·mean`). `norm` is the single mirrored
   * IEEE expression `sqrt(n2) / 2^20`, emitted for humans.
   *
   * Scale: one scan + a 1-row broadcast scalar crossJoin — no window, no
   * second corpus shuffle.
   */
  def normOutliers(emb: DataFrame, loBp: Long = 2500L, hiBp: Long = 40000L): DataFrame = {
    require(loBp >= 0 && hiBp > loBp, "need 0 <= loBp < hiBp")
    val grid = math.pow(2, CentroidScaleBits).toLong
    val scored = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.normFp(col("embedding")).as("n2_fp"))
    val stats = broadcast(scored.agg(
      expr("CAST(SUM(CAST(n2_fp AS DECIMAL(38,0))) div COUNT(*) AS BIGINT)").as("mean_n2")))
    scored.crossJoin(stats).select(
      col("vec_id"), col("n2_fp"), col("mean_n2"),
      (sqrt(col("n2_fp").cast("double")) / grid).as("norm"),
      when(col("n2_fp") * 10000L < col("mean_n2") * loBp, 1L)
        .when(col("n2_fp") * 10000L > col("mean_n2") * hiBp, 1L)
        .otherwise(0L).as("is_outlier"))
  }

  /**
   * Binary-quantization kNN — the far end of the quantization ladder
   * (float → int8 → PQ → binary): each vector becomes `bits` hyperplane
   * SIGN BITS packed into one LONG (the native [[graft.functions.SignBits]]
   * expression; same deterministic ±1 md5-parity hyperplanes as
   * [[hyperplaneSignature]]), and candidates rank by Hamming distance —
   * one codegen'd `bit_count(sig XOR qsig)` per pair. At 100 TB the store
   * shrinks 32× vs float and the scan is pure integer ops; the standard
   * deployment re-ranks binary candidates with exact scores
   * ([[prefixKnn]]-style two-stage shape applies directly).
   *
   * Ties (equal Hamming) break to the lower neighbor id; output carries the
   * exact integer distance, so the gate is bit-deterministic.
   */
  def bqKnn(corpus: DataFrame, queries: DataFrame, k: Int,
            bits: Int = 64, dim: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, "1..64 sign bits per signature")
    val w = (0 until bits).map(j => (0 until dim).map(d => hyperplaneWeight(j, d)))
    def sig = graft.functions.VectorFunctions.signBits(col("embedding"), w)
    val d = corpus.select(col("vec_id").as("neighbor_id"), sig.as("sig"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"), sig.as("qsig")))
    val scored = d.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-bit_count(col("sig").bitwiseXOR(col("qsig"))).cast("double")).as("nscore"))
    rankTopK(scored, "nscore", k)
      .select(col("query_id"), col("neighbor_id"),
        (-col("nscore")).cast("long").as("hamming"), col("rank"))
  }

  /** ±1 sign for random-projection axis j, dimension d (0-based): parity of
    * hex digit (d % 32) of md5("rp:j:d") — the [[hyperplaneWeight]] rule
    * under its own salt (reusing the LSH bits would correlate the sketch
    * with the bucketing). Evaluated at plan time, inlined as literals. */
  private def rpSign(j: Int, d: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$j:$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val digit = Integer.parseInt(hex.charAt(d % 32).toString, 16)
    if (digit % 2 == 1) 1 else -1
  }

  /**
   * Sparse random projection (Achlioptas ±1 / Johnson–Lindenstrauss):
   * project each embedding onto `outDim` deterministic ±1 sign axes —
   * the dimensionality-reduction sketch that preserves pairwise distances
   * within (1±ε) while shrinking the scan 4× (64→16 dims). Elements are
   * grid-snapped FIRST (`floor(v·2^20 + 0.5)`), so each coordinate is an
   * exact signed LONG sum — order-free, engine-reproducible — computed in
   * one native codegen pass per axis ([[graft.functions.FloatFpSignedSum]]);
   * `proj` is the one final IEEE division. Long-format output
   * `(vec_id, rp_dim, proj_fp, proj)`; pure projection, zero shuffle.
   */
  def rpProject(emb: DataFrame, outDim: Int = 16, dim: Int = 64,
                scaleBits: Int = CentroidScaleBits): DataFrame = {
    val projCols = (0 until outDim).map { j =>
      graft.functions.VectorFunctions.fpSignedSum(
        col("embedding"), (0 until dim).map(rpSign(j, _)), scaleBits)
    }
    emb.select(col("vec_id"), posexplode(array(projCols: _*)).as(Seq("rp_dim", "proj_fp")))
      .select(col("vec_id"), col("rp_dim").cast("long").as("rp_dim"), col("proj_fp"),
        (col("proj_fp").cast("double") / lit((1L << scaleBits).toDouble)).as("proj"))
  }

  /**
   * Two-stage kNN through the JL sketch: stage 1 ranks the corpus by exact
   * integer L2 distance in the 16-dim ±1-projected space (4× less data than
   * the full-vector scan, integer arithmetic only), stage 2 re-ranks the
   * k×overfetch candidates by exact full-vector cosine — the
   * [[prefixKnn]] shape with a Matryoshka prefix swapped for a random
   * projection (works for embeddings with NO trained prefix structure).
   *
   * Stage-1 coordinates snap to the 2^-14 grid: per-dim |fp| ≤ 64·2^14·|v|,
   * so the 16-term squared distance stays ≤ 2^46 — exactly representable in
   * the DOUBLE the shared k-bounded [[rankTopK]] aggregate ranks on (ties
   * to the lower neighbor_id, identical to `ORDER BY dist2, neighbor_id`).
   */
  def rpKnn(corpus: DataFrame, queries: DataFrame, k: Int,
            outDim: Int = 16, dim: Int = 64, overfetch: Int = 4): DataFrame = {
    require(outDim >= 1 && overfetch >= 1, "outDim, overfetch >= 1")
    val scaleBits = 14 // 16 dims of (2·64·2^14)² sums < 2^53: double-exact
    def sketch(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        array((0 until outDim).map { j =>
          graft.functions.VectorFunctions.fpSignedSum(
            col("embedding"), (0 until dim).map(rpSign(j, _)), scaleBits)
        }: _*).as(s"${idAs}_rp"))
    val q = broadcast(sketch(queries, "query_id"))
    val s1 = sketch(corpus, "neighbor_id")
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-aggregate(
          zip_with(col("query_id_rp"), col("neighbor_id_rp"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v).cast("double")).as("neg_dist2"))
    val cands = rankTopK(s1, "neg_dist2", k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    val full = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("de"), norm("embedding").as("dn"))
    val qFull = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qe"), norm("embedding").as("qn")))
    val rescored = broadcast(cands)
      .join(full, Seq("neighbor_id"))
      .join(qFull, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot("de", "qe") / (col("dn") * col("qn"))).as("sim"))
    rankTopK(rescored, "sim", k)
  }

  /**
   * Two-stage prefix-dimension kNN (Matryoshka-style adaptive retrieval,
   * Kusupati et al. 2022): stage 1 ranks the corpus by cosine over only the
   * FIRST `prefixDim` dimensions (a cheap scan — at 100 TB the prefix can
   * live in fast storage while full vectors stay cold), keeping
   * `k × overfetch` candidates per query via the k-bounded map-side
   * aggregate; stage 2 re-scores ONLY those candidates with full-dimension
   * exact cosine and re-ranks to `k`. Candidate-bounded by construction:
   * full vectors are fetched for `k × overfetch` rows per query, never the
   * corpus. Both stages share the sequential-fold dot, so the whole
   * pipeline is bit-deterministic and SQL-replayable.
   */
  def prefixKnn(corpus: DataFrame, queries: DataFrame, k: Int,
                prefixDim: Int = 16, overfetch: Int = 4): DataFrame = {
    require(prefixDim >= 1 && overfetch >= 1, "prefixDim, overfetch >= 1")
    val pre = (c: Column) => slice(c, 1, prefixDim)
    val q = broadcast(queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qe"), norm("embedding").as("qn"),
      pre(col("embedding")).as("qp"),
      sqrt(graft.functions.VectorFunctions.floatDot(pre(col("embedding")), pre(col("embedding")))).as("qpn")))
    val d = corpus.select(
      col("vec_id").as("neighbor_id"), pre(col("embedding")).as("dp"),
      sqrt(graft.functions.VectorFunctions.floatDot(pre(col("embedding")), pre(col("embedding")))).as("dpn"))
    val stage1 = d.join(q.select("query_id", "qp", "qpn"), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.VectorFunctions.floatDot(col("dp"), col("qp")) / (col("dpn") * col("qpn"))).as("psim"))
    val cands = rankTopK(stage1, "psim", k * overfetch)
      .select(col("query_id"), col("neighbor_id"))
    // stage 2: fetch full vectors for the candidate rows only. The candidate
    // frame is k x overfetch rows per query — ALWAYS the broadcast side; an
    // unhinted join could pick the corpus as build side instead
    val full = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("de"), norm("embedding").as("dn"))
    val rescored = broadcast(cands)
      .join(full, Seq("neighbor_id"))
      .join(q.select("query_id", "qe", "qn"), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot("de", "qe") / (col("dn") * col("qn"))).as("sim"))
    rankTopK(rescored, "sim", k)
  }

  /**
   * Recall@k audit of an approximate kNN result against exact ground truth —
   * the index-quality report every production ANN deployment ships with
   * (tune nLists/nProbe/PQ budgets against it). Both inputs are
   * `(query_id, neighbor_id, …)` top-k frames (e.g. [[SimilarityIvf.ivfKnn]]
   * vs [[bruteForceKnn]]); output is one row per ground-truth query:
   * `(query_id, k_eff, hits, recall)` with `recall = hits / k_eff` as one
   * IEEE division (bit-deterministic). Cost: two k-bounded frames joined on
   * their keys — negligible next to either kNN.
   */
  def recallReport(ann: DataFrame, exact: DataFrame): DataFrame = {
    val a = ann.select(col("query_id"), col("neighbor_id"))
    // cached (k-bounded rows): the k_eff base and the hit join both read the
    // ground truth — uncut, the exact-kNN pass executed twice per report
    val g = Frames.cached(exact.select(col("query_id"), col("neighbor_id")))
    val base = g.groupBy("query_id").agg(count(lit(1)).as("k_eff"))
    val hits = g.join(a, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    base.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("k_eff"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("k_eff").cast("double")).as("recall"))
  }

  /**
   * Cosine THRESHOLD sweep over the LSH-candidate pairs — the embedding
   * twin of [[graft.operators.Dedup.thresholdSweep]]: per probe threshold,
   * how many bucketed candidate pairs clear it. Where the semantic-dedup
   * minCosine gets chosen from evidence (the knee where near-dup mass
   * gives way to merely-related pairs) instead of the 0.95-ish folklore
   * constant. Same cumulative mechanics: a per-pair highest-threshold
   * when-chain bucket, then a descending sum over the ≤|thresholds|-row
   * histogram — no per-threshold pass over the pair frame.
   *
   * @return (threshold, n_pairs) per probe, cumulative ≥-counts, zeros kept.
   */
  def cosineSweep(corpus: DataFrame,
                  thresholds: Seq[Double] = (6 to 19).map(_ / 20.0),
                  bits: Int = 8): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.distinct == thresholds, "thresholds must be ascending, distinct")
    val spark = corpus.sparkSession
    val scored = lshBucketedPairs(corpus, bits, minCosine = thresholds.head)
    val topFirst = thresholds.reverse
    val bucket = topFirst.tail.foldLeft(when(col("cos_sim") >= topFirst.head, lit(topFirst.head))) {
      (acc, t) => acc.when(col("cos_sim") >= t, lit(t))
    }
    val hist = scored.select(bucket.as("threshold"))
      .where(col("threshold").isNotNull)
      .groupBy("threshold").agg(count(lit(1)).as("n_at"))
    import spark.implicits._
    thresholds.toDF("threshold").as("p")
      .join(hist.as("h"), col("h.threshold") >= col("p.threshold"), "left")
      .groupBy(col("p.threshold").as("threshold"))
      .agg(coalesce(sum(col("h.n_at")), lit(0L)).as("n_pairs"))
  }

  /**
   * Nearest-neighbor MARGIN audit — retrieval-confidence per query: the gap
   * between the best and second-best cosine. A small margin means the
   * ranking is noise-level (ANN recall losses and quantization error flip
   * the winner); routing decisions — "auto-accept the match above margin m"
   * — and ANN parameter budgets (nProbe, PQ bits) are set against exactly
   * this distribution. A top1 near 1.0 with a LARGE margin is the
   * duplicate-pair signature ([[graft.operators.Dedup.embedCosine]]'s
   * clientele); margins near 0 mark ambiguous neighborhoods.
   *
   * Scale: [[bruteForceKnn]] at k=2 (broadcast queries, map-side top-k
   * aggregate — swap in the IVF path for corpus-sized query sets), then a
   * per-query pivot of the ≤2 rows. Margin is one pinned double
   * subtraction; NULL when the corpus has a single candidate.
   *
   * @return (query_id, top1_id, top1_sim, top2_sim, margin)
   */
  def knnMargin(corpus: DataFrame, queries: DataFrame): DataFrame =
    bruteForceKnn(corpus, queries, k = 2)
      .groupBy("query_id")
      .agg(
        max(when(col("rank") === 1, col("neighbor_id"))).as("top1_id"),
        max(when(col("rank") === 1, col("sim"))).as("top1_sim"),
        max(when(col("rank") === 2, col("sim"))).as("top2_sim"))
      .select(col("query_id"), col("top1_id"), col("top1_sim"), col("top2_sim"),
        (col("top1_sim") - col("top2_sim")).as("margin"))

  /**
   * Dimension-TRUNCATION recall audit (the Matryoshka question): how much
   * of full-dimension cosine top-k survives when vectors are cut to their
   * first `d` dimensions? The number that decides whether a pipeline can
   * store/serve truncated embeddings (4–8× cheaper ANN at 100 TB) without
   * losing retrieval quality — and, for MRL-trained encoders, the audit
   * that their prefix-nesting actually holds on YOUR corpus.
   *
   * For each `d` in `dims`: truncated-cosine top-k (same [[rankTopK]]
   * k-bounded aggregate and tie rules as every other scorer) is matched
   * against the full-dimension top-k per probe query; recall@k is the
   * exact matched fraction. Queries are the `probeMod` sample (the
   * [[selfKnnDensity]] convention).
   *
   * Determinism: set intersection and counts are exact integers; recall is
   * ONE closing division. Cosines are the same sequential-fold doubles as
   * [[bruteForceKnn]] (a truncated slice folds the same prefix both
   * engines). Scale: one scored corpus×probes pass per audited dim — an
   * audit-shaped cost (probes are sampled), each pass in the k-bounded
   * map-side top-k shape, no corpus window anywhere.
   *
   * @return one row per audited dim: (dim, n_queries, n_match_total,
   *         recall_at_k); full-dim recall is 1 by construction and not
   *         emitted.
   */
  def truncRecall(corpus: DataFrame, dims: Seq[Int] = Seq(8, 16, 32),
      k: Int = 10, probeMod: Long = 20L): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1), "dims must be positive")
    require(k >= 1, "k >= 1")
    val queries = corpus.where(col("vec_id") % probeMod === 0)
    // cached (k-bounded rows): every truncation dim joins against the
    // full-dim ground truth — uncut, each dim re-ran the full brute-force
    // scoring pass
    val full = Frames.cached(bruteForceKnn(corpus, queries, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit")))
    val perDim = dims.map { d0 =>
      def cut(df: DataFrame) = df.select(col("vec_id"),
        slice(col("embedding"), 1, d0).as("embedding"))
      bruteForceKnn(cut(corpus), cut(queries), k)
        .select(col("query_id"), col("neighbor_id"))
        .join(full, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_match"))
        .agg(count(lit(1)).as("n_queries"), sum(col("n_match")).as("n_match_total"))
        .select(lit(d0.toLong).as("dim"), col("n_queries"), col("n_match_total"),
          (col("n_match_total").cast("double") /
            (col("n_queries") * k).cast("double")).as("recall_at_k"))
    }
    perDim.reduce(_ unionByName _)
  }

  /**
   * Pairwise-cosine HISTOGRAM over a deterministic blocked sample — the
   * one-page answer to "how similar is this corpus to itself?" that sits
   * between [[isotropy]] (a single mean) and a full pair frame (quadratic):
   * a hubby right tail predicts near-dup trouble before any dedup runs, a
   * mass near 0 says the encoder spreads the space. Pairs come from md5
   * BLOCKS like every dedup candidate generator: vectors land in `nBlocks`
   * md5 buckets, each bucket keeps its `capPerBlock` lowest (md5, id) rows,
   * and only in-block pairs are scored — sample size is capped at
   * nBlocks·C(cap,2) REGARDLESS of corpus size (the same contract as the
   * minhash `maxBucket` cap), while the md5 assignment keeps the sample
   * uniform and engine-replayable. Cosines bucket into `bins` equal slices
   * of [−1, 1]; the exact bin-edge value belongs to the upper bin
   * (floor semantics), and both engines compute the identical double so
   * the binning agrees bit-for-bit.
   *
   * @return (bin, lo, hi, n_pairs) for non-empty bins; bin = ⌊(cos+1)/2·bins⌋
   *         clamped into [0, bins−1].
   */
  def pairCosineHistogram(emb: DataFrame, nBlocks: Int = 64,
      capPerBlock: Int = 32, bins: Int = 20): DataFrame = {
    require(nBlocks >= 1 && capPerBlock >= 2 && bins >= 1, "bad histogram shape")
    val block = pmod(conv(substring(md5(col("vec_id").cast("string")), 1, 2), 16, 10)
      .cast("long"), lit(nBlocks.toLong))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("block"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    val sampled = emb
      .select(col("vec_id"), col("embedding"), block.as("block"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= capPerBlock)
    val a = sampled.select(col("block"), col("vec_id").as("ia"),
      col("embedding").as("ea"), norm("embedding").as("na"))
    val b = sampled.select(col("block"), col("vec_id").as("ib"),
      col("embedding").as("eb"), norm("embedding").as("nb"))
    val cosine = dot("ea", "eb") / (col("na") * col("nb"))
    a.join(b, Seq("block")).where(col("ia") < col("ib"))
      .select(cosine.as("cos"))
      .select(least(greatest(floor((col("cos") + 1.0d) / 2.0d * bins), lit(0L))
        .cast("long"), lit(bins - 1L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
      .select(col("bin"),
        (lit(-1.0d) + col("bin").cast("double") * (2.0d / bins)).as("lo"),
        (lit(-1.0d) + (col("bin") + 1L).cast("double") * (2.0d / bins)).as("hi"),
        col("n_pairs"))
  }

  /**
   * Split-half centroid DRIFT per group — the snapshot-to-snapshot encoder
   * / distribution stability audit: split each `groupCol`'s vectors into
   * even/odd `vec_id` halves, compute both halves' fixed-point centroids,
   * and report the halves' cosine. A healthy, stationary group shows
   * cosine ≈ 1 (the two halves estimate the same mean); an encoder-version
   * mix or a drifting source drops it. The same arithmetic contract as
   * [[centroidSimilarity]]: 2^-20 grid sums in DECIMAL(38,0), products in
   * decimal, ONE pinned double expression per output row — bit-exact at
   * any parallelism and in any engine. Corpus-sized work is one map-side-
   * collapsed (group, split, dim) aggregate; the cosine join is
   * groups × dim rows.
   *
   * @return (group, n_even, n_odd, cosine) per group with both halves
   *         non-empty and non-zero.
   */
  def centroidDrift(emb: DataFrame, groupCol: String = "label"): DataFrame = {
    val grid = math.pow(2, CentroidScaleBits).toLong
    val dec = "DECIMAL(38,0)"
    val fp = emb
      .select(col(groupCol).as("grp"), (col("vec_id") % 2).as("split"),
        col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy(col("grp"), col("split"), col("d"))
      .agg(sum(floor(col("v").cast("double") * grid + 0.5)).as("fp"),
        count_distinct(col("vec_id")).as("n"))
    val even = fp.where(col("split") === 0)
      .select(col("grp"), col("d"), col("fp").as("fe"), col("n").as("n_even"))
    val odd = fp.where(col("split") === 1)
      .select(col("grp"), col("d"), col("fp").as("fo"), col("n").as("n_odd"))
    even.join(odd, Seq("grp", "d"))
      .groupBy("grp")
      .agg(max(col("n_even")).as("n_even"), max(col("n_odd")).as("n_odd"),
        sum(col("fe").cast(dec) * col("fo").cast(dec)).as("num"),
        sum(col("fe").cast(dec) * col("fe").cast(dec)).as("ne"),
        sum(col("fo").cast(dec) * col("fo").cast(dec)).as("no"))
      .where(col("ne") =!= 0 && col("no") =!= 0)
      .select(col("grp").cast("long").as("label"), col("n_even"), col("n_odd"),
        expr("""CAST(num AS DOUBLE) /
               |(sqrt(CAST(ne AS DOUBLE)) * sqrt(CAST(no AS DOUBLE)))""".stripMargin)
          .as("cosine"))
  }
}
