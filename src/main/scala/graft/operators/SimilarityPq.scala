package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product-quantization (PQ) approximate nearest neighbor — the COMPRESSED-SCAN
 * scale path that complements [[SimilarityIvf]]'s coarse quantizer: where IVF
 * prunes WHICH vectors are scored, PQ shrinks WHAT is stored and scanned. Each
 * `dim`-dimensional vector is split into `m` contiguous subspaces of
 * `dim / m` dimensions; every subspace gets a tiny codebook of `ksub`
 * codewords, and a vector is stored as `m` small integer codes (4 bytes here
 * vs 256 bytes of floats at dim=64 — a 64× reduction; a 100 TB float corpus
 * becomes ~1.6 TB of codes). Queries never decompress the corpus: an
 * asymmetric-distance (ADC) table of `m × ksub` exact query-to-codeword
 * distances is built per query, and each corpus row is scored with `m` table
 * lookups (Jégou et al., "Product Quantization for Nearest Neighbor Search",
 * TPAMI 2011 — public method).
 *
 * Spark shape, chosen for the 1000-executor case:
 * - codebook TRAINING is a seeded sample (the `ksub` corpus rows with the
 *   smallest salted md5 — same deterministic-pick pattern as
 *   [[SimilarityIvf.centroids]]), collected once on the driver (≤ ksub rows,
 *   bounded by construction) and inlined into the plan as literals;
 * - ENCODE is a pure projection — no shuffle, no join: each subspace's
 *   argmin over `ksub` codeword distances is an inlined expression, so
 *   encoding 100 TB is one embarrassingly-parallel scan;
 * - ADC SEARCH is corpus-codes × broadcast per-query distance tables with a
 *   fixed-order `m`-term sum, ranked by the k-bounded map-side
 *   [[Similarity.rankTopK]] aggregate — again no corpus-sized shuffle.
 *
 * Everything is bit-deterministic (sequential-fold dot products, explicit
 * addition order, id tie-breaks), so the full pipeline — seed pick, codebook
 * slice, argmin encode, ADC scoring, ranking — has a DuckDB SQL oracle
 * (`embed_pq_codes`, `embed_pq_knn`).
 */
object SimilarityPq {

  private val vf = graft.functions.VectorFunctions

  /** One trained subspace codeword: its float values and the precomputed
    * sequential-fold self-dot (the `|w|²` term of the expanded L2 distance,
    * computed once at train time instead of per row). */
  final case class Codeword(c: Int, w: Array[Float], selfDot: Double)

  /** Trained codebook: `book(j)(i)` = codeword `i+1` of subspace `j+1`. */
  final case class Codebook(m: Int, dsub: Int, book: Array[Array[Codeword]])

  /** Sequential double-precision dot of two float slices — the SAME fold
    * order as [[graft.functions.FloatVectorDot]] and DuckDB's
    * `list_dot_product(CAST(_ AS DOUBLE[]), …)`, so driver-side train-time
    * constants are bit-identical to what either engine would compute. */
  private def seqDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /**
   * Seeded codebook: the `ksub` corpus rows with the smallest
   * `md5("pq:" || vec_id)` (salted so the sample is independent of the IVF
   * seed pick), each sliced into `m` subvectors. Codeword ids are 1-based in
   * md5 order — the exact frame a `ROW_NUMBER() OVER (ORDER BY md5(…))`
   * oracle reproduces. The collect is ≤ ksub rows (tiny by construction),
   * mirroring [[SimilarityIvf.centroids]].
   */
  def codebook(corpus: DataFrame, m: Int = 4, ksub: Int = 16, dim: Int = 64): Codebook = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val dsub = dim / m
    val seeds = corpus
      .withColumn("h", md5(concat(lit("pq:"), col("vec_id").cast("string"))))
      .orderBy("h")
      .limit(ksub)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    val book = Array.tabulate(m) { j =>
      seeds.zipWithIndex.map { case (v, i) =>
        val w = v.slice(j * dsub, (j + 1) * dsub)
        Codeword(i + 1, w, seqDot(w, w))
      }
    }
    Codebook(m, dsub, book)
  }

  /** The 1-based subspace slice of the embedding column for subspace `j`
    * (1-based), as the oracle's `list_slice(embedding, (j-1)*dsub+1, j*dsub)`. */
  private def subSlice(cb: Codebook, j: Int, embCol: String = "embedding"): Column =
    slice(col(embCol), (j - 1) * cb.dsub + 1, cb.dsub)

  /** Codeword matrix of subspace `j` as double weights (exact float→double
    * widening — the same values the oracle's `CAST(_ AS DOUBLE[])` yields). */
  private def bookW(cb: Codebook, j: Int): Seq[Seq[Double]] =
    cb.book(j - 1).map(_.w.map(_.toDouble).toSeq).toSeq

  private def bookSd(cb: Codebook, j: Int): Seq[Double] =
    cb.book(j - 1).map(_.selfDot).toSeq

  /**
   * Encode the corpus to PQ codes — a PURE PROJECTION (no shuffle): per
   * subspace, one native [[graft.functions.PqSubspaceCode]] argmin over the
   * `ksub` codeword distances (expanded L2, ties to the lower codeword id).
   * The codebook rides the expression as a reference object, so generated
   * code stays constant-size at any `ksub` (inlining per-codeword
   * expressions broke Janino's 64 KB method limit past ksub≈32).
   * Output: `(vec_id, code_1 … code_m)` — the 100 TB store format.
   */
  def encode(corpus: DataFrame, cb: Codebook): DataFrame = {
    val codeCols = (1 to cb.m).map { j =>
      vf.pqCode(subSlice(cb, j), bookW(cb, j), bookSd(cb, j)).as(s"code_$j")
    }
    corpus.select(col("vec_id") +: codeCols: _*)
  }

  /**
   * Per-query ADC tables: for each query row, `m` arrays of `ksub` exact
   * query-slice-to-codeword distances (`dt_j[c]` indexed by 1-based codeword
   * id — [[graft.functions.PqSubspaceDists]]). One row per query — small by
   * construction, broadcast by [[adcKnn]].
   */
  def adcTables(queries: DataFrame, cb: Codebook): DataFrame = {
    val dtCols = (1 to cb.m).map { j =>
      vf.pqDists(subSlice(cb, j), bookW(cb, j), bookSd(cb, j)).as(s"dt_$j")
    }
    queries.select(col("vec_id").as("query_id") +: dtCols: _*)
  }

  /**
   * ADC top-k: score every corpus code row against every query's distance
   * table with `m` array lookups summed in FIXED left-to-right subspace
   * order (`((d1+d2)+d3)+d4` — the oracle writes the same parenthesization),
   * then rank ascending via the shared k-bounded map-side aggregate
   * (smallest approximate distance first, ties to the lower neighbor id).
   * The only corpus-sized operation is the scan itself: codes × broadcast
   * tables is a projection, and the rank exchange carries ≤ tasks × k rows
   * per query.
   */
  def adcKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 4, ksub: Int = 16, dim: Int = 64): DataFrame = {
    val cb = codebook(corpus, m, ksub, dim)
    val codes = encode(corpus, cb)
    val dts = broadcast(adcTables(queries, cb))
    val approx = (1 to cb.m)
      .map(j => element_at(col(s"dt_$j"), col(s"code_$j")))
      .reduceLeft(_ + _)
    val scored = codes.join(dts, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), (-approx).as("nscore"))
    Similarity.rankTopK(scored, "nscore", k)
      .select(col("query_id"), col("neighbor_id"), (-col("nscore")).as("adist"), col("rank"))
  }

  /**
   * Combined IVF + PQ — the production ANN layout (FAISS "IVFx,PQy" without
   * residual/OPQ rotation, kept rotation-free so the whole pipeline stays
   * SQL-replayable): the seeded IVF coarse quantizer
   * ([[SimilarityIvf.centroids]]/[[SimilarityIvf.assign]]) prunes WHICH
   * vectors are scored (nProbe of nLists inverted lists), and the PQ codes
   * shrink WHAT each list stores to `m` small integers scored by ADC table
   * lookup. At 100 TB this is the only layout where the scan side fits
   * storage budgets AND per-query work is sublinear: cost ≈
   * |corpus| × nProbe/nLists table lookups over m-byte rows.
   *
   * Plan shape: codes = one projection over the assigned corpus (both the
   * assignment's broadcast-centroid max_by and the native PQ argmin are
   * shuffle-free); queries carry their ADC tables through the probe
   * selection; the scan joins codes × broadcast probes on `list_id` and
   * ranks via the k-bounded map-side aggregate. Distances are the same
   * expanded-L2 ADC sums as [[adcKnn]] — bit-deterministic, oracle-gated
   * (`embed_ivfpq_knn`).
   */
  def ivfAdcKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      nLists: Int = 16, nProbe: Int = 4,
      m: Int = 4, ksub: Int = 16, dim: Int = 64): DataFrame = {
    val cents = SimilarityIvf.centroids(corpus, nLists).cache()
    val cb = codebook(corpus, m, ksub, dim)
    val codeCols = (1 to m).map { j =>
      vf.pqCode(subSlice(cb, j), bookW(cb, j), bookSd(cb, j)).as(s"code_$j")
    }
    val codes = SimilarityIvf.assign(corpus, cents)
      .select(col("vec_id") +: col("list_id") +: codeCols: _*)
    val qdt = queries.select(
      Seq(col("vec_id").as("query_id"), col("embedding").as("qe"),
        Similarity.norm("embedding").as("qnorm")) ++
        (1 to m).map(j =>
          vf.pqDists(subSlice(cb, j, "embedding"), bookW(cb, j), bookSd(cb, j)).as(s"dt_$j")): _*)
    val probes = SimilarityIvf.probeLists(qdt, cents, nProbe,
      "query_id" +: (1 to m).map(j => s"dt_$j"))
    val approx = (1 to m)
      .map(j => element_at(col(s"dt_$j"), col(s"code_$j")))
      .reduceLeft(_ + _)
    val scored = codes.join(broadcast(probes), Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), (-approx).as("nscore"))
    Similarity.rankTopK(scored, "nscore", k)
      .select(col("query_id"), col("neighbor_id"), (-col("nscore")).as("adist"), col("rank"))
  }
}
