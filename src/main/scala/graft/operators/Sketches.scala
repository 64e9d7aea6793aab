package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable cardinality / frequency SKETCHES, built deterministically so a
 * SQL oracle can replay them bit-for-bit — the approximate-state family a
 * 100 TB pipeline runs where exact distinct counts and exact per-key
 * frequency tables stop fitting anywhere: "how many distinct users per
 * surface" (KMV, HLL) and "how often does THIS key occur" (count-min),
 * each with an exact audit column so the sketch's error is measured, not
 * guessed.
 *
 * Reference behavior: Timely exposes only exact aggregations
 * (`server/src/main/java/timely/server/store/cache/` keeps raw points);
 * these sketches are the beyond-the-reference scale path for the same
 * "how big is this key" questions, per the training-data-pipeline brief.
 *
 * Determinism design shared by all three:
 *  - the randomness is md5 (engine-portable, already the repo-wide idiom);
 *    hex-digit arithmetic turns prefixes into integers (the
 *    [[TimeSeries.seriesShard]] / bloom `hex5` polynomial on the DuckDB
 *    side, `conv()` on the Spark side) — no engine RNG anywhere;
 *  - every accumulation is exact-integer or a SORTED double fold
 *    (the [[TimeSeries.foldAggregator]] contract); closing estimates are
 *    ONE pinned IEEE expression shared verbatim with the oracle.
 *
 * Scale design: all three sketches are MERGEABLE by construction — KMV
 * merges by keeping the k smallest of a union, HLL by register-wise max,
 * CMS by counter-wise sum — which is exactly what Spark's partial/final
 * aggregation does for min-k windows, `max`, and `count`. No operator here
 * ever sorts or windows a corpus-sized frame: KMV pre-prunes per
 * (key, 64-shard) before the per-key pick, HLL and CMS aggregate straight
 * to bounded frames (keys x 256 registers / depth x width counters).
 */
object Sketches {

  /** 2^60 as an exact double — the normalization constant for a 15-hex-digit
    * (60-bit) md5 prefix read as a uniform fraction of [0,1). */
  private val TwoPow60: Double = 1152921504606846976.0d

  /** 60-bit integer value of the first 15 hex digits of md5(prefix:elem) —
    * uniform on [0, 2^60), engine-portable, collision-safe far past any
    * per-key distinct count a sketch would meet (k-min collisions are part
    * of the modeled sketch error in any case). */
  private def h60(prefix: String, elem: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(prefix + ":"), elem.cast("string"))), 1, 15),
      16, 10).cast("long")

  /**
   * KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct-count estimate
   * per key: keep the k smallest distinct 60-bit element hashes; if fewer
   * than k exist the count is EXACT (n_held), else the k-th minimum m̂
   * estimates the density and `est = (k-1) · 2^60 / m̂`.
   *
   * Scale: the min-k state is built in two bounded levels — rank inside
   * (key, h mod 64) shards first (each shard sort sees ~distinct/64 rows),
   * then rank the ≤ 64·k survivors per key — the sharded top-k shape from
   * [[Search]]; no per-key corpus sort exists. `exact_distinct` is the
   * AUDIT column (a plain count-distinct pass the sketch itself never
   * needs; at true 100 TB scale you'd drop it and keep only the estimate).
   *
   * @return (key, n_held, kth_h, est_distinct, exact_distinct)
   */
  def kmvDistinct(df: DataFrame, keyCol: String, elemCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, "k >= 2: the estimator divides by the k-th minimum")
    // NULL elements carry no identity: excluded everywhere (and from the
    // audit count — countDistinct skips NULLs natively), which also keeps
    // the rank windows off engine-specific NULL ordering.
    val nn = df.where(col(elemCol).isNotNull)
    val hashed = nn.select(col(keyCol), h60("kmv", col(elemCol)).as("h")).distinct()
    val shardW = Window.partitionBy(col(keyCol), pmod(col("h"), lit(64L)))
      .orderBy(col("h"))
    val keyW = Window.partitionBy(col(keyCol)).orderBy(col("h"))
    val kept = hashed
      .withColumn("sr", row_number().over(shardW)).where(col("sr") <= k)
      .withColumn("rk", row_number().over(keyW).cast("long")).where(col("rk") <= k)
    val exact = nn.groupBy(col(keyCol))
      .agg(countDistinct(col(elemCol)).as("exact_distinct"))
    kept.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_held"), max(col("h")).as("kth_h"))
      .select(col(keyCol), col("n_held"), col("kth_h"),
        when(col("n_held") < k, col("n_held").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) /
            col("kth_h").cast("double"))
          .as("est_distinct"))
      .join(exact, keyCol)
  }

  /** HLL registers per key: bucket = first-byte value of md5 (m = 256),
    * rho = 61 − bitlength(60-bit remainder) (rank of the first set bit;
    * an all-zero remainder reads bitlength('0') = 1 → rho 60 — the pinned
    * convention both engines share via conv/bin string length). Registers
    * are `max(rho)` — the mergeable HLL state. */
  def hllRegisters(df: DataFrame, keyCol: String, elemCol: String): DataFrame = {
    val h = md5(concat(lit("hll:"), col(elemCol).cast("string")))
    df.where(col(elemCol).isNotNull).select(col(keyCol),
        conv(substring(h, 1, 2), 16, 10).cast("long").as("bucket"),
        (lit(61L) - length(conv(substring(h, 3, 15), 16, 2)).cast("long")).as("rho"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max(col("rho")).as("m_reg"))
  }

  /**
   * HyperLogLog (Flajolet et al. 2007) distinct estimate per key over the
   * [[hllRegisters]] state, m = 256 one-byte buckets: the RAW estimator
   * `α_m · m² / Σ 2^−M_j` with absent buckets contributing 2^0 = 1 (added
   * as one exact term, not 256 float adds). No small/large-range
   * correction — the raw estimator is the pinned contract and the exact
   * audit column shows its bias directly (document-scale keys sit well
   * inside the raw regime; a production deployment would add the linear-
   * counting branch below 2.5·m).
   *
   * Determinism: each 2^−M term is an exact power of two; their per-key sum
   * is a SORTED fold (≤ 256 values), and α_m, m², and the closing division
   * are one pinned IEEE expression shared with the oracle.
   *
   * Scale: the corpus collapses to ≤ keys × 256 register rows in one
   * map-side-combined aggregate; everything after is tiny. Register-wise
   * max makes the state mergeable across corpora/days for free.
   *
   * @return (key, n_buckets, est_distinct, exact_distinct)
   */
  def hllDistinct(df: DataFrame, keyCol: String, elemCol: String): DataFrame = {
    val regs = hllRegisters(df, keyCol, elemCol)
      .withColumn("term", pow(lit(2.0), -col("m_reg").cast("double")))
    val exact = df.where(col(elemCol).isNotNull).groupBy(col(keyCol))
      .agg(countDistinct(col(elemCol)).as("exact_distinct"))
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
    regs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_buckets"),
        expr("aggregate(sort_array(collect_list(term)), 0D, (acc, v) -> acc + v)")
          .as("sum_present"))
      .select(col(keyCol), col("n_buckets"),
        (alphaM2 / (col("sum_present") +
          (lit(256L) - col("n_buckets")).cast("double"))).as("est_distinct"))
      .join(exact, keyCol)
  }

  /**
   * STREAMING HLL — [[hllDistinct]] for an unbounded stream: per key, the
   * 256 one-byte registers carried in `flatMapGroupsWithState`, one
   * updated (key, n_buckets, est_distinct) row per key per micro-batch,
   * estimates INCLUDING the batch (so a one-batch stream reproduces the
   * batch operator bit-for-bit — the [[Anomaly.zscoreStreamFlags]]
   * equivalence contract, pinned by spec).
   *
   * The per-element arithmetic replays the batch op exactly: md5 of
   * "hll:<elem>", byte-0 bucket, rho = 61 − bitlength of the 60-bit
   * remainder, register max; the estimate sums the present registers'
   * 2^−M terms in ASCENDING order (the sorted fold) before the one
   * absent-bucket addition and the pinned α·m² close.
   *
   * Scale: state is 256 bytes per key — the smallest useful distinct-count
   * state there is; register-wise max makes restarts/backfills safe to
   * merge. Works on a batch frame too (state starts empty — the spec's
   * harness).
   */
  def hllStream(df: DataFrame, keyCol: String, elemCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.where(col(elemCol).isNotNull)
      .select(col(keyCol).cast("string"), col(elemCol).cast("string"))
      .as[(String, String)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Array[Byte]]) =>
          val regs = state.getOption.getOrElse(new Array[Byte](256))
          rows.foreach { case (_, elem) =>
            val hex = java.security.MessageDigest.getInstance("MD5")
              .digest(("hll:" + elem).getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            val bucket = Integer.parseInt(hex.substring(0, 2), 16)
            val y = java.lang.Long.parseLong(hex.substring(2, 17), 16)
            val bits = if (y == 0L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(y)
            val rho = (61 - bits).toByte
            if (rho > regs(bucket)) regs(bucket) = rho
          }
          state.update(regs)
          val present = regs.filter(_ > 0)
          val nBuckets = present.length.toLong
          val sumPresent = present.map(m => math.pow(2.0, -m.toDouble))
            .sorted.foldLeft(0.0)(_ + _)
          val alphaM2 = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
          val est = alphaM2 / (sumPresent + (256L - nBuckets).toDouble)
          Iterator.single((key, nBuckets, est))
      }
      .toDF(keyCol, "n_buckets", "est_distinct")
  }

  /**
   * Streaming q-digest — [[qdigestQuantiles]]'s bucket counts held as
   * `flatMapGroupsWithState` per-key state (64 longs = 512 bytes), emitting
   * the current p50/p95/p99 estimates after every micro-batch. The update
   * IS the merge (bucket-wise addition), so restarts, backfills, and
   * batch-unions of saved state are the same operation; the estimates are
   * bit-identical to the batch operator's on the same prefix of data (the
   * spec pins this): the JVM scaling below reproduces Spark's
   * DECIMAL(18,4) HALF_UP cast digit-for-digit, and
   * `64 - numberOfLeadingZeros` is `length(bin(sv))`.
   *
   * Works on a batch frame too (state starts empty — the spec's harness).
   */
  def qdigestStream(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[Array[Long]]) =>
          val counts = state.getOption.getOrElse(new Array[Long](64))
          rows.foreach { case (_, v) =>
            // Spark's double -> DECIMAL(18,4) cast: canonical string value,
            // HALF_UP at scale 4; unscaled value IS the * 10000 integer
            val sv = java.math.BigDecimal.valueOf(v)
              .setScale(4, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
            val b = if (sv <= 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(sv)
            counts(b) += 1L
          }
          state.update(counts)
          val n = counts.sum
          def estAt(q: Double): Double = {
            val target = math.ceil(q * n).toLong
            var cum = 0L
            var b = 0
            var found = -1
            while (b < 64 && found < 0) {
              cum += counts(b)
              if (counts(b) > 0 && cum >= target) found = b
              b += 1
            }
            ((1L << found) - 1).toDouble / 10000.0
          }
          val nBuckets = counts.count(_ > 0).toLong
          Iterator.single((key, n, nBuckets, estAt(0.50), estAt(0.95), estAt(0.99)))
      }
      .toDF(keyCol, "n_points", "n_buckets", "p50_est", "p95_est", "p99_est")
  }

  /** Count-min counter table: `depth` salted hash rows x `width` buckets,
    * exact integer counts — the mergeable CMS state (counter-wise sum).
    * Bucket = first-5-hex-digit value of md5(salt:elem) mod width (the
    * bloom `hex5` arithmetic, so the oracle replays it digit-by-digit). */
  def cmsCounters(df: DataFrame, elemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2 && width <= 1048576,
      "depth in [1,8], width in [2,2^20] (5 hex digits address 2^20 buckets)")
    df.where(col(elemCol).isNotNull)
      .select(col(elemCol), explode(sequence(lit(0), lit(depth - 1))).as("salt"))
      .select(col("salt"),
        pmod(conv(substring(md5(concat(col("salt").cast("string"), lit(":"),
          col(elemCol).cast("string"))), 1, 5), 16, 10).cast("long"),
          lit(width.toLong)).as("bucket"))
      .groupBy(col("salt"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /**
   * Count-min (Cormode & Muthukrishnan 2005) frequency estimates for the
   * exact top-`nCandidates` elements: build the depth×width counter table,
   * then read each candidate's `min` across its depth cells. CMS
   * guarantees `cms_n >= exact_n` (only over-count from collisions) — the
   * spec pins that invariant; the exact column is the audit.
   *
   * Scale: the counter build is ONE aggregate over a depth-fold of the
   * corpus (map-side combined into ≤ depth·width cells); candidates come
   * from a distributed TakeOrdered top-k (per-partition heads, never a
   * global sort), and the probe joins k·depth cells against the BROADCAST
   * counter table.
   *
   * @return (elem, exact_n, cms_n) for the top candidates,
   *         ties broken by element id ascending.
   */
  def cmsTopK(df: DataFrame, elemCol: String, depth: Int = 4,
      width: Int = 1024, nCandidates: Int = 20): DataFrame = {
    val counters = cmsCounters(df, elemCol, depth, width)
    val cand = df.where(col(elemCol).isNotNull).groupBy(col(elemCol))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col(elemCol).asc)
      .limit(nCandidates)
    cand
      .select(col(elemCol), col("exact_n"),
        explode(sequence(lit(0), lit(depth - 1))).as("salt"))
      .select(col(elemCol), col("exact_n"), col("salt"),
        pmod(conv(substring(md5(concat(col("salt").cast("string"), lit(":"),
          col(elemCol).cast("string"))), 1, 5), 16, 10).cast("long"),
          lit(width.toLong)).as("bucket"))
      .join(broadcast(counters), Seq("salt", "bucket"))
      .groupBy(col(elemCol), col("exact_n"))
      .agg(min(col("c")).as("cms_n"))
  }

  /**
   * Mergeable quantile sketch (q-digest-lite, Shrivastava et al. 2004
   * family): per key, counts over power-of-2 buckets of the DECIMAL(18,4)-
   * scaled value — at most 64 longs of state per key, merged by plain
   * addition, so partial aggregation, cross-partition merge, and cross-day
   * sketch unions are all the SAME operation (the property the exact
   * nearest-rank path in [[graft.operators.Summarization]] lacks: its sorted
   * ranks don't merge). The p-quantile estimate is the upper bound
   * `2^b - 1` (scaled back) of the first bucket whose cumulative count
   * reaches `ceil(p·n)` — a one-sided estimate with value error < 2x
   * (one bucket) by construction, for non-negative inputs.
   *
   * Scale: one corpus-sized keyed group-by builds the bucket counts
   * (map-side combined to ≤ 64 rows per key per partition); the cumulative
   * scan then runs over ≤ 64 rows per key — the window is bucket-bounded,
   * never corpus-sized. The audit columns (`rank_le_p*`: exact count at or
   * below each estimate, proving rank(est) ≥ target) cost one more scan of
   * the corpus against the broadcast per-key estimates; at true 100 TB
   * you'd drop them and keep the sketch, like KMV's `exact_distinct`.
   *
   * @return (key, n_points, n_buckets, p50_est, p95_est, p99_est,
   *         rank_le_p50, rank_le_p95, rank_le_p99)
   */
  def qdigestQuantiles(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val sv = (col(valueCol).cast("decimal(18,4)") * 10000).cast("long")
    val scaled = df.select(col(keyCol).as("key"), sv.as("sv"))
    val bucket = when(col("sv") <= 0L, 0L)
      .otherwise(length(bin(col("sv"))).cast("long"))
    val counts = scaled.groupBy(col("key"), bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("key")
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def bq(p: Double): Column =
      min(when(col("cum") >= ceil(lit(p) * col("n")), col("bucket")))
    val perKey = cum.groupBy("key")
      .agg(max(col("n")).as("n_points"),
        count(lit(1)).as("n_buckets"),
        bq(0.50).as("b50"), bq(0.95).as("b95"), bq(0.99).as("b99"))
    def ub(b: String): Column =
      expr(s"shiftleft(cast(1 as bigint), cast($b as int))") - 1L
    val est = perKey.select(col("key"), col("n_points"), col("n_buckets"),
      ub("b50").as("ub50"), ub("b95").as("ub95"), ub("b99").as("ub99"))
    scaled.join(broadcast(est), Seq("key"))
      .groupBy(col("key"))
      .agg(max(col("n_points")).as("n_points"),
        max(col("n_buckets")).as("n_buckets"),
        (max(col("ub50")).cast("double") / 10000.0).as("p50_est"),
        (max(col("ub95")).cast("double") / 10000.0).as("p95_est"),
        (max(col("ub99")).cast("double") / 10000.0).as("p99_est"),
        count(when(col("sv") <= col("ub50"), 1)).as("rank_le_p50"),
        count(when(col("sv") <= col("ub95"), 1)).as("rank_le_p95"),
        count(when(col("sv") <= col("ub99"), 1)).as("rank_le_p99"))
  }

  /**
   * AMS "tug-of-war" F2 sketch (Alon–Matias–Szegedy 1996): estimates the
   * second frequency moment Σ_x f(x)² — the SELF-JOIN SIZE of a key column,
   * the number that prices any key-equijoin or skew-cap decision at 100 TB
   * (F2 IS the row count of T ⋈_key T). State is `r` LONG counters; every
   * element occurrence adds s_j(x) = ±1 (md5 first-hex-digit parity,
   * engine-portable — no RNG) to counter j, so the state merges by plain
   * addition: Spark's partial/final aggregation IS the sketch merge.
   * E[c_j²] = F2; the estimate is the LOWER MEDIAN of the r squared
   * counters — pinned as ascending (c², j) order, element (r+1)/2 — and the
   * exact F2 rides along as the audit column.
   *
   * Scale: one scan exploded ×r straight into a partial aggregate (map-side
   * combine absorbs the blowup; the shuffle carries r×partitions rows), an
   * r-row final state, and one hash-groupBy audit pass. The only window
   * orders the r-row counter frame.
   *
   * @return one row: (r, est_f2, exact_f2, n_rows). The two F2 columns are
   *         emitted as DOUBLE (internal math stays DECIMAL(38,0) so the
   *         squares can't overflow LONG): an estimate tolerates the 53-bit
   *         mantissa, and a raw decimal output column false-mismatches the
   *         driver's hash compare (pandas Decimal vs DuckDB float64).
   */
  def amsF2(df: DataFrame, elemCol: String, r: Int = 16): DataFrame = {
    require(r >= 2 && r <= 256, "r in [2, 256]")
    val nn = df.where(col(elemCol).isNotNull)
    val signed = nn
      .select(explode(sequence(lit(0), lit(r - 1))).as("j"),
        col(elemCol).cast("string").as("e"))
      .select(col("j"),
        when(conv(substring(md5(concat(lit("ams"), col("j").cast("string"),
          lit(":"), col("e"))), 1, 1), 16, 10).cast("int") < 8, 1L)
          .otherwise(-1L).as("s"))
    // DECIMAL(38,0) squares: the counter c is bounded by row count, so at
    // 100 TB c*c (and certainly sum(f*f)) overflow LONG — same convention as
    // dispersionIndex / seasonalAnomaly (cast BEFORE the multiply/sum).
    val est = signed.groupBy("j").agg(sum(col("s")).as("c"))
      .select(col("j"),
        (col("c").cast("decimal(38,0)") * col("c")).as("e2"))
    // r rows: the global window is bounded by construction
    val w = Window.orderBy(col("e2").asc, col("j").asc)
    val med = est.withColumn("rn", row_number().over(w))
      .where(col("rn") === (r + 1) / 2).select(col("e2").as("est_f2"))
    val exact = nn.groupBy(col(elemCol)).agg(count(lit(1)).as("f"))
      .agg(sum(col("f").cast("decimal(38,0)") * col("f")).as("exact_f2"),
        sum(col("f")).cast("long").as("n_rows"))
    med.crossJoin(exact)
      .select(lit(r.toLong).as("r"), col("est_f2").cast("double").as("est_f2"),
        col("exact_f2").cast("double").as("exact_f2"), col("n_rows"))
  }

  /**
   * KMV SET-INTERSECTION estimates between every pair of keys — the theta-
   * sketch set operation the distinct-count family builds toward: "how
   * many users do surfaces A and B share" for every pair, WITHOUT a
   * corpus-sized pairwise distinct join. Per key keep the k smallest
   * distinct element hashes; for a pair, θ = min of the two sketches'
   * thresholds (a not-full sketch's threshold is 2⁶⁰ — it saw everything),
   * and `est = |S_A ∩ S_B ∩ {h < θ}| · 2⁶⁰ / θ` — the standard theta
   * estimator, fully deterministic given the md5 hashes. `exact_overlap`
   * is the audit column (the very pairwise distinct join the sketch
   * replaces; at true 100 TB you drop it).
   *
   * Scale: the sketch build is the [[kmvDistinct]] two-level rank; the
   * pair join runs SKETCH×SKETCH (≤ keys·k rows a side, hash-keyed), and
   * the pair frame is keys² — the operator's contract is a bounded key
   * space (surfaces, event types), like the [[graft.operators.Funnel]]
   * transition matrix.
   *
   * @return (key_a, key_b, n_common, theta, est_overlap, exact_overlap)
   *         for every unordered key pair.
   */
  def kmvIntersect(df: DataFrame, keyCol: String, elemCol: String,
                   k: Int = 256): DataFrame = {
    require(k >= 2, "k >= 2")
    val full = 1152921504606846976L // 2^60
    val nn = df.where(col(elemCol).isNotNull)
    val hashed = nn.select(col(keyCol).as("key"), h60("kmv", col(elemCol)).as("h"))
      .distinct()
    val shardW = Window.partitionBy(col("key"), pmod(col("h"), lit(64L)))
      .orderBy(col("h"))
    val keyW = Window.partitionBy("key").orderBy(col("h"))
    // kept (≤ keys·k rows) is cached: the theta aggregate and both common-
    // join sides re-executed the two-level rank prune (and its corpus scan)
    // per reference; elems likewise feeds both exact-audit join sides
    val kept = Frames.cached(hashed
      .withColumn("sr", row_number().over(shardW)).where(col("sr") <= k)
      .withColumn("rk", row_number().over(keyW)).where(col("rk") <= k)
      .select("key", "h"))
    val thetas = kept.groupBy("key")
      .agg(count(lit(1)).as("n_held"), max(col("h")).as("kth"))
      .select(col("key"),
        when(col("n_held") < k, lit(full)).otherwise(col("kth")).as("theta"))
    val pairs = Frames.cached(
      thetas.as("ta").join(thetas.as("tb"), col("ta.key") < col("tb.key"))
        .select(col("ta.key").as("key_a"), col("tb.key").as("key_b"),
          least(col("ta.theta"), col("tb.theta")).as("theta")))
    val common = kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.key") < col("b.key"))
      .select(col("a.key").as("key_a"), col("b.key").as("key_b"), col("a.h").as("h"))
      .join(pairs, Seq("key_a", "key_b"))
      .where(col("h") < col("theta"))
      .groupBy("key_a", "key_b").agg(count(lit(1)).as("n_common"))
    val elems = Frames.cached(
      nn.select(col(keyCol).as("key"), col(elemCol).as("e")).distinct())
    val exact = elems.as("a").join(elems.as("b"),
        col("a.e") === col("b.e") && col("a.key") < col("b.key"))
      .groupBy(col("a.key").as("key_a"), col("b.key").as("key_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    pairs
      .join(common, Seq("key_a", "key_b"), "left")
      .join(exact, Seq("key_a", "key_b"), "left")
      .select(col("key_a"), col("key_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"), col("theta"),
        (coalesce(col("n_common"), lit(0L)).cast("double") * lit(TwoPow60) /
          col("theta").cast("double")).as("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
  }

  /**
   * KMV theta-sketch SET ALGEBRA per key pair — the UNION and both
   * DIFFERENCES beside [[kmvIntersect]]'s overlap, i.e. the full audience
   * Venn from the same k-min sketches: below the pair threshold
   * θ = min(θ_A, θ_B), the retained hashes are a uniform θ/2⁶⁰ sample of
   * EACH set, so with nₐ = |{h∈A : h<θ}|, n_b likewise and n_c the common
   * count, the standard theta estimators are
   *
   *   |A ∪ B| ≈ (nₐ + n_b − n_c)·2⁶⁰/θ      |A \ B| ≈ (nₐ − n_c)·2⁶⁰/θ
   *
   * ("how many users do A and B cover together", "how many does A bring
   * that B lacks" — the incremental-reach questions). Exact audit columns
   * ride along (at true 100 TB you drop them).
   *
   * Scale: identical to [[kmvIntersect]] — sketches are ≤ k rows per key
   * (two-level rank prune, no global funnel), the pair join runs
   * SKETCH×SKETCH, exact audits are one distinct + one hash-join pass.
   * Everything up to the two export divisions is integer-exact.
   *
   * @return (key_a, key_b, theta, n_a, n_b, n_common, est_union,
   *         est_diff_a, est_diff_b, exact_union, exact_diff_a,
   *         exact_diff_b) for every key pair (key_a < key_b).
   */
  def kmvSetOps(df: DataFrame, keyCol: String, elemCol: String,
                k: Int = 256): DataFrame = {
    require(k >= 2, "k >= 2")
    val full = 1152921504606846976L // 2^60
    val nn = df.where(col(elemCol).isNotNull)
    val hashed = nn.select(col(keyCol).as("key"), h60("kmv", col(elemCol)).as("h"))
      .distinct()
    val shardW = Window.partitionBy(col("key"), pmod(col("h"), lit(64L)))
      .orderBy(col("h"))
    val keyW = Window.partitionBy("key").orderBy(col("h"))
    // kept is read FOUR times (thetas, n_a, n_b, both common sides) and
    // pairs five — cached like kmvIntersect's, so the rank prune and the
    // theta pair join execute once each instead of per consumer
    val kept = Frames.cached(hashed
      .withColumn("sr", row_number().over(shardW)).where(col("sr") <= k)
      .withColumn("rk", row_number().over(keyW)).where(col("rk") <= k)
      .select("key", "h"))
    val thetas = kept.groupBy("key")
      .agg(count(lit(1)).as("n_held"), max(col("h")).as("kth"))
      .select(col("key"),
        when(col("n_held") < k, lit(full)).otherwise(col("kth")).as("theta"))
    val pairs = Frames.cached(
      thetas.as("ta").join(thetas.as("tb"), col("ta.key") < col("tb.key"))
        .select(col("ta.key").as("key_a"), col("tb.key").as("key_b"),
          least(col("ta.theta"), col("tb.theta")).as("theta")))
    // per-pair below-theta sample sizes for EACH side (sketch-bounded joins)
    val nA = pairs.join(kept.as("ka"), col("ka.key") === col("key_a"))
      .where(col("ka.h") < col("theta"))
      .groupBy("key_a", "key_b").agg(count(lit(1)).as("n_a"))
    val nB = pairs.join(kept.as("kb"), col("kb.key") === col("key_b"))
      .where(col("kb.h") < col("theta"))
      .groupBy("key_a", "key_b").agg(count(lit(1)).as("n_b"))
    val common = kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.key") < col("b.key"))
      .select(col("a.key").as("key_a"), col("b.key").as("key_b"), col("a.h").as("h"))
      .join(pairs, Seq("key_a", "key_b"))
      .where(col("h") < col("theta"))
      .groupBy("key_a", "key_b").agg(count(lit(1)).as("n_common"))
    // exact audits from per-key distinct counts + the exact overlap
    val elems = Frames.cached(
      nn.select(col(keyCol).as("key"), col(elemCol).as("e")).distinct())
    val sizes = elems.groupBy("key").agg(count(lit(1)).as("nd"))
    val exactOv = elems.as("a").join(elems.as("b"),
        col("a.e") === col("b.e") && col("a.key") < col("b.key"))
      .groupBy(col("a.key").as("key_a"), col("b.key").as("key_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    val est = (c: Column) => c.cast("double") * lit(TwoPow60) / col("theta").cast("double")
    pairs
      .join(nA, Seq("key_a", "key_b"), "left")
      .join(nB, Seq("key_a", "key_b"), "left")
      .join(common, Seq("key_a", "key_b"), "left")
      .join(sizes.select(col("key").as("key_a"), col("nd").as("nd_a")), Seq("key_a"))
      .join(sizes.select(col("key").as("key_b"), col("nd").as("nd_b")), Seq("key_b"))
      .join(exactOv, Seq("key_a", "key_b"), "left")
      .select(col("key_a"), col("key_b"), col("theta"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        est(coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))
          - coalesce(col("n_common"), lit(0L))).as("est_union"),
        est(coalesce(col("n_a"), lit(0L)) - coalesce(col("n_common"), lit(0L)))
          .as("est_diff_a"),
        est(coalesce(col("n_b"), lit(0L)) - coalesce(col("n_common"), lit(0L)))
          .as("est_diff_b"),
        (col("nd_a") + col("nd_b") - coalesce(col("exact_overlap"), lit(0L)))
          .as("exact_union"),
        (col("nd_a") - coalesce(col("exact_overlap"), lit(0L))).as("exact_diff_a"),
        (col("nd_b") - coalesce(col("exact_overlap"), lit(0L))).as("exact_diff_b"))
  }

  /**
   * STREAMING count-min — [[cmsCounters]] carried as
   * `flatMapGroupsWithState` state, completing the streaming-sketch family
   * ([[hllStream]], [[qdigestStream]]): each SALT LANE is its own state
   * group (`width` longs — 8 KB at the default 1024), updated by the exact
   * batch hash (`md5("salt:elem")` first-5-hex bucket) and emitting the
   * tracked probes' per-lane counts after every micro-batch. The CMS
   * estimate is the MIN across the `depth` lanes — one tiny groupBy on
   * this output (the spec pins one-batch == [[cmsTopK]] equivalence).
   *
   * The update IS the merge (counter-wise addition), so restarts,
   * backfills, and unions of saved lane states are the same operation.
   * Works on a batch frame too (state starts empty — the spec's harness).
   *
   * @param probes the fixed elements to report each batch (a monitoring
   *               watchlist — CMS answers point queries, not top-k).
   * @return streaming (salt, probe, cms_n) — min over salt per probe is
   *         the frequency estimate.
   */
  def cmsStream(df: DataFrame, elemCol: String, probes: Seq[String],
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2 && width <= 1048576,
      "depth in [1,8], width in [2,2^20]")
    require(probes.nonEmpty, "empty probe watchlist")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    def bucketOf(salt: Int, elem: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest((salt.toString + ":" + elem).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (Integer.parseInt(hex.substring(0, 5), 16) % width + width) % width
    }
    val probeList = probes.toList
    val ds = df.where(col(elemCol).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("salt"),
        col(elemCol).cast("string").as("e"))
      .as[(Int, String)]
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (salt: Int, rows: Iterator[(Int, String)], state: GroupState[Array[Long]]) =>
          val c = state.getOption.getOrElse(new Array[Long](width))
          rows.foreach { case (_, e) => c(bucketOf(salt, e)) += 1L }
          state.update(c)
          probeList.iterator.map(p => (salt, p, c(bucketOf(salt, p))))
      }
      .toDF("salt", "probe", "cms_n")
  }

  /**
   * ROLLING distinct actors per (group, day) via MERGEABLE HLL registers —
   * the 100 TB scale path for [[graft.operators.Funnel.rollingUniques]]:
   * the exact op shuffles every distinct (group, day, id) row seven times,
   * which at billions of actors is the dominant cost; here each (group,
   * day) collapses to ≤ 256 one-byte registers FIRST (map-side combined),
   * and the trailing window is a register-wise MAX over ≤ 7×256 rows per
   * output cell — the window merge costs the same at any actor
   * cardinality. Same register/rho convention as [[hllDistinct]] (m = 256)
   * PLUS the standard small-range correction that operator deliberately
   * omits: when the raw estimate ≤ 2.5·m and empty registers remain, the
   * LINEAR-COUNTING estimate m·ln(m/zeros) applies (Flajolet et al. §4) —
   * rolling windows routinely sit below 2.5·m where the raw estimator is
   * uselessly biased. The branch predicate compares identically-pinned
   * doubles so both engines pick the same branch, and the estimate (its
   * one libm `ln`) quantizes to DECIMAL(18,6) like the BM25 family's ln
   * terms. The EXACT rolling count rides beside as the standing audit.
   *
   * @return (group, day, n_buckets, est_rolling, exact_rolling) for days
   *         the group has events.
   */
  def rollingHllUniques(events: DataFrame, keyCol: String, tsMsCol: String,
      idCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays >= 1")
    val day = expr(
      s"$tsMsCol div 86400000 - (CASE WHEN $tsMsCol % 86400000 < 0 THEN 1 ELSE 0 END)")
    val h = md5(concat(lit("hll:"), col(idCol).cast("string")))
    val dayRegs = events.where(col(idCol).isNotNull)
      .select(col(keyCol), day.as("day"),
        conv(substring(h, 1, 2), 16, 10).cast("long").as("bucket"),
        (lit(61L) - length(conv(substring(h, 3, 15), 16, 2)).cast("long")).as("rho"))
      .groupBy(col(keyCol), col("day"), col("bucket"))
      .agg(max(col("rho")).as("m_reg"))
    val rolled = dayRegs
      .select(col(keyCol),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1L))).as("day"),
        col("bucket"), col("m_reg"))
      .groupBy(col(keyCol), col("day"), col("bucket"))
      .agg(max("m_reg").as("m_reg"))
      .withColumn("term", pow(lit(2.0), -col("m_reg").cast("double")))
    val alphaM2 = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
    val raw = alphaM2 / (col("sum_present") +
      (lit(256L) - col("n_buckets")).cast("double"))
    val zeros = (lit(256L) - col("n_buckets")).cast("double")
    val corrected = when(raw <= lit(640.0d) && col("n_buckets") < 256L,
        lit(256.0d) * log(lit(256.0d) / zeros))
      .otherwise(raw)
    val est = rolled.groupBy(col(keyCol), col("day"))
      .agg(count(lit(1)).as("n_buckets"),
        expr("aggregate(sort_array(collect_list(term)), 0D, (acc, v) -> acc + v)")
          .as("sum_present"))
      .select(col(keyCol), col("day"), col("n_buckets"),
        corrected.cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .cast("double").as("est_rolling"))
    val exact = graft.operators.Funnel.rollingUniques(
      events, keyCol, tsMsCol, idCol, windowDays)
    est.join(exact.select(col(keyCol), col("day"), col("rolling_uniques")),
        Seq(keyCol, "day"))
      .select(col(keyCol), col("day"), col("n_buckets"), col("est_rolling"),
        col("rolling_uniques").as("exact_rolling"))
  }
}
