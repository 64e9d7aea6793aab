package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph centrality over an edge list — the domain-quality signal a
 * web-scale training-data pipeline derives from its crawl's hyperlink
 * structure (CommonCrawl-style host ranking: a page's worth is weighted by
 * the rank of the domains linking to it, and the rank feeds curation as a
 * per-source quality prior alongside Gopher/C4 screens).
 *
 * Two variants share one fixed-point power-iteration core:
 *  - [[pageRank]] (Brin & Page 1998): uniform teleport — global authority;
 *  - [[trustRank]] (Gyöngyi et al. 2004): teleport restricted to a SEED
 *    whitelist — trust propagates outward from vetted domains, the
 *    curation-native variant (score a crawl against a trusted core).
 *
 * Both are ENGINE- AND PARALLELISM-DETERMINISTIC by running entirely in
 * integer fixed point: the unit of mass is 1/`scale` of the graph's total
 * rank. Every step is a LONG (or exact DECIMAL) floor operation —
 * `rank*damp div 10000`, `share*w div outw`, `tele div ns` — so there is no
 * floating-point accumulation anywhere, and any engine that floors
 * nonnegative integer division the same way (Spark `div`, DuckDB `//`)
 * reproduces the ranks bit-for-bit at any executor count. Floors leak
 * O(|E| + iters·|V|) units of mass per iteration (each unit 1e-12 of total
 * rank at the default scale) — ranks are ordinally exact and numerically
 * reproducible, which is the contract that matters for a curation prior.
 *
 * Scale design (the 100 TB shape): per iteration, ONE shuffle of the
 * weighted edge list keyed by dst (the rank-frame join broadcasts when |V|
 * is small and hash-joins otherwise — both sides are keyed frames, no
 * window, no driver collect), plus one scalar aggregate (dangling mass)
 * attached via a 1-row broadcast crossJoin. The edge list is pre-aggregated
 * to (src, dst, w) once — raw multiplicity never re-shuffles — and
 * out-weights are computed once outside the loop. Iteration count is a
 * fixed small constant (the classic 5–20), so lineage stays bounded;
 * lineage is cut every second iteration (see the loop note).
 */
object Graph {

  /**
   * Damped PageRank in integer fixed point (uniform teleport).
   *
   * @param edges  (src STRING, dst STRING) directed edges; multiplicity = weight
   * @param iters  power iterations (fixed, small)
   * @param dampBp damping factor in basis points (8500 = the classic 0.85)
   * @param scale  fixed-point denominator: total graph mass in units
   * @return (domain, rank_fp LONG, rank DOUBLE) — rank = rank_fp/scale, one
   *         IEEE division per output row
   */
  def pageRank(edges: DataFrame, iters: Int = 5, dampBp: Int = 8500,
      scale: Long = 1000000000000L): DataFrame =
    rankCore(edges, None, iters, dampBp, scale)

  /**
   * TrustRank: [[pageRank]] with teleport (and dangling recycle) restricted
   * to `seeds` — a (domain) whitelist frame. Seeds outside the graph's node
   * set are ignored; an empty effective seed set yields all-zero ranks
   * (no teleport source). Ranks measure proximity to the trusted core.
   */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
      dampBp: Int = 8500, scale: Long = 1000000000000L): DataFrame =
    rankCore(edges, Some(seeds), iters, dampBp, scale)

  /**
   * Weakly-connected components of a link graph — the partition a crawl
   * pipeline uses to find isolated site clusters (link farms, walled
   * mirrors) and to shard graph jobs. Edges are treated as undirected;
   * each node gets the MINIMUM reachable node id as its component id.
   *
   * Pure reuse of the dedup component machinery ([[Dedup.clusters]]): the
   * bounded driver union-find below its pair cutoff, the distributed
   * min-label sweep above it — same determinism (exact min over the node-id
   * ordering) and the same 100 TB posture (no transitive-closure join).
   */
  def components(edges: DataFrame): DataFrame =
    // connectivity ignores multiplicity: distinct first, so a corpus-sized
    // edge list (every doc emits its domain links) collapses to <= |V|^2
    // rows BEFORE the component machinery sizes its driver-vs-distributed
    // path — without this a 100 TB crawl's raw links would trip the
    // distributed sweep for a graph whose distinct structure fits anywhere
    Dedup.clusters(edges.select(col("src").as("a"), col("dst").as("b")).distinct())
      .select(col("doc_id").as("domain"), col("cluster_id").as("component_id"))

  /**
   * Per-node triangle counts and local clustering coefficient over the
   * UNDIRECTED simple graph induced by `edges` (direction dropped, self
   * loops and multi-edges collapsed) — the link-farm tell PageRank misses:
   * organic neighborhoods interlink (high clustering), spam rings are
   * near-bipartite stars (triangle-free).
   *
   * Algorithm: degree-ordered orientation (Ortmann/Brandes compact-forward
   * family) — every edge points from its lower `(degree, node)` endpoint to
   * the higher, making the oriented graph acyclic with out-degree bounded
   * by O(√E); wedges are pairs of out-neighbors, closed by one oriented
   * edge lookup. Total wedge count is O(E^1.5) REGARDLESS of skew (a
   * hub's edges all point INTO it, so the hub spawns no wedges) — the
   * property that lets the same plan run on a power-law web graph at
   * 100 TB. All joins shuffle on node keys; nothing data-sized broadcasts.
   *
   * Output `(node, degree, n_triangles, lcc)` for every node, with
   * `lcc = 2·t / (deg·(deg−1))` as one pinned-order double expression
   * (NULL when degree < 2 — no pair of neighbors to close).
   */
  def triangles(edges: DataFrame): DataFrame = {
    // und / deg / oriented are cached (edge- and node-bounded frames, the
    // Frames.cached idiom): the wedge join reads `oriented` THREE times and
    // deg twice, and without the cuts every reference re-executed the whole
    // dedup + degree-join prelude from the raw edge input (188 corpus scans
    // in the driver gate's physical plan; 1 after)
    val und = Frames.cached(edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    val deg = Frames.cached(und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg")))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = Frames.cached(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("lo"),
      when(aFirst, col("b")).otherwise(col("a")).as("hi"),
      when(aFirst, col("db")).otherwise(col("da")).as("dhi")))
    // wedges at lo between order-ranked out-neighbors; closing edge v->w
    // must exist in the SAME orientation (ord(v) < ord(w) by construction)
    val vBeforeW = col("e1.dhi") < col("e2.dhi") ||
      (col("e1.dhi") === col("e2.dhi") && col("e1.hi") < col("e2.hi"))
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.lo") === col("e2.lo") && vBeforeW)
      .select(col("e1.lo").as("u"), col("e1.hi").as("v"), col("e2.hi").as("w"))
      .join(oriented.as("e3"), col("v") === col("e3.lo") && col("w") === col("e3.hi"))
      .select("u", "v", "w")
    val counts = tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.select(col("v").as("node"), col("deg").as("degree"))
      .join(counts, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          (lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double")) /
            (col("degree").cast("double") * (col("degree") - 1).cast("double")))
          .as("lcc"))
  }

  /**
   * k-core of the undirected simple graph induced by `edges`: the nodes
   * surviving `rounds` synchronous peel steps (each step drops every node
   * whose degree among current survivors is < `k`). The k-core is the
   * crawl-graph "dense backbone" — mirror rings and mutually-interlinked
   * spam nets concentrate in high-k cores while organic long-tail sites
   * fall out early, so core membership complements [[pageRank]] (volume of
   * endorsement) and [[triangles]] (local closure) as a third structural
   * curation prior.
   *
   * Determinism: peeling is a monotone set computation — no arithmetic at
   * all beyond integer degree counts — so the result is exact at any
   * parallelism and engine. A FIXED round count (not a driver-side
   * convergence loop) keeps the plan static and the oracle replayable; the
   * peel sequence is monotone decreasing, so once it stabilizes extra
   * rounds are no-ops, and `rounds` only needs to exceed the peel depth
   * (typically tiny: each round must drop ≥1 node to matter, and web-graph
   * peel depths are far below the default 8).
   *
   * Scale design: the bidirected edge list (2·|E| rows, pre-deduped,
   * materialized once) is the only data-sized frame; each round is two
   * node-keyed semi-joins + one count aggregate — no windows, no driver
   * collect, lineage cut per round (the survivor frame is referenced twice
   * in the next round).
   *
   * @return (node, core_deg) for surviving nodes; core_deg is the node's
   *         degree within the final survivor set (≥ k whenever the peel has
   *         stabilized by `rounds`).
   */
  def kcore(edges: DataFrame, k: Int, rounds: Int = 8): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 0 && rounds <= 50, "rounds must be in [0, 50]")
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    // both orientations once: every round's degree count reuses this frame
    val bi = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false)
    var survivors = bi.select(col("u").as("node")).distinct().localCheckpoint(false)
    def degAmong(s: DataFrame): DataFrame = bi
      .join(s.select(col("node").as("u")), Seq("u"))
      .join(s.select(col("node").as("v")), Seq("v"))
      .groupBy("u").agg(count(lit(1)).as("deg"))
    for (_ <- 1 to rounds) {
      survivors = degAmong(survivors)
        .where(col("deg") >= k).select(col("u").as("node"))
        .localCheckpoint(false)
    }
    degAmong(survivors).select(col("u").as("node"), col("deg").as("core_deg"))
  }

  /**
   * Degree assortativity (Newman 2002) of the undirected simple graph:
   * the Pearson correlation of endpoint degrees over all edges, each edge
   * contributing both orientations. Positive r = high-degree nodes link to
   * each other (social/organic webs), negative r = hubs link to leaves
   * (star-shaped link farms, SEO rings) — a one-number structural
   * fingerprint a curation pipeline tracks per crawl snapshot.
   *
   * All five moment sums run EXACT (DECIMAL(38,0) — degrees are bounded by
   * |V| so squares fit 38 digits at any realistic graph), and the final
   * Pearson formula is one pinned-order double expression, so both engines
   * agree bit-for-bit. Zero-variance graphs (every degree equal, e.g. a
   * ring) have undefined r → NULL.
   *
   * Scale: degree frame + one edge-keyed join + a single global aggregate —
   * map-side partial, 1-row result; no windows, no collect.
   */
  def assortativity(edges: DataFrame): DataFrame = {
    // cached like triangles' prelude: und feeds deg, the degree join and
    // the edge-count scalar; joined feeds both union sides of the pair
    // frame — uncut, the gate's plan re-derived the edge list 52 times
    val und = Frames.cached(edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    val deg = Frames.cached(und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg")))
    val joined = Frames.cached(und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b"))
    val pairs = joined.select(col("da").as("x"), col("db").as("y"))
      .union(joined.select(col("db").as("x"), col("da").as("y")))
    val dec = "DECIMAL(38,0)"
    val m = pairs.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"))
    val nNodes = broadcast(deg.agg(count(lit(1)).as("n_nodes")))
    val nEdges = broadcast(und.agg(count(lit(1)).as("n_edges")))
    // exact integer covariance/variance terms, ONE double expression at the end
    m.crossJoin(nNodes).crossJoin(nEdges).select(
      col("n_nodes"), col("n_edges"),
      expr("""CASE WHEN n = 0 OR (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
             |     THEN NULL
             |     ELSE CAST(n * sxy - sx * sy AS DOUBLE)
             |          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             |             * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             |END""".stripMargin).as("assortativity"))
  }

  /**
   * HITS hubs & authorities (Kleinberg 1999) in integer fixed point — the
   * third classical centrality, complementing [[pageRank]]: a node is a good
   * AUTHORITY when good hubs link to it, a good HUB when it links to good
   * authorities. In a crawl-curation pipeline authorities rank content
   * domains while hubs rank link-directory/aggregator domains — the pair
   * separates "worth training on" from "worth crawling from", which a single
   * PageRank conflates.
   *
   * Determinism contract (same as the PageRank core): every step is exact —
   * LONG sums of fixed-point scores weighted by edge multiplicity, then an
   * L1 renormalization `x · scale div Σx` floored in DECIMAL(38,0) — so any
   * engine flooring nonnegative integer division identically (Spark `div`,
   * DuckDB `//`) reproduces the scores bit-for-bit at any parallelism.
   * (Classical HITS normalizes in L2; L1 has the same fixed point up to
   * scaling of the principal eigenvector and stays in integer arithmetic.)
   *
   * Scale design: two dst/src-keyed shuffles of the pre-aggregated edge
   * list per iteration plus two 1-row broadcast scalar totals; no windows,
   * no driver collect; lineage cut each iteration. Overflow-safe by
   * construction: scores ≤ scale after each renormalize, so the raw sums
   * are ≤ scale·max-degree ≪ LONG and the renormalize multiply runs in
   * DECIMAL(38,0).
   *
   * @return (domain, auth_fp LONG, hub_fp LONG, auth DOUBLE, hub DOUBLE)
   */
  def hits(edges: DataFrame, iters: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && iters <= 50, "iters must be in [0, 50]")
    require(scale > 0 && scale <= 1000000000000000L, "scale must fit renorms in DECIMAL(38,0)")
    val w = edges.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .localCheckpoint(false)
    val nodes = w.select(col("src").as("domain"))
      .union(w.select(col("dst").as("domain"))).distinct()
      .localCheckpoint(false)
    val n = broadcast(nodes.agg(count(lit(1)).as("n")))
    // renormalize to the L1 fixed-point grid; total=0 (edgeless half-step)
    // would divide by zero — every score is already 0 then, so emit 0
    def renorm(raw: DataFrame, scoreCol: String): DataFrame = {
      val tot = broadcast(raw.agg(coalesce(sum(col(scoreCol)), lit(0L)).as("tot")))
      raw.crossJoin(tot).select(col("domain"),
        expr(s"CASE WHEN tot = 0 THEN 0L ELSE " +
          s"CAST(CAST($scoreCol AS DECIMAL(38,0)) * ${scale}L div tot AS BIGINT) END")
          .as(scoreCol))
    }
    var hubs = nodes.crossJoin(n)
      .select(col("domain"), expr(s"${scale}L div n").as("hub_fp"))
    var auths = nodes.select(col("domain"), lit(0L).as("auth_fp"))
    for (i <- 1 to iters) {
      // Lineage cut on the RAW half-step frame, BEFORE the renorm (round-14
      // reorder): renorm reads its raw twice (the tot broadcast scalar + the
      // fixed-point projection), so with the cut AFTER the renorm the
      // |V|⋈|E| join+aggregate of every half-step executed TWICE — once
      // inside the broadcast job and again in the consuming pass. Cutting
      // the raw frame keeps the same two jobs per half-step (checkpoint +
      // tot broadcast) but runs the join once; the renorm itself is a lazy
      // narrow projection over the materialized raw, bit-identical floors.
      // (The r13 every-2nd-cadence experiment — fewer jobs, uncut chains —
      // stays rejected: 2x slower at the 20x tier.)
      // auth(v) = Σ_{u→v} hub(u)·w, renormalized to Σ=scale
      val authRaw = nodes.join(
        hubs.as("h").join(w.as("e"), col("h.domain") === col("e.src"))
          .groupBy(col("e.dst").as("domain"))
          .agg(sum(col("h.hub_fp") * col("e.w")).as("auth_fp")),
        Seq("domain"), "left")
        .select(col("domain"), coalesce(col("auth_fp"), lit(0L)).as("auth_fp"))
        .localCheckpoint(false)
      auths = renorm(authRaw, "auth_fp")
      // hub(u) = Σ_{u→v} auth(v)·w over the FRESH authorities
      val hubRaw = nodes.join(
        auths.as("a").join(w.as("e"), col("a.domain") === col("e.dst"))
          .groupBy(col("e.src").as("domain"))
          .agg(sum(col("a.auth_fp") * col("e.w")).as("hub_fp")),
        Seq("domain"), "left")
        .select(col("domain"), coalesce(col("hub_fp"), lit(0L)).as("hub_fp"))
        .localCheckpoint(false)
      hubs = renorm(hubRaw, "hub_fp")
    }
    auths.join(hubs, Seq("domain"))
      .select(col("domain"), col("auth_fp"), col("hub_fp"),
        (col("auth_fp").cast("double") / scale).as("auth"),
        (col("hub_fp").cast("double") / scale).as("hub"))
  }

  private def rankCore(edges: DataFrame, seedsOpt: Option[DataFrame],
      iters: Int, dampBp: Int, scale: Long): DataFrame = {
    require(iters >= 0 && iters <= 50, "iters must be in [0, 50]")
    require(dampBp >= 0 && dampBp <= 10000, "dampBp must be basis points")
    require(scale > 0 && scale <= 1000000000000000L,
      "scale must keep rank*dampBp inside LONG")

    // materialize the weighted edge list ONCE (lazy local checkpoint): the
    // loop references it every iteration, and without the cut the raw-edge
    // aggregation (a corpus-sized scan when edges come from a document
    // table) would re-execute ~3x per iteration
    val w = edges.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .localCheckpoint(false)
    val outw = w.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    // node set from the pre-aggregated edges (not the raw corpus-sized list)
    val nodes = w.select(col("src").as("domain"))
      .union(w.select(col("dst").as("domain"))).distinct()
    // teleport target set: the whole graph (PageRank) or the seed whitelist
    // restricted to known nodes (TrustRank); marked nodes are referenced
    // every iteration, so materialize once
    val seeds = seedsOpt match {
      case Some(s) => s.select(col("domain")).distinct().join(nodes, Seq("domain"))
      case None => nodes
    }
    val marked = nodes
      .join(seeds.select(col("domain"), lit(1L).as("is_seed")), Seq("domain"), "left")
      .select(col("domain"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint(false)
    // |seeds| as a 1-row broadcast scalar: the loop's divisions need it lazily
    val ns = broadcast(marked.agg(sum(col("is_seed")).as("ns")))
    // mass paid to teleport each iteration (exact, computed at plan time)
    val teleTotal = scale - scale * dampBp / 10000

    var ranks = marked.crossJoin(ns)
      .select(col("domain"), col("is_seed"),
        expr(s"CASE WHEN is_seed = 1 THEN ${scale}L div ns ELSE 0L END")
          .as("rank_fp"))
    for (i <- 1 to iters) {
      // damped share of each node's rank; dangling nodes have no out-edges
      val damped = ranks.join(outw, col("domain") === col("src"), "left")
        .select(col("domain"), col("outw"),
          expr(s"rank_fp * $dampBp div 10000").as("rd"))
      // per-edge contribution: rd·w/outw floored in exact DECIMAL(38,0)
      // (rd ≤ scale·dampBp/1e4 ≤ ~8.5e14; ×w never overflows 38 digits)
      val contrib = damped.where(col("outw").isNotNull).as("r")
        .join(w.as("e"), col("r.domain") === col("e.src"))
        .select(col("e.dst").as("domain"),
          expr("CAST(CAST(rd AS DECIMAL(38,0)) * e.w div outw AS BIGINT)").as("c"))
        .groupBy(col("domain")).agg(sum(col("c")).as("lnk"))
      // dangling mass recycles into the teleport set (1-row broadcast scalar)
      val dang = broadcast(damped.where(col("outw").isNull)
        .agg(coalesce(sum(col("rd")), lit(0L)).as("dang")))
      ranks = marked.join(contrib, Seq("domain"), "left")
        .crossJoin(dang).crossJoin(ns)
        .select(col("domain"), col("is_seed"),
          expr(s"(CASE WHEN is_seed = 1 THEN (${teleTotal}L div ns) + (dang div ns) " +
            "ELSE 0L END) + coalesce(lnk, 0L)").as("rank_fp"))
      // truncate lineage every SECOND iteration: each iteration references
      // the previous rank frame three times (contrib, dangling, rejoin), so
      // the plan TREE grows ~3^iters without cuts. Cutting every other
      // iteration bounds the tree at ~9x a single step while halving the
      // materialization jobs (each lazy local checkpoint is one job — the
      // dominant per-iteration constant on small graphs).
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint(false)
    }
    ranks.select(col("domain"), col("rank_fp"),
      (col("rank_fp").cast("double") / scale).as("rank"))
  }

  /**
   * k-hop BFS reachability histogram from a seed set — the crawl-frontier /
   * influence-radius view the fixed-point family (PageRank's stationary
   * mass, components' final partition) cannot give: per seed, how many
   * nodes are FIRST reached at each hop distance ≤ `maxHops`, following
   * out-edges. A mirror network shows its fanout collapsing by hop 2; a
   * healthy crawl keeps discovering. Also the "blast radius" primitive for
   * takedown/poisoning impact questions.
   *
   * Scale: classic synchronous frontier expansion — per hop, ONE join of
   * the current reach frame against the (pre-deduped) edge list on the
   * node key plus a min-hop aggregate; lineage cut per hop (the frame is
   * referenced twice next round). The reach frame is bounded by
   * |seeds|·|V|, the practical cap being maxHops (default 3) — this is
   * the bounded-depth BFS, not transitive closure.
   *
   * @return (seed, hops, n_nodes) — hops 0 is the seed itself; only
   *         non-empty levels appear.
   */
  def khopReach(edges: DataFrame, seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, "maxHops in [1, 8] (bounded-depth BFS)")
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint(false)
    var reach = seeds.select(col("domain").as("seed"),
      col("domain").as("node"), lit(0L).as("hops"))
    for (h <- 1 to maxHops) {
      val frontier = reach.where(col("hops") === (h - 1))
        .join(e, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node"), lit(h.toLong).as("hops"))
      reach = reach.unionByName(frontier)
        .groupBy("seed", "node").agg(min("hops").as("hops"))
        .localCheckpoint(false)
    }
    reach.groupBy("seed", "hops").agg(count(lit(1)).as("n_nodes"))
  }

  /**
   * Directed-graph reciprocity per node — the mutual-linking fingerprint the
   * undirected family (triangles, assortativity) erases: for each node, out-
   * and in-degree over the simple directed graph (self loops and duplicate
   * edges dropped) and how many of its out-edges are reciprocated (the
   * reverse edge exists). Link farms and paid-link rings reciprocate at
   * rates organic citation graphs never reach, so per-node `recip_rate` is a
   * direct ranking prior alongside [[pageRank]]'s volume signal; the
   * edge-weighted global rate is `sum(n_recip) / sum(out_deg)`.
   *
   * Scale: one distinct over the edge list, one self-join on the REVERSED
   * full edge key (both sides shuffle on (src, dst) — no node-keyed hotspot,
   * no broadcast), and node-keyed count aggregates. Every node with any
   * edge appears (out-only nodes via the outer join, in-only with out_deg
   * 0); rates are exact-integer divisions, NULL for in-only nodes.
   *
   * @return (node, out_deg, in_deg, n_recip, recip_rate)
   */
  def reciprocity(edges: DataFrame): DataFrame = {
    // cached: four readers (both reverse-join sides, out/in degree counts)
    val e = Frames.cached(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val recip = e.as("f")
      .join(e.select(col("dst").as("src"), col("src").as("dst")).as("r"), Seq("src", "dst"))
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("n_recip"))
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inDeg = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    outDeg.join(inDeg, Seq("node"), "full_outer")
      .join(recip, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("n_recip"), lit(0L)).as("n_recip"),
        (coalesce(col("n_recip"), lit(0L)).cast("double") /
          nullif(coalesce(col("out_deg"), lit(0L)), lit(0L)).cast("double")).as("recip_rate"))
  }

  /**
   * Log2 in/out-degree histogram of the simple directed graph — the
   * one-glance shape audit every crawl snapshot gets before the rank family
   * runs on it: a power-law out tail says "hub sites" (cap candidates for
   * [[linkPredict]]'s `maxDeg` and the dedup buckets), a spiked in-degree
   * bucket says link farm ([[trustRank]] seed evidence). Same log2-banding
   * idiom as [[graft.operators.Funnel.activityHistogram]], per direction.
   *
   * Scale shape: distinct collapses multi-edges (≤ |V|² rows), then two
   * node-keyed count aggregates and two ≤64-bucket rollups — the degree
   * aggregate is the only data-sized shuffle. Self-loops excluded like the
   * rest of the family.
   *
   * @return (direction 'in'|'out', bucket, min_degree = 2^bucket, n_nodes)
   */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    // cached: the out- and in-direction histograms each scan it
    val e = Frames.cached(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst") && col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    def hist(keyCol: String, direction: String) =
      e.groupBy(col(keyCol).as("node")).agg(count(lit(1)).as("deg"))
        .groupBy((length(bin(col("deg"))) - 1).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(direction).as("direction"), col("bucket"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))").as("min_degree"),
          col("n_nodes"))
    hist("src", "out").unionByName(hist("dst", "in"))
  }

  /**
   * Bipartite CO-VISITATION projection — the item-item affinity graph a
   * recommender / related-content system builds from (user, item)
   * engagement pairs: two items are linked with the count of users who
   * touched both, scored with the exact-integer Jaccard affinity
   * `n_both / (deg_a + deg_b − n_both)`. This is also the co-citation /
   * co-click "related domains" builder for crawl curation.
   *
   * Scale shape: the SAME skew-cap contract as the dedup pair generators —
   * a user who touched k items emits k²/2 pairs, so hub users (crawlers,
   * shared accounts) above `maxUserDeg` distinct items are dropped from
   * PAIR GENERATION only; item degrees always come from the UNCAPPED
   * distinct frame so affinities stay comparable. The pair join shuffles
   * on the user key; the affinity joins shuffle on the item key; output is
   * ≤ items² rows. No corpus-sized broadcast.
   *
   * @return (item_a, item_b, n_both, deg_a, deg_b, affinity) with
   *         item_a < item_b and n_both counting DISTINCT co-visiting users.
   */
  def covisitation(pairs: DataFrame, userCol: String = "user",
                   itemCol: String = "item",
                   maxUserDeg: Long = Long.MaxValue): DataFrame = {
    require(maxUserDeg >= 2, "maxUserDeg >= 2: below that no pair exists")
    // cached: deg, the cap scan and both pair-join sides read the distinct
    // frame; capped itself is read twice by the self-join
    val e = Frames.cached(pairs.select(col(userCol).as("u"), col(itemCol).as("item"))
      .where(col("u").isNotNull && col("item").isNotNull)
      .distinct())
    val deg = Frames.cached(e.groupBy("item").agg(count(lit(1)).as("deg")))
    val capped =
      if (maxUserDeg == Long.MaxValue) e
      else {
        val ok = e.groupBy("u").agg(count(lit(1)).as("ud"))
          .where(col("ud") <= maxUserDeg).select("u")
        Frames.cached(e.join(ok, "u"))
      }
    val co = capped.as("a").join(capped.as("b"),
        col("a.u") === col("b.u") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("n_both"))
    co.join(deg.select(col("item").as("item_a"), col("deg").as("deg_a")), "item_a")
      .join(deg.select(col("item").as("item_b"), col("deg").as("deg_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("deg_a"), col("deg_b"),
        (col("n_both").cast("double") /
          (col("deg_a") + col("deg_b") - col("n_both")).cast("double"))
          .as("affinity"))
  }

  /**
   * Link prediction by common neighborhood over the UNDIRECTED simple graph
   * induced by `edges`: every NON-adjacent node pair sharing at least one
   * neighbor, scored by common-neighbor count and neighbor-set Jaccard —
   * the classical structural-similarity candidates (Liben-Nowell & Kleinberg
   * 2003 family). On a crawl graph these surface mirror candidates and
   * related-site suggestions; on a citation/link graph, missing-edge
   * recommendations. Jaccard over Adamic-Adar deliberately: both rank the
   * same wedge candidates, but Jaccard is a ratio of exact integers
   * (bit-exact in any engine) where Adamic-Adar sums 1/log(deg) floats.
   *
   * Scale design: candidates come from the wedge join on the shared-
   * neighbor key (the [[triangles]] meeting pattern) — a pair is generated
   * only through a common neighbor, never by pairing the node set. A center
   * of degree k spawns C(k,2) wedges, so `maxDeg` drops hub CENTERS from
   * wedge generation (a "follow everyone" aggregator node pairs everything
   * it touches — the same quadratic-blowup guard as the dedup
   * `maxDocFreq`/`maxBucket` caps; the hub still participates as an
   * ENDPOINT through its other neighbors). All joins shuffle on node keys;
   * the only aggregate map-side combines on the (a, b) pair key.
   *
   * @return (a, b, common_neighbors, deg_a, deg_b, jaccard) for candidate
   *         pairs with a < b, jaccard = common / (deg_a + deg_b − common)
   *         as one exact-integer division; existing edges excluded.
   */
  def linkPredict(edges: DataFrame, maxDeg: Long = Long.MaxValue): DataFrame = {
    // cached prelude (triangles' idiom): und is read by bi (twice), the
    // existing-edge anti-join and, via bi, the degree count; centers feeds
    // both wedge-join sides; deg three readers
    val und = Frames.cached(edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    val bi = und.select(col("a").as("v"), col("b").as("n"))
      .union(und.select(col("b").as("v"), col("a").as("n")))
    val deg = Frames.cached(bi.groupBy("v").agg(count(lit(1)).as("deg")))
    val centers = Frames.cached(
      if (maxDeg == Long.MaxValue) bi
      else bi.join(deg.where(col("deg") <= maxDeg).select("v"), "v"))
    val cand = centers.as("e1")
      .join(centers.as("e2"), col("e1.v") === col("e2.v") && col("e1.n") < col("e2.n"))
      .groupBy(col("e1.n").as("a"), col("e2.n").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
      .join(und, Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("v").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a"), col("b"), col("common_neighbors"), col("deg_a"), col("deg_b"),
        (col("common_neighbors").cast("double") /
          (col("deg_a") + col("deg_b") - col("common_neighbors")).cast("double")).as("jaccard"))
  }

  /**
   * Community detection by SYNCHRONOUS label propagation (Raghavan et al.
   * 2007) over the undirected simple graph — the mesoscale complement to
   * [[components]]: components find what is CONNECTED, LPA finds what is
   * DENSELY connected, splitting one giant component into link
   * neighborhoods (topic clusters, mirror farms, CDN constellations) a
   * curation pipeline weights as units.
   *
   * Determinism contract: the classic algorithm breaks frequency ties
   * randomly and updates asynchronously; here every round is a synchronous
   * map over the round-(r−1) labels and ties break (count DESC, label ASC)
   * — a total order, so any engine at any parallelism replays the rounds
   * bit-for-bit. A fixed `rounds` (not convergence) bounds the plan; on
   * bipartite-ish structure synchronous LPA can 2-cycle, which a fixed
   * even/odd horizon simply snapshots — the audit gate pins one horizon.
   *
   * Scale: per round one dst-keyed join of the (pre-aggregated, lineage-cut)
   * bi-directed edge list against the |V|-sized label frame and one
   * (node, label) count — the [[pageRank]] shuffle shape. The per-node
   * argmax window partitions on the node key and sees at most
   * distinct-neighbor-label rows (≤ degree); no corpus-sized window, no
   * driver round-trips.
   *
   * @return (domain, community, community_size) for every non-isolated node.
   */
  def labelPropagation(edges: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 20, "rounds must be in [1, 20]")
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val bi = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false)
    var labels = bi.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint(false)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("cnt").desc, col("lab").asc)
    for (_ <- 1 to rounds) {
      labels = bi.join(labels.select(col("node").as("v"), col("lab")), "v")
        .groupBy("u", "lab").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("u").as("node"), col("lab"))
        .localCheckpoint(false)
    }
    val sizes = labels.groupBy("lab").agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "lab")
      .select(col("node").as("domain"), col("lab").as("community"), col("community_size"))
  }

  /**
   * Bounded HARMONIC CENTRALITY: Σ 1/d(u, v) over nodes within `maxHops`
   * of u on the undirected simple graph — the distance-aware importance
   * [[pageRank]]'s random walk doesn't measure (a node two hops from
   * everything beats a node buried down one long chain, even at equal
   * in-link mass). The hop bound makes it the LOCAL variant (Boldi &
   * Vigna's harmonic truncated at the neighborhood a crawl planner
   * actually acts on) and bounds the computation.
   *
   * Exactness: each hop contributes `60 div hop` — an exact integer for
   * every hop ≤ 5 (60 = lcm 1..5), so the score is an integer sum; the
   * closing `/60` is the only float. Determinism needs no tie-breaks: the
   * min-hop frame is set-valued.
   *
   * Scale: this operates on the DOMAIN graph (the [[Graph]]-family
   * contract — nodes are registrable domains, not documents), where the
   * `maxHops`-neighborhood frame (src, dst, hop) is the product of |V| and
   * the bounded neighborhood size. Each round is one edge-keyed join plus
   * an anti-join against the already-reached set; no corpus-sized frame,
   * no windows.
   *
   * @return (domain, n_reached, harmonic_fp60, harmonic) per non-isolated
   *         node.
   */
  def harmonicCentrality(edges: DataFrame, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1 && maxHops <= 5, "maxHops in [1, 5]: 60 = lcm(1..5)")
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val bi = und.select(col("a").as("u"), col("b").as("v"))
      .union(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false)
    var reached = bi.select(col("u").as("src"), col("v").as("dst"))
      .withColumn("hop", lit(1L)).localCheckpoint(false)
    for (h <- 2 to maxHops) {
      val next = reached.where(col("hop") === (h - 1).toLong)
        .select(col("src"), col("dst").as("u"))
        .join(bi, "u")
        .select(col("src"), col("v").as("dst")).distinct()
        .where(col("src") =!= col("dst"))
        .join(reached.select("src", "dst"), Seq("src", "dst"), "left_anti")
        .withColumn("hop", lit(h.toLong))
      reached = reached.union(next).localCheckpoint(false)
    }
    reached.groupBy(col("src").as("domain"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("60 div hop")).as("harmonic_fp60"))
      .select(col("domain"), col("n_reached"), col("harmonic_fp60"),
        (col("harmonic_fp60").cast("double") / 60.0).as("harmonic"))
  }

  /**
   * MODULARITY (Newman–Girvan Q) of the [[labelPropagation]] partition —
   * the number that says whether the communities LPA found are REAL:
   * Q = Σ_c [ L_c/m − (d_c/2m)² ] over communities, where L_c counts
   * within-community edges, d_c sums member degrees, m = |E| of the simple
   * graph. Q near 0 = no better than random (don't weight by these
   * communities); Q ≳ 0.3 = genuine mesoscale structure. Pairs with the
   * `graph_lpa` gate the way `embed_pc_var` pairs with `embed_top_pc`.
   *
   * Determinism: L_c, d_c, m are exact integers; each community's term is
   * one pinned double expression and the total folds in sorted community
   * order (community count bounds the fold). Scale: one endpoint-labeled
   * join over the simple edge list plus degree/label aggregates — the LPA
   * shuffle shape, nothing new.
   *
   * @return one row: (n_communities, n_edges, modularity)
   */
  def modularity(edges: DataFrame, rounds: Int = 4): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val labels = labelPropagation(edges, rounds)
      .select(col("domain").as("node"), col("community"))
    val m = und.agg(count(lit(1)).as("m"))
    val within = und
      .join(labels.select(col("node").as("a"), col("community").as("ca")), "a")
      .join(labels.select(col("node").as("b"), col("community").as("cb")), "b")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("l_c"))
    val bi = und.select(col("a").as("u")).union(und.select(col("b")))
    val deg = bi.groupBy("u").agg(count(lit(1)).as("deg"))
    val degC = deg.join(labels.withColumnRenamed("node", "u"), "u")
      .groupBy("community").agg(sum("deg").as("d_c"))
    val md = col("m").cast("double")
    val term = coalesce(col("l_c"), lit(0L)).cast("double") / md -
      (col("d_c").cast("double") / (lit(2.0) * md)) *
        (col("d_c").cast("double") / (lit(2.0) * md))
    degC.join(within, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), term.as("term"), col("m"))
      .agg(count(lit(1)).as("n_communities"), max(col("m")).as("n_edges"),
        aggregate(sort_array(collect_list(struct(col("community"), col("term")))),
          lit(0.0), (acc, s) => acc + s.getField("term")).as("modularity"))
  }

  /**
   * PageRank CONVERGENCE audit — the L1 distance between the ranks after
   * `iters − 1` and `iters` power steps: the number that says whether the
   * fixed iteration budget the [[pageRank]] contract runs on has actually
   * settled (delta ≈ teleport-floor noise) or the graph needs more rounds.
   * Both runs are bit-deterministic, so the delta is itself exact.
   *
   * @return one row: (n_nodes, l1_delta_fp, max_delta_fp, l1_delta)
   */
  def pageRankDelta(edges: DataFrame, iters: Int = 5, dampBp: Int = 8500,
                    scale: Long = 1000000000000L): DataFrame =
    pageRankDeltaFrom(pageRank(edges, iters, dampBp, scale),
      edges, iters, dampBp, scale)

  /** [[pageRankDelta]] from an ALREADY-CONVERGED `iters`-step [[pageRank]]
    * frame — the shared-frame entry point: when both the ranks and the
    * convergence audit are served, the `iters` run happens once and the
    * audit only adds the `iters − 1` run (halving the two-full-runs cost
    * the naive composition pays). */
  def pageRankDeltaFrom(current: DataFrame, edges: DataFrame,
                        iters: Int = 5, dampBp: Int = 8500,
                        scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters >= 1")
    val prev = pageRank(edges, iters - 1, dampBp, scale)
      .select(col("domain"), col("rank_fp").as("prev_fp"))
    current
      .select(col("domain"), col("rank_fp"))
      .join(prev, "domain")
      .select(abs(col("rank_fp") - col("prev_fp")).as("dfp"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("dfp")).as("l1_delta_fp"),
        max(col("dfp")).as("max_delta_fp"))
      .withColumn("l1_delta",
        col("l1_delta_fp").cast("double") / lit(scale.toDouble))
  }

  /**
   * Freeman DEGREE CENTRALIZATION of the undirected simple graph — the
   * one-number star-vs-mesh shape test: Σ(d_max − d_i) normalized by the
   * star graph's maximum (n−1)(n−2). 1 = a perfect hub-and-spokes (one
   * domain everything links through — a CDN or a link farm), 0 = every
   * node equal (ring/clique). Complements [[assortativity]] (who links to
   * whom) with how CONCENTRATED the linking is.
   *
   * Exact integers end to end (Σ(d_max − d) = n·d_max − Σd, DECIMAL(38,0)
   * for the product); one closing division, NULL when n < 3 (the
   * normalizer vanishes). One degree aggregate + a 1-row fold.
   *
   * @return one row: (n_nodes, n_edges, max_degree, sum_diff,
   *         centralization)
   */
  def degreeCentralization(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(false)
    val deg = und.select(col("a").as("u")).union(und.select(col("b")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
    val m = und.agg(count(lit(1)).as("n_edges"))
    val sumDiff = (col("n_nodes").cast("decimal(38,0)") * col("max_degree") -
      col("deg_sum")).cast("long")
    deg.agg(count(lit(1)).as("n_nodes"), max(col("deg")).as("max_degree"),
        sum(col("deg")).as("deg_sum"))
      .crossJoin(broadcast(m))
      .select(col("n_nodes"), col("n_edges"), col("max_degree"),
        sumDiff.as("sum_diff"),
        when(col("n_nodes") >= 3L,
          sumDiff.cast("double") /
            ((col("n_nodes") - 1L) * (col("n_nodes") - 2L)).cast("double"))
          .as("centralization"))
  }

  /**
   * Adamic–Adar and resource-allocation link-prediction scores over the
   * same wedge candidates as [[linkPredict]] — the weighted-common-neighbor
   * family (Adamic & Adar 2003; Zhou, Lü & Zhang 2009): a shared neighbor
   * counts MORE when it is selective, AA = Σ_z 1/ln(deg_z) and
   * RA = Σ_z 1/deg_z over the common neighbors z. Jaccard (in
   * [[linkPredict]]) normalizes by the pair's own degrees; AA/RA instead
   * discount hub intermediaries, so the two rankings disagree exactly on
   * hub-mediated pairs — retrieval suites ship both for that reason.
   *
   * Scale design: identical to [[linkPredict]] — candidates only through
   * the wedge join on the shared-neighbor key, hub CENTERS above `maxDeg`
   * dropped from wedge generation (C(k,2) blowup guard), existing edges
   * anti-joined out. All joins shuffle on node keys.
   *
   * Determinism: a wedge center has ≥ 2 neighbors, so deg_z ≥ 2 and
   * 1/ln(deg_z) is finite. Per-pair sums of these doubles are SORTED FOLDS
   * over the pair's collected center degrees ([[TimeSeries.foldAggregator]]
   * contract — the list is bounded by min(deg_a, deg_b), a degree, not the
   * corpus), folding 1/ln(deg) and 1/deg in the same pass; an engine
   * replays both bit-for-bit from the same degree multiset.
   *
   * @return (a, b, common_neighbors, adamic_adar, resource_alloc) for
   *         non-adjacent pairs with a < b sharing ≥ 1 common neighbor.
   */
  def adamicAdar(edges: DataFrame, maxDeg: Long = Long.MaxValue): DataFrame = {
    // cached prelude (the linkPredict idiom): centers feeds both wedge-join
    // sides, und the anti-join — uncut this plan re-derived the edge list
    // 36 times in the driver gate
    val und = Frames.cached(edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct())
    val bi = und.select(col("a").as("v"), col("b").as("n"))
      .union(und.select(col("b").as("v"), col("a").as("n")))
    val deg = bi.groupBy("v").agg(count(lit(1)).as("deg"))
    val centers0 = bi.join(deg, "v")
    val centers = Frames.cached(
      if (maxDeg == Long.MaxValue) centers0
      else centers0.where(col("deg") <= maxDeg))
    val cand = centers.as("e1")
      .join(centers.as("e2"), col("e1.v") === col("e2.v") && col("e1.n") < col("e2.n"))
      .groupBy(col("e1.n").as("a"), col("e2.n").as("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sort_array(collect_list(col("e1.deg"))).as("degs"))
      .join(und, Seq("a", "b"), "left_anti")
    cand.select(col("a"), col("b"), col("common_neighbors"),
      expr("aggregate(degs, 0D, (acc, d) -> acc + 1.0 / ln(CAST(d AS DOUBLE)))").as("adamic_adar"),
      expr("aggregate(degs, 0D, (acc, d) -> acc + 1.0 / CAST(d AS DOUBLE))").as("resource_alloc"))
  }
}
