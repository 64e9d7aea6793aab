package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Fixed-point PageRank: hand-computed ranks, mass conservation, weighting,
  * and parallelism determinism. */
class GraphSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def ranksOf(out: Array[org.apache.spark.sql.Row]): Map[String, Long] =
    out.map(r => r.getString(0) -> r.getLong(1)).toMap

  test("one iteration matches the hand-computed fixed-point arithmetic") {
    // A -> B, B dangling. scale=10000: r0 = 5000 each; rd = 4250 each;
    // tele div 2 = 750; dangling 4250 div 2 = 2125; A->B carries 4250.
    val edges = Seq(("A", "B")).toDF("src", "dst")
    val r = ranksOf(Graph.pageRank(edges, iters = 1, scale = 10000L).collect())
    assert(r == Map("A" -> (750L + 2125L), "B" -> (750L + 2125L + 4250L)))
  }

  test("zero iterations = uniform mass; floors conserve mass within leak bound") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "A"), ("C", "D")).toDF("src", "dst")
    val r0 = ranksOf(Graph.pageRank(edges, iters = 0).collect())
    assert(r0.values.toSet == Set(1000000000000L / 4))
    val iters = 7
    val r = ranksOf(Graph.pageRank(edges, iters = iters).collect())
    val leakBound = iters.toLong * (4 /*edges*/ + 2 * 4 /*per-node floors*/ + 2)
    assert(r.values.sum <= 1000000000000L)
    assert(r.values.sum >= 1000000000000L - leakBound)
  }

  test("edge multiplicity weights the split; heavier target ranks higher") {
    // A links B twice and C once; B and C both link back to A.
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "A"), ("C", "A"))
      .toDF("src", "dst")
    val r = ranksOf(Graph.pageRank(edges, iters = 10).collect())
    assert(r("B") > r("C"))
    assert(r("A") > r("B")) // everyone's sole out-target
  }

  test("ranks are bit-identical across parallelism (pure integer arithmetic)") {
    val edges = (0L until 600L)
      .map(i => (s"d${i % 23}", s"d${(i * 7 + 3) % 19}")).toDF("src", "dst")
    def run(df: DataFrame) =
      Graph.pageRank(df, iters = 5).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(run(edges) == run(edges.repartition(13)))
  }

  test("randomized: mass conserved within the leak bound; row order irrelevant") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val nNodes = 5 + rnd.nextInt(20)
      val nEdges = 10 + rnd.nextInt(80)
      val edges = Seq.fill(nEdges)((s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}"))
      val iters = 4
      val df = edges.toDF("src", "dst")
      val r = Graph.pageRank(df, iters = iters).collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      // each iteration floors once per weighted edge, once per node for
      // teleport + dangling shares, once for the damp multiply
      val leakBound = iters.toLong * (nEdges + 3L * nNodes + 2)
      assert(r.values.sum <= 1000000000000L, s"trial $trial: mass grew")
      assert(r.values.sum >= 1000000000000L - leakBound,
        s"trial $trial: leaked ${1000000000000L - r.values.sum} > bound $leakBound")
      // permuting the edge-list rows must not change a single rank unit
      val shuffled = scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(7)
      val r2 = Graph.pageRank(shuffled, iters = iters).collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap
      assert(r2 == r, s"trial $trial: edge order changed ranks")
    }
  }

  test("trustRank: teleport only reaches seeds; unreachable nodes rank 0") {
    // C -> A -> B with seeds {A}: C gets NO teleport and no in-links -> 0;
    // B is downstream of the trusted core and accumulates damped mass
    val edges = Seq(("C", "A"), ("A", "B")).toDF("src", "dst")
    val seeds = Seq("A").toDF("domain")
    val r = ranksOf(Graph.trustRank(edges, seeds, iters = 5).collect())
    assert(r("C") == 0L)
    assert(r("A") > 0L && r("B") > 0L)
    assert(r("A") + r("B") > 999999999900L) // mass stays in the trusted cone
  }

  test("trustRank: unknown seeds are ignored; empty effective set -> all zero") {
    val edges = Seq(("A", "B")).toDF("src", "dst")
    val r = ranksOf(Graph.trustRank(edges,
      Seq("A", "nope").toDF("domain"), iters = 2).collect())
    // same as seeds = {A}: teleport denominator 1
    val rA = ranksOf(Graph.trustRank(edges, Seq("A").toDF("domain"), iters = 2).collect())
    assert(r == rA)
    val rz = ranksOf(Graph.trustRank(edges,
      Seq("ghost").toDF("domain"), iters = 2).collect())
    assert(rz.values.forall(_ == 0L))
  }

  test("trustRank with seeds = all nodes equals pageRank exactly") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "A"), ("A", "C")).toDF("src", "dst")
    val seeds = Seq("A", "B", "C").toDF("domain")
    assert(ranksOf(Graph.trustRank(edges, seeds, iters = 4).collect()) ==
      ranksOf(Graph.pageRank(edges, iters = 4).collect()))
  }

  test("dangling sink still receives teleport + in-link mass") {
    val edges = Seq(("A", "sink"), ("B", "A"), ("A", "B")).toDF("src", "dst")
    val r = ranksOf(Graph.pageRank(edges, iters = 5).collect())
    assert(r("sink") > 0L)
    assert(r.values.sum > 990000000000L) // dangling mass recycled, not lost
  }

  private def hitsOf(out: Array[org.apache.spark.sql.Row]): Map[String, (Long, Long)] =
    out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits: one iteration matches the hand-computed L1 fixed point") {
    // A->B, A->C, D->B. h0 = 3000 each (scale 12000). auth raw: B = 6000,
    // C = 3000, tot 9000 -> B 8000, C 4000. hub raw: A = 12000, D = 8000,
    // tot 20000 -> A 7200, D 4800.
    val edges = Seq(("A", "B"), ("A", "C"), ("D", "B")).toDF("src", "dst")
    val h = hitsOf(Graph.hits(edges, iters = 1, scale = 12000L).collect())
    assert(h == Map(
      "A" -> (0L, 7200L), "D" -> (0L, 4800L),
      "B" -> (8000L, 0L), "C" -> (4000L, 0L)))
  }

  test("hits: hub/authority separation on a directory-vs-content graph") {
    // hub1/hub2 each link all three content nodes; content links nothing.
    val edges = (for (h <- Seq("hub1", "hub2"); c <- Seq("c1", "c2", "c3"))
      yield (h, c)).toDF("src", "dst")
    val h = hitsOf(Graph.hits(edges, iters = 3).collect())
    Seq("hub1", "hub2").foreach { n => assert(h(n)._2 > 0L && h(n)._1 == 0L, n) }
    Seq("c1", "c2", "c3").foreach { n => assert(h(n)._1 > 0L && h(n)._2 == 0L, n) }
    // symmetric roles share the score exactly (no float drift to break ties)
    assert(h("hub1") == h("hub2"))
    assert(h("c1") == h("c2") && h("c2") == h("c3"))
  }

  test("hits: edge multiplicity weights the authority; L1 mass bounded by scale") {
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "C")).toDF("src", "dst")
    val h = hitsOf(Graph.hits(edges, iters = 2).collect())
    assert(h("B")._1 > h("C")._1)
    assert(h.values.map(_._1).sum <= 1000000000000L)
    assert(h.values.map(_._2).sum <= 1000000000000L)
  }

  test("components: disconnected subgraphs get distinct min-label ids; edges undirected") {
    // triangle {a1,a2,a3} and a directed chain z1->z2->z3 (undirected closure
    // must still unite the chain), plus a 2-cycle {m1,m2}
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
      ("z1", "z2"), ("z2", "z3"),
      ("m2", "m1")).toDF("src", "dst")
    val c = Graph.components(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(c("a1") == "a1" && c("a2") == "a1" && c("a3") == "a1")
    assert(c("z1") == "z1" && c("z2") == "z1" && c("z3") == "z1")
    assert(c("m1") == "m1" && c("m2") == "m1")
    assert(c.values.toSet.size == 3)
  }

  test("hits: scores bit-identical under edge-order permutation and repartition") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}"))
    def run(df: DataFrame) = Graph.hits(df, iters = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run(edges.toDF("src", "dst")) ==
      run(scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(13)))
  }

  test("degreeHistogram: log2 bands over the simple graph; loops and dups collapse") {
    // simple graph after cleanup: A->B, A->C, B->C (dup A->B and loop C->C drop)
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "C"), ("B", "C"), ("C", "C"))
      .toDF("src", "dst")
    val out = Graph.degreeHistogram(edges).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // out: A deg 2 (bucket 1), B deg 1 (bucket 0); in: B deg 1, C deg 2
    assert(out == Map(
      ("out", 0L) -> ((1L, 1L)), ("out", 1L) -> ((2L, 1L)),
      ("in", 0L) -> ((1L, 1L)), ("in", 1L) -> ((2L, 1L))))
    assert(Graph.degreeHistogram(Seq.empty[(String, String)].toDF("src", "dst"))
      .count() == 0)
  }

  test("covisitation: exact co-counts and Jaccard; hub cap drops pair generation only") {
    // u1 touches {a,b,c} (twice each — distinct collapses), u2 {a,b}, u3 {c}
    val pairs = Seq(
      ("u1", "a"), ("u1", "a"), ("u1", "b"), ("u1", "c"),
      ("u2", "a"), ("u2", "b"), ("u3", "c")).toDF("user", "item")
    val out = Graph.covisitation(pairs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 2L && ab.getLong(3) == 2L && ab.getLong(4) == 2L)
    assert(ab.getDouble(5) == 1.0) // 2 / (2 + 2 - 2)
    assert(out(("a", "c")).getDouble(5) == 1.0 / 3)
    // cap=2 drops u1 from PAIR GENERATION; degrees stay uncapped, so the
    // surviving (a,b) pair reads 1 / (2 + 2 - 1)
    val capped = Graph.covisitation(pairs, maxUserDeg = 2L).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(capped.keySet == Set(("a", "b")))
    assert(capped(("a", "b")).getLong(2) == 1L)
    assert(capped(("a", "b")).getDouble(5) == 1.0 / 3)
  }

  test("LPA: triangle converges to the min label; star 2-cycles on the even horizon") {
    def labs(out: Array[org.apache.spark.sql.Row]): Map[String, (String, Long)] =
      out.map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    // triangle: r1 ties resolve to min, r2/r3 flood 'a' everywhere
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val t = labs(Graph.labelPropagation(tri, rounds = 4).collect())
    assert(t == Map("a" -> ("a", 3L), "b" -> ("a", 3L), "c" -> ("a", 3L)))
    // star h-(l1,l2,l3): synchronous labels 2-cycle (h<->l1); the even
    // horizon snapshots h=h, leaves=l1 — pinned so the oracle replay and
    // any parallelism agree on the same snapshot
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    val s = labs(Graph.labelPropagation(star, rounds = 4).collect())
    assert(s("h") == ("h", 1L))
    assert(Seq("l1", "l2", "l3").forall(l => s(l) == ("l1", 3L)))
    // parallelism determinism: same answer at 1 shuffle partition
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try assert(labs(Graph.labelPropagation(star, rounds = 4).collect()) == s)
    finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("harmonicCentrality: hand-computed lcm-60 scores on a path graph") {
    // a-b-c-d-e: from a (3 hops) reach b@1 c@2 d@3 -> 60+30+20 = 110;
    // from c reach b,d@1 a,e@2 -> 2*60 + 2*30 = 180
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")).toDF("src", "dst")
    val out = Graph.harmonicCentrality(path, maxHops = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == ((3L, 110L, 110.0 / 60.0)))
    assert(out("c") == ((4L, 180L, 3.0)))
    assert(out("e") == out("a"), "path symmetry")
    // hop bound: e is 4 hops from a -> absent from each other's reach
    assert(out("a")._1 == 3L && !out.contains("zz"))
  }

  test("modularity: two bridged triangles score the hand-computed Q") {
    // LPA(4) splits {a,b,c} / {d,e,f}; m=7, L_c=3 each, d_c=7 each:
    // Q = 2 * (3/7 - (7/14)^2)
    val g = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")).toDF("src", "dst")
    val r = Graph.modularity(g, rounds = 4).collect().head
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Long]("n_edges") == 7L)
    val t = 3.0 / 7.0 - (7.0 / 14.0) * (7.0 / 14.0)
    assert(r.getAs[Double]("modularity") == 0.0 + t + t)
    // one clique = one community: Q = 1/1 - 1 = 0 exactly
    val k3 = Seq(("x", "y"), ("y", "z"), ("x", "z")).toDF("src", "dst")
    val r2 = Graph.modularity(k3, rounds = 4).collect().head
    assert(r2.getAs[Long]("n_communities") == 1L)
    assert(r2.getAs[Double]("modularity") == 0.0)
  }

  test("degreeCentralization: star = 1, clique = 0, tiny graph = NULL") {
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    val s = Graph.degreeCentralization(star).collect().head
    assert(s.getAs[Long]("n_nodes") == 4L && s.getAs[Long]("n_edges") == 3L)
    assert(s.getAs[Long]("max_degree") == 3L && s.getAs[Long]("sum_diff") == 6L)
    assert(s.getAs[Double]("centralization") == 1.0)
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("src", "dst")
    val t = Graph.degreeCentralization(tri).collect().head
    assert(t.getAs[Double]("centralization") == 0.0)
    val pair = Seq(("a", "b")).toDF("src", "dst")
    val p = Graph.degreeCentralization(pair).collect().head
    assert(p.isNullAt(p.fieldIndex("centralization")), "n < 3 has no normalizer")
  }

  test("pageRankDelta: hand-computed L1 distance between iterations 0 and 1") {
    // A -> B at scale 10000: r0 = (5000, 5000), r1 = (2875, 7125)
    // (the one-iteration fixture above) -> |dfp| = 2125 each
    val edges = Seq(("A", "B")).toDF("src", "dst")
    val r = Graph.pageRankDelta(edges, iters = 1, scale = 10000L).collect().head
    assert(r.getAs[Long]("n_nodes") == 2L)
    assert(r.getAs[Long]("l1_delta_fp") == 4250L)
    assert(r.getAs[Long]("max_delta_fp") == 2125L)
    assert(r.getAs[Double]("l1_delta") == 4250.0 / 10000.0)
  }
}
