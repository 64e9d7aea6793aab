package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Round-8 session-4 operators: char-histogram diversity, PMI collocations,
  * group-aware splits, winnowing fingerprints, triangle counting, sweep-line
  * concurrency, and random-projection retrieval. */
class CorpusStatsOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("charDiversity: hand-computed histogram moments; empty and NULL drop") {
    val docs = Seq(
      (1L, "aaaa"),           // 1 distinct, top 4/4, simpson 1
      (2L, "abab"),           // 2 distinct, top 2/4, simpson (4+4)/16
      (3L, "abcd"),           // 4 distinct, top 1/4, simpson 4/16
      (4L, ""),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.charDiversity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((4L, 1L, 1.0, 1.0)))
    assert(out(2L) == ((4L, 2L, 0.5, 0.5)))
    assert(out(3L) == ((4L, 4L, 0.25, 0.25)))
  }

  test("charDiversity: multi-byte code points count as single chars") {
    val docs = Seq((1L, "ééé")).toDF("doc_id", "text")
    val r = TextAnalysis.charDiversity(docs).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L && r.getDouble(3) == 1.0)
  }

  test("pmiBigrams: exclusive pairs outrank promiscuous ones; counts exact") {
    // "x y" always adjacent and exclusive -> lift N/(c1*c2) maximal;
    // "the a" pairs are diluted by other "the"/"a" uses
    val rows = (1 to 5).map(i => (i.toLong, "x y the a the b the a x y")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiBigrams(rows, minCount = 5L, topK = 10).collect()
    val byGram = out.map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // per doc: 10 words -> 9 pairs, so N = 45; "x y" count 10, c1(x)=10, c2(y)=10
    assert(byGram("x y") == ((10L, 10L, 10L, 45L, (10.0 * 45.0) / (10.0 * 10.0))))
    // top gram is the exclusive collocation
    assert(out.head.getString(0) == "x y")
  }

  test("groupSplit: every group lands in exactly one split; fallback is source-scoped") {
    val docs = (1L to 200L).map { i =>
      val text = if (i % 3 == 0) s"doc $i see https://host${i % 5}.example.com/p/$i end"
                 else s"doc $i with no link"
      (i, s"src${i % 4}", text)
    }.toDF("doc_id", "source", "text")
    val out = Curation.groupSplit(docs).cache()
    // leakage guard: no group key spans two splits
    val spanning = out.groupBy("group_key")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1).count()
    assert(spanning == 0L)
    // linked docs group by host; unlinked docs fall back to source-scoped shards
    val keys = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(3L) == "host3.example.com")
    assert(keys(1L) == "src1:1")
    // all three splits occur over enough groups
    assert(out.select("split").distinct().count() == 3L)
    out.unpersist()
  }

  test("winnow: shared substrings >= k+w-1 chars guarantee a shared fingerprint") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, s"AAAA $base BBBB"),
      (2L, s"XXXXXXX $base YYY"), // same long substring, different offsets
      (3L, "completely unrelated content with no overlap whatsoever in here")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnow(docs, gramLen = 12, window = 16)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    val f3 = fps.filter(_._1 == 3L).map(_._2).toSet
    assert((f1 & f2).nonEmpty)   // winnowing guarantee
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty)
  }

  test("winnow: short docs yield one fingerprint; sub-gram docs none") {
    val docs = Seq(
      (1L, "exactly12chr"),          // 12 chars -> 1 gram -> 1 fp
      (2L, "elevenchars"),           // 11 chars -> none
      (3L, "eighteen characters ok") // < k+w-1 -> single overall min
    ).toDF("doc_id", "text")
    val byDoc = Dedup.winnow(docs).collect().groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1 && !byDoc.contains(2L) && byDoc(3L).length == 1)
  }

  test("winnowPairs: planted copy pairs with its source; minShared filters noise") {
    val base = (1 to 30).map(i => s"word$i token$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, s"prefix shift $base"), // copy under an offset
      (3L, "some other document entirely different from the rest of them all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, minShared = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("triangles: hand-counted K4-minus-an-edge; direction and multi-edges collapse") {
    // undirected: a-b, a-c, a-d, b-c, b-d (K4 minus c-d) -> triangles abc, abd
    val edges = Seq(
      ("a", "b"), ("b", "a"), // multi-edge + reverse collapses
      ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("e", "e") // self loop drops
    ).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((3L, 2L)) && out("b") == ((3L, 2L)))
    assert(out("c") == ((2L, 1L)) && out("d") == ((2L, 1L)))
    assert(!out.contains("e")) // isolated after the self-loop drop
    val lcc = Graph.triangles(edges).collect()
      .map(r => r.getString(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(lcc("a").contains(2.0 * 2.0 / (3.0 * 2.0)))
    assert(lcc("c").contains(1.0))
  }

  test("triangles: triangle-free star has zero triangles and zero lcc") {
    val edges = Seq(("hub", "s1"), ("hub", "s2"), ("hub", "s3")).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => (r.getString(0), r.getLong(2), Option(r.get(3)))).toList
    assert(out.forall(_._2 == 0L))
    assert(out.find(_._1 == "hub").get._3.contains(0.0)) // degree 3, lcc 0
    assert(out.find(_._1 == "s1").get._3.isEmpty)        // degree 1 -> NULL
  }

  test("concurrency: hand-built overlap, midnight straddle, and hour-boundary carry") {
    val h = 3600000L
    val day = 86400000L
    // u1: one session 01:00-03:30 day0 (events 1h apart, gap 2h keeps them one)
    // u2: one session 02:00-02:10 day0 (overlaps u1 -> peak 2)
    // u3: session 23:30 day0 - 00:30 day1 (straddles midnight)
    val ev = Seq(
      (1L, 1L * h, "u1"), (2L, 2L * h, "u1"), (3L, 3L * h + 1800000L, "u1"),
      (4L, 2L * h, "u2"), (5L, 2L * h + 600000L, "u2"),
      (6L, day - 1800000L, "u3"), (7L, day + 1800000L, "u3")
    ).toDF("event_id", "ts_ms", "user_id")
    val out = Sessionize.concurrency(ev, "user_id", "ts_ms", "event_id", gapMs = 2L * h)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // day0: 3 segments (u1, u2, u3-part), peak 2 (u1+u2 overlap 02:00-02:10)
    assert(out(0L)._1 == 3L && out(0L)._3 == 2L)
    // day1: u3's continuation segment only, peak 1 from 00:00
    assert(out(1L)._1 == 1L && out(1L)._3 == 1L)
    // active ms: u1 2.5h, u2 10min, u3 30min on day0 (all inclusive +1)
    assert(out(0L)._2 == (2L * h + 1800000L + 600000L + 1800000L - 1L + 3L))
    // day1: 30min inclusive of ts 0
    assert(out(1L)._2 == 1800000L + 1L)
  }

  test("concurrency: simultaneous end+start at one ms never double-counts") {
    // u1 ends at t, u2's session starts at t+1: -1 orders before +1 at t+1
    val ev = Seq(
      (1L, 1000L, "u1"), (2L, 2000L, "u1"),
      (3L, 2001L, "u2"), (4L, 3000L, "u2")
    ).toDF("event_id", "ts_ms", "user_id")
    val out = Sessionize.concurrency(ev, "user_id", "ts_ms", "event_id", gapMs = 5000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) == 1L)
  }

  test("rpProject: exact signed grid sums; proj is proj_fp / 2^20") {
    val e = Seq((0L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val rows = Similarity.rpProject(e).collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      // all-ones vector: proj_fp = sum of signs * 2^20 -> multiple of 2^20,
      // and |sum of 64 ±1 signs| <= 64
      assert(r.getLong(2) % (1L << 20) == 0L)
      assert(math.abs(r.getLong(2) / (1L << 20)) <= 64L)
      assert(r.getDouble(3) == r.getLong(2).toDouble / (1L << 20).toDouble)
    }
  }

  test("rpKnn: recovers cluster neighbors of a separated corpus (recall vs exact)") {
    val vecs = (0 until 40).map { i =>
      val c = i / 10
      val v = Array.tabulate(64)(d => if (d / 16 == c) 1.0f else 0.02f * ((i * d) % 7))
      (i.toLong, v)
    }
    val e = vecs.toDF("vec_id", "embedding")
    val q = e.where(col("vec_id") % 10 === 0) // one query per cluster
    val ann = Similarity.rpKnn(e, q, k = 5)
    val exact = Similarity.bruteForceKnn(e, q, k = 5)
    val recalls = Similarity.recallReport(ann, exact).collect()
      .map(r => r.getDouble(3))
    assert(recalls.forall(_ >= 0.8), s"recalls: ${recalls.mkString(",")}")
  }

  test("pmiBigrams: minCount floors rare pairs out") {
    val docs = Seq((1L, "p q p q p q p q"), (2L, "r s")).toDF("doc_id", "text")
    val grams = TextAnalysis.pmiBigrams(docs, minCount = 4L, topK = 10)
      .collect().map(_.getString(0)).toSet
    assert(grams.contains("p q") && !grams.contains("r s"))
  }
}
