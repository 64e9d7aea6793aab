package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Dedup / text-analysis / similarity operators on planted fixtures. */
class PipelineOpsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  private val base = "the quick brown fox jumps over the lazy dog again and again today"

  test("exact dedup groups identical texts under min doc_id") {
    val d = Dedup.exact(docs(1L -> "same text here", 2L -> "same text here", 3L -> "other text entirely"))
      .orderBy("keep_doc_id").collect()
    assert(d.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH surfaces a planted near-duplicate pair") {
    val nearDup = base.replace("dog", "cat") // one word changed
    val out = Dedup.minhashLsh(docs(1L -> base, 2L -> nearDup, 3L -> "completely unrelated words about spark engines"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists { case (a, b, est) => a == 1L && b == 2L && est >= 0.5 })
    assert(!out.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("minhash LSH bucket cap drops hot-bucket pairs, keeps small-bucket pairs") {
    val spam = (0L until 5L).map(i => i -> "identical boilerplate spam block repeated everywhere verbatim")
    val pair = Seq(10L -> base, 11L -> base.replace("dog", "cat"))
    val d = docs(spam ++ pair: _*)
    val uncapped = Dedup.minhashLsh(d).select("a", "b").as[(Long, Long)].collect().toSet
    val capped = Dedup.minhashLsh(d, maxBucket = 3L).select("a", "b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((10L, 11L)) && uncapped.exists(_._1 < 5L))
    // the 5-identical-doc buckets exceed the cap -> their pairs vanish; the
    // 2-doc near-dup bucket survives untouched
    assert(capped.contains((10L, 11L)))
    assert(!capped.exists { case (a, b) => a < 5L || b < 5L })
  }

  test("PII redaction replaces emails/IPs/phones and counts them; clean text untouched") {
    val out = TextAnalysis.redactPii(docs(
      1L -> "mail a.b+c@corp.example.org now from 192.168.1.10 or call +49 123 45678",
      2L -> "no pii in this perfectly ordinary sentence"))
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1 && out(1L).getLong(2) == 1 && out(1L).getLong(3) == 1)
    assert(out(1L).getString(4) == "mail <EMAIL> now from <IP> or call <PHONE>")
    assert(out(2L).getLong(1) == 0 && out(2L).getString(4) == "no pii in this perfectly ordinary sentence")
  }

  test("curation: budget cut is a per-language quality prefix; sample is stable") {
    val d = docs(
      1L -> "the and is of to in it you that was good words here now then",   // en, long
      2L -> "the and is of to good",                                          // en, short
      3L -> "der die und ist das ein nicht mit sich auf")                     // de
    val budget = Curation.tokenBudget(d, 16)
      .select("lang_guess", "doc_id", "cum_words").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // en: best-quality doc first; second en doc would exceed 16 words -> cut
    assert(budget.exists { case (l, id, _) => l == "en" && id == 1L })
    assert(!budget.exists { case (_, id, _) => id == 2L })
    assert(budget.exists { case (l, id, _) => l == "de" && id == 3L })
    // deterministic hash sample: same predicate -> same rows, and a 4/16
    // threshold keeps a strict, stable subset
    val kept1 = d.where(Curation.hashSample(4)).select("doc_id").collect().toSeq
    val kept2 = d.where(Curation.hashSample(4)).select("doc_id").collect().toSeq
    assert(kept1 == kept2)
    assert(d.where(Curation.hashSample(16)).count() == 3) // 16/16 keeps all
  }

  test("stratified sample keeps per-language fractions deterministically") {
    val d = docs(
      1L -> "the cat and the dog of a house",       // en
      2L -> "the dog and the cat of a house",       // en
      3L -> "der hund und die katze ist nicht da")  // de
    // en rate 0/16 -> no en docs survive; others (de) keep 16/16
    val none = Curation.stratifiedSample(d, Map("en" -> 0))
      .select("doc_id").as[Long].collect().toSet
    assert(none == Set(3L))
    // full rates keep everything, and repeat runs are identical
    val all1 = Curation.stratifiedSample(d, Map.empty).select("doc_id").as[Long].collect().toSet
    val all2 = Curation.stratifiedSample(d, Map.empty).select("doc_id").as[Long].collect().toSet
    assert(all1 == Set(1L, 2L, 3L) && all1 == all2)
  }

  test("near-dup clusters: transitive pairs collapse to min-id components") {
    // 1-2-3 is a chain (transitive), 10-11 a pair, 20-21-22-23 a star on 20;
    // docs with no pairs don't appear
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 23L),
        (30L, 30L)) // a self-pair must still label itself on BOTH paths
      .toDF("a", "b")
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L)
    // driver union-find path (pairs below the cutoff)
    assert(Dedup.clusters(pairs).as[(Long, Long)].collect().toMap == expected)
    // distributed sweep path (cutoff forced below any size) must label identically
    assert(Dedup.clusters(pairs, driverCutoff = -1L).as[(Long, Long)].collect().toMap == expected)
    // an empty pair set yields an empty (not crashing) cluster frame
    assert(Dedup.clusters(Seq.empty[(Long, Long)].toDF("a", "b")).isEmpty)
    assert(Dedup.clusters(Seq.empty[(Long, Long)].toDF("a", "b"), driverCutoff = -1L).isEmpty)
    // NULL ids are excluded identically on both paths (no NPE, no divergence)
    val withNulls = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(5L)),
      (Option(6L), Option.empty[Long])).toDF("a", "b")
    val viaDriver = Dedup.clusters(withNulls).as[(Long, Long)].collect().toMap
    val viaSweep = Dedup.clusters(withNulls, driverCutoff = -1L).as[(Long, Long)].collect().toMap
    assert(viaDriver == Map(1L -> 1L, 2L -> 1L) && viaDriver == viaSweep)
    // clusters() must not destroy a cache the caller owns
    val mine = Seq((1L, 2L)).toDF("a", "b").cache()
    mine.count()
    Dedup.clusters(mine).count()
    assert(mine.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "caller-owned cache was unpersisted")
    mine.unpersist()
  }

  test("string-id clusters: driver min-label ordering matches Spark's (UTF-8 bytes)") {
    // "￿" sorts BELOW U+10000 in UTF-8 byte order (Spark's min) but
    // ABOVE it in UTF-16 code-unit order (Java compareTo) — the component's
    // label depends on getting this right
    val hi = new String(Character.toChars(0x10000)) // UTF-16: D800 DC00; UTF-8: F0 90 80 80
    val pairs = Seq(("￿", hi)).toDF("a", "b")       // U+FFFF: UTF-16 FFFF; UTF-8 EF BF BF
    assert("￿".compareTo(hi) > 0, "fixture: Java UTF-16 order must DISAGREE with UTF-8")
    val viaDriver = Dedup.clusters(pairs).as[(String, String)].collect().toMap
    val viaSweep = Dedup.clusters(pairs, driverCutoff = -1L).as[(String, String)].collect().toMap
    assert(viaDriver == viaSweep, s"driver $viaDriver != sweep $viaSweep")
    assert(viaDriver.values.toSet == Set("￿"), "min label must be the UTF-8-smallest id")
  }

  test("substringSpans finds arbitrary-offset repeats that chunk-aligned passage dedup misses") {
    // a 15-token span shared by two docs at DIFFERENT offsets (3 vs 7):
    // every 10-word chunk of either doc mixes shared and unshared tokens, so
    // passageDedup sees no duplicated chunk — the exact-substring pass must
    val shared = (1 to 15).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $shared x1 x2 x3 x4 x5 x6 x7",
      2L -> s"b1 b2 b3 b4 b5 b6 b7 $shared y1 y2 y3")
    val chunked = Dedup.passageDedup(d, wordsPerChunk = 10, maxDocFreq = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chunked == Map(1L -> 0L, 2L -> 0L),
      "fixture must straddle the chunk grid: passage dedup removes nothing")
    val spans = Dedup.substringSpans(d, k = 10, minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: shared tokens occupy [3, 18); windows at starts 3..8 duplicate
    // (6 of them) and merge to ONE maximal span; doc 2 likewise at [7, 22)
    assert(spans.toSet == Set((1L, 3L, 18L, 15L, 6L), (2L, 7L, 22L, 15L, 6L)), s"got ${spans.toSeq}")

    // within-doc repetition counts toward minCount too (total occurrences)
    val selfRep = (1 to 10).map(i => s"r$i").mkString(" ")
    val spans2 = Dedup.substringSpans(
      docs(3L -> s"$selfRep mid1 mid2 $selfRep"), k = 10, minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans2.toSet == Set((3L, 0L, 10L), (3L, 12L, 22L)), s"got ${spans2.toSeq}")

    // adjacent overlapping duplicated windows merge across docs of a 3-way
    // repeat; docs shorter than k yield nothing; null-safe
    assert(Dedup.substringSpans(docs(4L -> "too short"), k = 10).count() == 0)

    // the strip variant removes exactly the covered tokens and keeps the rest
    // in order — every input doc present, span-less docs pass through intact
    val stripped = Dedup.stripSubstringSpans(d.union(docs(9L -> "short untouched doc")), k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(stripped(1L) == ("a1 a2 a3 x1 x2 x3 x4 x5 x6 x7", 15L))
    assert(stripped(2L) == ("b1 b2 b3 b4 b5 b6 b7 y1 y2 y3", 15L))
    assert(stripped(9L) == ("short untouched doc", 0L))
  }

  test("passage dedup drops corpus-frequent chunks and reassembles in order") {
    val boiler = "one two three four five six seven eight nine ten" // exactly 10 words
    val d = docs(
      1L -> s"$boiler alpha beta gamma",      // chunk0 = boiler (df 3), chunk1 = "alpha beta gamma"
      2L -> s"$boiler delta epsilon",          // chunk0 = boiler
      3L -> boiler,                            // all passages boilerplate -> empty text
      4L -> "completely fresh words with no shared passages at all here")
    val out = Dedup.passageDedup(d, wordsPerChunk = 10, maxDocFreq = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == ("alpha beta gamma", 1L))
    assert(out(2L) == ("delta epsilon", 1L))
    assert(out(3L) == ("", 1L), "a doc that is ALL boilerplate keeps an empty text")
    assert(out(4L)._2 == 0L && out(4L)._1 == "completely fresh words with no shared passages at all here")
    // multi-chunk docs reassemble in original passage order
    val long = docs(
      5L -> (s"$boiler " + (1 to 10).map(i => s"w$i").mkString(" ") + s" $boiler tail words"),
      6L -> boiler, 7L -> boiler)
    val kept = Dedup.passageDedup(long, 10, 2L).where(col("doc_id") === 5L).head()
    // doc 5 chunks: [boiler][w1..w10][boiler][tail words] — BOTH boiler
    // occurrences drop (same passage string), the rest keep original order
    assert(kept.getString(1) == (1 to 10).map(i => s"w$i").mkString(" ") + " tail words",
      s"got ${kept.getString(1)}")
  }

  test("boilerplate strip: distinct-DOC threshold, within-doc repeats survive, order kept") {
    val d = docs(
      1L -> "menu home\nreal text one\nfooter (c)",
      2L -> "menu home\nreal text two\nfooter (c)",
      3L -> "menu home\nreal text three\nfooter (c)",
      // a line repeated WITHIN one doc counts once toward its doc frequency
      4L -> "echo line\necho line\necho line\nunique tail",
      5L -> null.asInstanceOf[String])
    val out = Dedup.boilerplateStrip(d, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // menu+footer hit 3 docs (== threshold) -> dropped; real text kept
    assert(out(1L) == (("real text one", 1L, 2L)))
    assert(out(2L) == (("real text two", 1L, 2L)))
    assert(out(3L) == (("real text three", 1L, 2L)))
    // echo line: df = 1 doc -> kept, all three copies, original order
    assert(out(4L) == (("echo line\necho line\necho line\nunique tail", 4L, 0L)))
    // NULL text reads as one empty line; df(empty)=1 -> kept as ""
    assert(out(5L) == (("", 1L, 0L)))
    assert(out.size == 5, "every input doc appears in the output")
    // all-boilerplate doc -> empty text_clean
    val all = docs(6L -> "menu\nfooter", 7L -> "menu\nfooter", 8L -> "menu\nfooter")
    val got = Dedup.boilerplateStrip(all, minDocs = 2L)
      .where(col("doc_id") === 6L).head()
    assert(got.getString(1) == "" && got.getLong(3) == 2L)
  }

  test("boilerplate strip: blank lines are paragraph breaks — never dropped by frequency") {
    // the blank line occurs in all 3 docs (>= minDocs) but survives
    // unconditionally; the equally-frequent menu line is dropped
    val d = docs(
      1L -> "menu\npara one a\n\npara one b",
      2L -> "menu\npara two a\n\npara two b",
      3L -> "menu\npara three a\n\npara three b")
    val out = Dedup.boilerplateStrip(d, minDocs = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("para one a\n\npara one b", 3L, 1L)))
    assert(out(2L) == (("para two a\n\npara two b", 3L, 1L)))
    assert(out(3L) == (("para three a\n\npara three b", 3L, 1L)))
  }

  test("split assignment is deterministic, exhaustive, and stable under growth") {
    val d = docs((1L to 200L).map(i => i -> s"doc $i"): _*)
    val s1 = Curation.splitAssign(d).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1.values.toSet == Set("train", "val", "test")) // all three present at n=200
    // hash membership never migrates when the corpus grows
    val s2 = Curation.splitAssign(docs((1L to 400L).map(i => i -> s"doc $i"): _*))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert((1L to 200L).forall(i => s1(i) == s2(i)))
    // degenerate cuts: 256/0 -> all train; 0/0 -> all test
    assert(Curation.splitAssign(d, 256, 0).select("split").distinct().as[String].collect().toSeq == Seq("train"))
    assert(Curation.splitAssign(d, 0, 0).select("split").distinct().as[String].collect().toSeq == Seq("test"))
    // the salted split hash is INDEPENDENT of hashSample's unsalted bits:
    // the library's own sampler composed with its own splitter must still
    // yield all three splits (unsalted, every sampled doc would be 'train')
    val sampled = Curation.splitAssign(d.where(Curation.hashSample(4)))
      .select("split").distinct().as[String].collect().toSet
    assert(sampled == Set("train", "val", "test"))
  }

  test("temperature sample: NULL-group rows neither poison n_min nor appear in output") {
    val d = ((1L to 144L).map(i => (i, s"doc $i", "en"))
      ++ (145L to 160L).map(i => (i, s"doc $i", "fr"))
      ++ Seq((161L, "stray unlabeled doc", null.asInstanceOf[String])))
      .toDF("doc_id", "text", "lang")
    val out = Curation.temperatureSample(d, "lang")
      .select("doc_id", "lang", "rate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // n_min comes from fr (16), NOT the 1-row NULL pseudo-group: en's rate
    // stays sqrt(16/144) and the NULL row is absent from the output
    assert(out.filter(_._2 == "en").forall(_._3 == math.sqrt(16.0 / 144.0)))
    assert(!out.exists(_._1 == 161L))
  }

  test("temperature sample damps the majority group and keeps the smallest whole") {
    val d = (1L to 160L).map(i => (i, s"doc $i", if (i <= 144) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.temperatureSample(d, "lang")
      .select("doc_id", "lang", "rate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val (en, fr) = out.partition(_._2 == "en")
    // fr (smallest): rate exactly 1.0, every doc kept
    assert(fr.forall(_._3 == 1.0) && fr.length == 16)
    // en: rate sqrt(16/144) = 1/3; kept count near 144/3, strictly damped
    assert(en.forall(_._3 == math.sqrt(16.0 / 144.0)))
    assert(en.length < 144 && en.length > 20)
    // deterministic: second run identical
    val again = Curation.temperatureSample(d, "lang").select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
  }

  test("sequence packing: offsets are the cumulative token stream per shard") {
    val d = docs((0L until 40L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim): _*)
    val out = Curation.packSequences(d, ctxLen = 5L, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 40)
    // brute-force reference: per shard, order by (md5(doc_id), doc_id),
    // running token sum, pack arithmetic
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 40L).map { i => (i, (i % 4).toInt, i % 7 + 1) }
      .groupBy(_._2).flatMap { case (shard, ds) =>
        var acc = 0L
        ds.sortBy { case (id, _, _) => (md5hex(id.toString), id) }.map { case (id, _, n) =>
          val start = acc; acc += n
          (id, shard, n, start / 5L, start % 5L)
        }
      }.toSet
    assert(out.toSet == expected)
  }

  test("vocab: top-k tokens with occurrence and doc counts, deterministic ties") {
    val d = docs(1L -> "a a b c", 2L -> "a b b z", 3L -> "q")
    val out = TextAnalysis.vocab(d, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // a and b tie at 3 occurrences -> word order breaks the tie; c/q/z tie at
    // 1 -> 'c' wins the k=3 cut alphabetically
    assert(out == Seq(("a", 3L, 2L), ("b", 3L, 2L), ("c", 1L, 1L)))
  }

  test("binary-id clusters route to the distributed sweep below the cutoff") {
    // Array[Byte] is not Comparable — the driver union-find would CCE ordering
    // it, so binary ids must take the distributed path regardless of pair count
    val pairs = Seq(
      (Array[Byte](2, 1), Array[Byte](1, 9)),
      (Array[Byte](1, 9), Array[Byte](3, 3))).toDF("a", "b")
    val out = Dedup.clusters(pairs) // default cutoff: would pick driver path if allowed
      .collect()
      .map(r => (r.getAs[Array[Byte]](0).toSeq, r.getAs[Array[Byte]](1).toSeq))
      .toMap
    assert(out == Map(
      Seq[Byte](1, 9) -> Seq[Byte](1, 9),
      Seq[Byte](2, 1) -> Seq[Byte](1, 9),
      Seq[Byte](3, 3) -> Seq[Byte](1, 9)))
  }

  test("cross-corpus jaccard screens incoming docs against the existing set only") {
    val incoming = docs(100L -> base, 101L -> "entirely new material nothing shares")
    val existing = docs(1L -> base.replace("dog", "cat"), 2L -> base, 3L -> "other stuff here entirely")
    val out = Dedup.crossNgramJaccard(incoming, existing, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // incoming 100 hits both existing near-dups; 101 hits nothing; and no
    // existing-existing pair (1,2) appears even though they are near-dups
    assert(out.exists { case (a, b, j) => a == 100L && b == 2L && j == 1.0 })
    assert(out.exists { case (a, b, _) => a == 100L && b == 1L })
    assert(!out.exists { case (a, _, _) => a == 101L })
    assert(out.forall { case (a, b, _) => a >= 100L && b < 100L })
  }

  test("cross-corpus cap drops boilerplate shingles from the EXISTING side only") {
    // every existing doc shares the same boilerplate prefix (df = 3 on the
    // existing side); the planted near-dup also shares a rare tail
    val boiler = "standard legal header text here"
    val incoming = docs(100L -> s"$boiler unique payload alpha beta gamma")
    val existing = docs(
      1L -> s"$boiler unique payload alpha beta delta",
      2L -> s"$boiler other content entirely different one",
      3L -> s"$boiler more filler words again entirely")
    val uncapped = Dedup.crossNgramJaccard(incoming, existing, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // capping at df <= 2 removes the boilerplate shingles (df=3) from
    // candidate generation: docs 2/3 (boilerplate-only overlap) drop out;
    // the rare-tail pair (100,1) survives with a SMALLER score — its
    // intersection loses the boilerplate shingles while sizes stay uncapped
    val capped = Dedup.crossNgramJaccard(incoming, existing, threshold = 0.1, maxDocFreq = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(uncapped.keySet == Set((100L, 1L), (100L, 2L), (100L, 3L)))
    assert(capped.keySet == Set((100L, 1L)))
    assert(capped((100L, 1L)) < uncapped((100L, 1L)),
      "capped intersection shrinks but sizes stay uncapped -> strictly smaller score")
  }

  test("ngram jaccard: identical docs score 1.0, near-dups high, others absent") {
    val nearDup = base.replace("dog", "cat")
    val out = Dedup.ngramJaccard(
      docs(1L -> base, 2L -> base, 3L -> nearDup, 4L -> "completely unrelated words"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.exists { case (1L, 2L, j) => j == 1.0; case _ => false })
    assert(out.exists { case (a, b, j) => Set(a, b).subsetOf(Set(1L, 2L, 3L)) && j >= 0.5 && j < 1.0 })
    assert(!out.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("simhash: identical docs have hamming 0") {
    val out = Dedup.simhashPairs(docs(1L -> base, 2L -> base), maxHamming = 0).collect()
    assert(out.length == 1 && out.head.getLong(2) == 0L)
  }

  test("simhash banding finds EVERY pair within the Hamming threshold (recall guarantee)") {
    // one doc of ~100 distinct words plus one-word variants: signature pairs
    // land at small Hamming distances with the differing bits ANYWHERE in the
    // 64 bits — equality with the brute-force cross-join proves banding never
    // drops an in-threshold pair (a single prefix block does, whenever the
    // diffs fall inside the prefix)
    val ws = (0 until 100).map(i => s"w$i")
    val d = ((0L, ws.mkString(" ")) +:
      (1 until 20).map(i => (i.toLong, ws.updated(5 * i, s"changed$i").mkString(" "))))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      ham = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if ham <= 6
    } yield (a, b, ham.toLong)).toSet
    assert(brute.nonEmpty, "fixture must plant in-threshold signature pairs")
    val rows = Dedup.simhashPairs(d, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == brute)
    // lowest-band-pair emission: each pair appears exactly once WITHOUT a
    // distinct() stage, even though near-dups agree on many band pairs
    assert(rows.length == rows.toSet.size, "duplicate pair emission")
    // the capped branch (bucket-local emission + distinct) returns the same
    // set when the cap doesn't bind
    val viaCapped = Dedup.simhashPairs(d, maxHamming = 6, maxBucket = Long.MaxValue - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaCapped == brute)
  }

  test("simhash screen: per-doc flags match a rep-bounded reference model; cap binds") {
    val ws = (0 until 100).map(i => s"w$i")
    // 0 = base; 1..8 near-dup variants (one word changed); 50 = unrelated
    val d = ((0L, ws.mkString(" ")) +:
      (1L to 8L).map(i => (i, ws.updated(5 * i.toInt, s"changed$i").mkString(" "))) :+
      (50L, (0 until 100).map(i => s"zzz$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.simhashScreen(d, maxHamming = 6, maxPerBucket = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    // reference model: reps = 4 lowest ids per (band-pair, key) bucket
    val sigs = Dedup.simhashSignatures(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bandPair(sig: Long, i: Int, j: Int): Long =
      (((sig >>> ((8 - 1 - i) * 8)) & 0xffL) << 8) | ((sig >>> ((8 - 1 - j) * 8)) & 0xffL)
    val pairs = for { i <- 0 until 8; j <- (i + 1) until 8 } yield (i, j)
    val expected = sigs.map { case (id, sig) =>
      val matches = for {
        ((i, j), p) <- pairs.zipWithIndex
        bucket = sigs.toSeq.filter { case (oid, os) => bandPair(os, i, j) == bandPair(sig, i, j) }
          .map(_._1).sorted.take(4)
        rep <- bucket if rep < id
        h = java.lang.Long.bitCount(sigs(rep) ^ sig).toLong if h <= 6
      } yield (h, rep)
      id -> (if (matches.isEmpty) (0L, None, None)
             else { val m = matches.min; (1L, Some(m._2), Some(m._1)) })
    }
    assert(out == expected)
    // sanity on the fixture itself: the base flags nothing (lowest id),
    // variants flag against it, the unrelated doc does not flag
    assert(out(0L)._1 == 0L && out(50L)._1 == 0L)
    assert((1L to 8L).forall(i => out(i)._1 == 1L))
  }

  test("language ID picks the lexicon with most hits") {
    val d = Seq(
      (1L, "the cat and the dog of a house"),        // en stopwords
      (2L, "der hund und die katze ist nicht da"),   // de stopwords
      (3L, "el perro y la casa de los gatos")        // es stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(d).select("doc_id", "lang_guess")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es"))
  }

  test("token counts and quality are sane") {
    val q = TextAnalysis.qualityScore(docs(1L -> base)).head()
    assert(q.getAs[Double]("quality") > 0.0 && q.getAs[Double]("quality") <= 1.0)
    val t = TextAnalysis.tokenCounts(docs(1L -> base)).head()
    assert(t.getAs[Long]("n_words") == 13L)
  }

  test("BPE-ish token counting splits contractions, digit runs and punctuation") {
    // "it's over 9000, really!" -> [it]['s][ over][ 9000][,][ really][!] = 7
    val t = TextAnalysis.tokenCountsBpe(docs(1L -> "it's over 9000, really!")).head()
    assert(t.getAs[Long]("n_bpe_tokens") == 7L)
    assert(t.getAs[Long]("n_words") == 4L)
    assert(t.getAs[Double]("tokens_per_word") == 7.0 / 4.0)
  }

  test("url extraction: counts, sorted distinct hosts, first registrable domain") {
    val out = TextAnalysis.urls(docs(
      1L -> "go to HTTPS://B.Example.COM/x and https://a.example.com/y plus https://b.example.com/z",
      2L -> "no links at all")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 3L)
    assert(out(1L).getString(2) == "a.example.com,b.example.com") // distinct + sorted
    assert(out(1L).getString(3) == "example.com")                 // from the FIRST url
    assert(out(2L).getLong(1) == 0L && out(2L).getString(2) == "" && out(2L).isNullAt(3))
  }

  test("dupReport: per-source doc/distinct counts and exact dup rate") {
    val d = Seq(
      (1L, "same text", "s1"), (2L, "same text", "s1"), (3L, "other", "s1"),
      (4L, "unique", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Curation.dupReport(d).collect().map(r => r.getString(0) -> r).toMap
    assert(got("s1").getLong(1) == 3L && got("s1").getLong(2) == 2L)
    assert(got("s1").getLong(3) == 1L && got("s1").getDouble(4) == 1.0 / 3.0)
    assert(got("s2").getLong(3) == 0L && got("s2").getDouble(4) == 0.0)
  }

  test("bpeEncodeCounts applies the trained merges: hand-derived token counts") {
    // words: xx (freq 2, sym "x x </w>"), yy (freq 1, sym "y y </w>").
    // Round-1 pairs: "x x"=2, "x </w>"=2, "y y"=1, "y </w>"=1; the count tie
    // breaks to the lexicographically smaller pair "x </w>" (< "x x"), so
    // xx -> "x x</w>" (2 symbols) and yy stays "y y </w>" (3 symbols).
    val out = TextAnalysis.bpeEncodeCounts(docs(1L -> "xx xx yy"), iters = 1).head()
    assert(out.getAs[Long]("n_tokens_bpe_trained") == 2L + 2L + 3L)
    assert(out.getAs[Long]("n_words") == 3L)
    // and the merge the encode applied is the merge training reports
    val m = TextAnalysis.bpeTrain(docs(1L -> "xx xx yy"), iters = 1).head()
    assert(m.getString(1) == "x </w>" && m.getLong(2) == 2L)
  }

  test("keepBest keeps the highest-quality member, not min-id; singletons keep themselves") {
    // base: 100 words (length factor saturates at 1.0 for both near-dups);
    // doc 1 = base + punctuation junk -> lower punct factor and stopword
    // ratio than doc 2, so the component's min-id (1) is NOT its best member
    val base = (1 to 25).flatMap(i => Seq(s"w$i", "the", "and", "of")).mkString(" ")
    val out = Dedup.keepBest(docs(
      1L -> (base + " !!! ??? ;;; :::"),
      2L -> base,
      3L -> "an unrelated singleton document entirely its own"), threshold = 0.7)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 1L && out(2L).getLong(1) == 1L) // same component, min-id label
    assert(out(1L).getLong(3) == 2L && out(2L).getLong(3) == 2L) // best quality wins
    assert(out(1L).getDouble(2) < out(2L).getDouble(2))
    assert(out(3L).getLong(1) == 3L && out(3L).getLong(3) == 3L) // singleton keeps itself
  }

  test("dupReport: NULL texts are one distinct value, not silent duplicates") {
    val d = Seq(
      (1L, null.asInstanceOf[String], "s1"), (2L, null.asInstanceOf[String], "s1"),
      (3L, "real", "s1"),
      (4L, null.asInstanceOf[String], "s2")) // all-NULL source: 1 distinct, rate 0
      .toDF("doc_id", "text", "source")
    val got = Curation.dupReport(d).collect().map(r => r.getString(0) -> r).toMap
    assert(got("s1").getLong(2) == 2L && got("s1").getLong(3) == 1L)
    assert(got("s2").getLong(2) == 1L && got("s2").getDouble(4) == 0.0)
  }

  test("keepBest works with STRING doc_ids: quality desc, UTF8-min id tiebreak") {
    val base = (1 to 25).flatMap(i => Seq(s"w$i", "the", "and", "of")).mkString(" ")
    val d = Seq(
      ("zz-1", base + " !!! ??? ;;; :::"), // near-dup, lower quality
      ("aa-2", base),                      // near-dup, best quality
      ("solo", "an unrelated singleton document entirely its own"))
      .toDF("doc_id", "text")
    val out = Dedup.keepBest(d, threshold = 0.7)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("zz-1").getString(3) == "aa-2" && out("aa-2").getString(3) == "aa-2")
    assert(out("solo").getString(3) == "solo")
  }

  test("gopher repetition: dup-line and top-n-gram fractions, hand-computed") {
    val out = TextAnalysis.gopherRepetition(docs(
      // 4 non-empty lines, "ad" twice -> dup_line_frac 0.5 (> 0.30 cap)
      1L -> "one two three four five six seven eight\nad\nmiddle line here\nad",
      // no repeated lines or grams
      2L -> "all words unique in this line",
      // "spam spam" occurs 3x, 9 chars, text 19 chars -> top2 frac 27/19 > 0.20
      3L -> "spam spam spam spam")).collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getLong(1) == 4L)                                  // n_lines
    assert(d1.getDouble(2) == 0.5 && d1.getLong(7) == 0L)        // dup_line_frac, ok_dup_line
    assert(d1.getDouble(3) == 4.0 / 59.0)                        // dup chars 2+2 over 59 line chars
    assert(out(2L).getDouble(2) == 0.0 && out(2L).getLong(12) == 1L) // keep
    val d3 = out(3L)
    assert(d3.getDouble(4) == 27.0 / 19.0 && d3.getLong(9) == 0L)    // top2 frac, ok_top2
    assert(d3.getLong(12) == 0L)
  }

  test("blocklist filter: whole-word hits only, zero-hit docs keep") {
    val out = TextAnalysis.blocklistFilter(docs(
      1L -> "a SPAM word and more spam here",  // 2 hits, case-insensitive
      2L -> "spammy antispam spams"),          // substrings only: no whole-word hit
      Seq("spam")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 0L)
    assert(out(2L).getLong(1) == 0L && out(2L).getLong(2) == 1L)
  }

  test("blocklist filter: punctuation-adjacent words still hit (word-class boundaries)") {
    val out = TextAnalysis.blocklistFilter(docs(
      1L -> "spam. (spam) spam\nend",       // 3 hits across ., (), \n boundaries
      2L -> "don't spam-like spammy"),      // "spam" inside hyphenation: "spam" token from split
      Seq("spam")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 3L && out(1L).getLong(2) == 0L)
    // "spam-like" splits at '-' into ["spam","like"] -> 1 hit; "don't" stays
    // one token (apostrophe inside the word class); "spammy" never hits
    assert(out(2L).getLong(1) == 1L && out(2L).getLong(2) == 0L)
  }

  test("domain filter: any denied registrable domain drops; subdomains resolve to it") {
    val out = TextAnalysis.domainFilter(docs(
      1L -> "see http://a.bad.example/x and https://ok.example/y",  // bad.example denied
      2L -> "see https://mirror.ok.example/z only",
      3L -> "no links at all"),
      Seq("bad.example")).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2L && out(1L).getLong(2) == 1L && out(1L).getLong(3) == 0L)
    assert(out(2L).getLong(1) == 1L && out(2L).getLong(2) == 0L && out(2L).getLong(3) == 1L)
    assert(out(3L).getLong(1) == 0L && out(3L).getLong(3) == 1L)
  }

  test("repetition: repeated grams score high, unique prose 0, short text null") {
    val out = TextAnalysis.repetition(docs(
      1L -> "spam spam spam spam spam spam",  // 4 gram instances, 1 distinct -> 0.75
      2L -> "every word here is fully unique today",
      3L -> "too short"))                      // < 3 words -> 0 grams, null ratio
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4L && out(1L).getLong(2) == 1L && out(1L).getDouble(3) == 0.75)
    assert(out(2L).getDouble(3) == 0.0)
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(3))
  }

  test("fingerprint is stable and shifts under edits") {
    val f1 = TextAnalysis.fingerprint(docs(1L -> base)).head().getString(1)
    val f2 = TextAnalysis.fingerprint(docs(1L -> base)).head().getString(1)
    assert(f1 == f2 && f1.length == 32)
  }

  test("native fingerprint equals the declarative window-min, incl. multibyte and short text") {
    import org.apache.spark.sql.functions.{col, expr, length, lit, when}
    val d = docs(
      1L -> base,
      2L -> "größenwahn über alles — ünïcödé windows must index by code point",
      3L -> "short",                 // < 12 chars -> null
      4L -> ("exactly12ch!"))        // exactly one window
    val declarative = d.select(col("doc_id"),
      when(length(col("text")) < 12, lit(null).cast("string"))
        .otherwise(expr(
          "array_min(transform(sequence(1, char_length(text) - 11), i -> md5(substr(text, i, 12))))"))
        .as("fingerprint"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val native = TextAnalysis.fingerprint(d)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(native == declarative)
    assert(native(3L).isEmpty && native(2L).nonEmpty)
  }

  test("brute-force kNN: a vector's nearest neighbor is its duplicate") {
    val vs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.7f, 0.7f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceKnn(vs, vs.where(col("vec_id") === 0L), k = 2)
      .orderBy("rank").collect()
    assert(out(0).getAs[Long]("neighbor_id") == 1L && out(0).getAs[Double]("sim") == 1.0)
    assert(out(1).getAs[Long]("neighbor_id") == 3L)
  }

  test("IVF kNN finds an exact duplicate through its probed list") {
    // 40 corpus vectors in two obvious clusters + a duplicate of the query
    val vs = ((0L until 20L).map(i => (i, Array.tabulate(8)(d => (1.0 + 0.01 * i * d).toFloat))) ++
      (20L until 40L).map(i => (i, Array.tabulate(8)(d => (-1.0 - 0.01 * i * d).toFloat))))
      .toDF("vec_id", "embedding")
    val out = SimilarityIvf.ivfKnn(vs, vs.where(col("vec_id") === 0L), k = 3, nLists = 4, nProbe = 2)
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    // top neighbors must come from the same (positive) cluster
    assert(out.forall(_.getAs[Long]("neighbor_id") < 20L))
    assert(out.head.getAs[Double]("sim") > 0.99)
  }

  test("int8-list IVF ranks like the float path on clustered vectors") {
    // UNIT-NORMALIZED fixture: the int8 path scores dequantized DOT products
    // (inner-product search), the float path cosine — on the unit sphere the
    // two orders coincide, which is exactly how an embedding store uses it
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val vs = ((0L until 20L).map(i => (i, unit(Array.tabulate(8)(d => 1.0 + 0.01 * i * d)))) ++
      (20L until 40L).map(i => (i, unit(Array.tabulate(8)(d => -1.0 - 0.01 * i * d)))))
      .toDF("vec_id", "embedding")
    val q = vs.where(col("vec_id") === 0L)
    val int8 = SimilarityIvf.ivfKnnInt8(vs, q, k = 5, nLists = 4, nProbe = 2)
      .orderBy("rank").collect()
    assert(int8.nonEmpty)
    // same probed-cluster property as the float path, scores dequantized
    assert(int8.forall(_.getAs[Long]("neighbor_id") < 20L))
    assert(int8.head.getAs[Double]("score") > 0.0)
    // high agreement with float-list IVF (integer dot approximates cosine
    // rank on near-unit vectors; the top sets should largely coincide)
    val fl = SimilarityIvf.ivfKnn(vs, q, k = 5, nLists = 4, nProbe = 2)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val overlap = int8.map(_.getAs[Long]("neighbor_id")).count(fl.contains)
    assert(overlap >= 3, s"int8 IVF diverged from float IVF: $overlap/5 overlap")
  }

  test("LSH buckets co-locate duplicate vectors") {
    val vs = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.lshBucketedPairs(vs, bits = 4, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("cross-corpus embedding screen pairs only across the corpora") {
    val incoming = Seq(
      (100L, Array.fill(8)(0.5f)),
      (101L, Array.tabulate(8)(i => if (i < 4) 1.0f else -1.0f))).toDF("vec_id", "embedding")
    val existing = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.25f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.crossLshPairs(incoming, existing, bits = 4, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // 100 collides with its two scaled copies; 101 matches nothing; never an
    // existing-existing pair (1,2) even though they are identical directions
    assert(out.toSet == Set((100L, 1L), (100L, 2L)))
  }

  test("embedding-cosine dedup: near-dup vectors collapse to min id, others keep themselves") {
    // 0/1/2 are an identical triple; 3 is a scaled copy of 0 (cosine 1);
    // 4 points elsewhere and must keep itself
    val vs = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.fill(8)(0.25f)),
      (4L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embedCosine(vs, minCosine = 0.95, bits = 4).as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L))
  }

  test("urlDedup: scheme/query/fragment/trailing-slash variants collapse; no-URL docs keep") {
    val d = docs(
      1L -> "see https://example.org/a?utm=x for details",
      2L -> "also http://example.org/a/ covers it",
      3L -> "and HTTP://EXAMPLE.ORG/a#frag too",
      4L -> "different https://example.org/b page",
      5L -> "no link here at all")
    val out = Dedup.urlDedup(d).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((Some("example.org/a"), 1L, 3L)))
    assert(out(2L) == ((Some("example.org/a"), 1L, 3L)))
    assert(out(3L) == ((Some("example.org/a"), 1L, 3L)))
    assert(out(4L) == ((Some("example.org/b"), 4L, 1L)))
    assert(out(5L) == ((None, 5L, 1L)))
  }

  test("semantic dedup: in-cell near-dups drop to the lowest id, distinct vectors keep") {
    // 0/1 identical, 3 a scaled copy of 0 (cosine 1 -> same cell, dup);
    // 4 orthogonal-ish (keeps). nLists=2 so cells genuinely partition.
    val vs = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)),
      (3L, Array.fill(8)(0.25f)),
      (4L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(vs, minCosine = 0.95, nLists = 2)
      .select("vec_id", "n_sem_dups", "keep")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(0L) == ((0L, 1L)))          // lowest id of its dup group keeps
    assert(out(1L) == ((1L, 0L)))          // one lower-id near-dup (0)
    assert(out(3L) == ((2L, 0L)))          // near-dup of both 0 and 1
    assert(out(4L) == ((0L, 1L)))          // no near-dup anywhere
    // the maxList cap excludes the hot cell from candidate generation
    val capped = Dedup.semanticDedup(vs, minCosine = 0.95, nLists = 2, maxList = 2L)
      .select("vec_id", "keep").as[(Long, Long)].collect().toMap
    assert(capped.values.forall(_ == 1L))  // the dup cell is over cap -> all keep
  }

  /** The syntheticImages contract replicated in test math: expected
    * (w, h, c, px_sum) for one doc id. */
  private def expectedImage(d: Long): (Long, Long, Long, Long) = {
    val w = 32 + d % 48; val h = 32 + d % 32
    val c = if (d % 4 == 0) 1L else 3L
    val b = d % 50
    val sum = c * h * (w * (w - 1) / 2) + c * w * (h * (h - 1) / 2) +
      c * w * h * b + w * h * 20 * (c * (c - 1) / 2)
    (w, h, c, sum)
  }

  test("REAL ImageIO decode: PNG round trip matches the generator contract, color and gray") {
    // 1 -> 33x33 RGB, 4 -> 36x36 GRAY (d % 4 == 0)
    val media = Multimodal.syntheticImages(docs(1L -> base, 4L -> base))
    // payloads are genuine PNGs (magic bytes)
    media.select("payload").collect().foreach { r =>
      val b = r.getAs[Array[Byte]](0)
      assert((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    }
    val out = Multimodal.imageDecode(media).collect().map(m => m.media_id -> m).toMap
    for (d <- Seq(1L, 4L)) {
      val (w, h, c, sum) = expectedImage(d)
      val m = out(d)
      assert((m.width, m.height, m.channels, m.px_sum) == ((w, h, c, sum)), s"doc $d")
      assert(m.px_mean == sum.toDouble / (w * h * c).toDouble)
    }
    // the repartition-by-id path decodes identically
    val viaPart = Multimodal.imageDecode(media, repartitionById = true)
      .collect().map(m => m.media_id -> m).toMap
    assert(viaPart == out)
  }

  test("REAL resize: nearest-neighbor re-encode decodes to the integer-geometry prediction") {
    val media = Multimodal.syntheticImages(docs(1L -> base))
    val out = Multimodal.imageDecode(Multimodal.imageResize(media, maxDim = 16))
      .collect().head
    // d=1: 33x33 -> den 33, out 16x16; sample (x*33/16, y*33/16)
    assert(out.width == 16 && out.height == 16 && out.channels == 3)
    var expected = 0L
    for (x <- 0 until 16; y <- 0 until 16; k <- 0 until 3)
      expected += (x * 33 / 16) + (y * 33 / 16) + 1 + 20 * k
    assert(out.px_sum == expected)
    // maxDim above source dims: identity geometry
    val same = Multimodal.imageDecode(Multimodal.imageResize(media, maxDim = 128))
      .collect().head
    assert(same.width == 33 && same.height == 33)
  }

  test("REAL grid features: cell sums are the raster's exact rectangle sums; vector contract") {
    val media = Multimodal.syntheticImages(docs(4L -> base)) // gray 36x36, b=4
    val cells = Multimodal.imageGridFeatures(media, grid = 4).collect()
    assert(cells.length == 16) // 4x4 cells x 1 channel
    // cell (0,0): x,y in [0,9): sum = 9*Σx + 9*Σy + 81*b = 9*36 + 9*36 + 324
    val c00 = cells.find(c => c.cell_x == 0 && c.cell_y == 0).get
    assert(c00.n_px == 81 && c00.cell_sum == 9 * 36 + 9 * 36 + 81 * 4)
    assert(c00.cell_mean == c00.cell_sum.toDouble / 81.0)
    // total over cells == whole-image sum (partition of the raster)
    assert(cells.map(_.cell_sum).sum == expectedImage(4L)._4)
    // the flattened ARRAY<DOUBLE> embedding contract: [0,1], deterministic
    val vec = Multimodal.imageFeatureVector(media, grid = 4).collect().head.getSeq[Double](1)
    assert(vec.length == 16 && vec.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("JPEG path: a lossy codec still decodes through the same operator (dims intact)") {
    import spark.implicits._
    val jpegBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(Multimodal.renderImage(1L), "jpg", bos)
      bos.toByteArray
    }
    val media = Seq((1L, jpegBytes, "image")).toDF("media_id", "payload", "media_type")
    val m = Multimodal.imageDecode(media).collect().head
    assert(m.width == 33 && m.height == 33 && m.channels == 3)
    assert(m.px_sum > 0L) // pixel VALUES are lossy — only geometry is pinned
  }

  test("mixed-codec corpus: codec sniff + geometry exact under both readers") {
    // 5 -> JPEG (d % 5 == 0), 1/4 -> PNG; 20 -> JPEG AND gray (d % 4 == 0)
    val media = Multimodal.syntheticImagesMixed(
      docs(1L -> base, 4L -> base, 5L -> base, 20L -> base))
    val geoms = Multimodal.imageGeometry(media).collect().map(g => g.media_id -> g).toMap
    for (d <- Seq(1L, 4L, 5L, 20L)) {
      val (w, h, c, _) = expectedImage(d)
      val g = geoms(d)
      assert(g.codec == (if (d % 5 == 0) "jpeg" else "png"), s"doc $d")
      assert((g.width, g.height, g.channels) == ((w, h, c)), s"doc $d geometry")
    }
    // JPEG decode is deterministic within one JDK: re-decoding the same
    // payload reproduces identical pixel statistics (the fixture pin that
    // makes a lossy codec still regression-checkable)
    val jpegOnly = media.where(org.apache.spark.sql.functions.col("media_id") % 5 === 0)
    val s1 = Multimodal.imageDecode(jpegOnly).collect().map(m => m.media_id -> m.px_sum).toMap
    val s2 = Multimodal.imageDecode(jpegOnly).collect().map(m => m.media_id -> m.px_sum).toMap
    assert(s1 == s2 && s1.values.forall(_ > 0L))
    // lossy but close: JPEG pixel mean within 5% of the analytic PNG mean
    val pngMeans = Seq(5L, 20L).map { d =>
      val (w, h, c, sum) = expectedImage(d)
      d -> sum.toDouble / (w * h * c).toDouble
    }.toMap
    Multimodal.imageDecode(jpegOnly).collect().foreach { m =>
      val exact = pngMeans(m.media_id)
      assert(math.abs(m.px_mean - exact) / exact < 0.05,
        s"doc ${m.media_id}: jpeg mean ${m.px_mean} vs exact $exact")
    }
  }

  test("video frame-sample stub: every-Nth frame indices from payload size") {
    // doc 2 -> media_type video (doc_id % 3 == 2 -> index 3); frames = bytes/64
    val media = Multimodal.asMediaTable(docs(1L -> base, 2L -> (base * 3), 3L -> (base * 5)))
    val frames = Multimodal.frameSample(media, everyN = 2)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet == Set(2L))
    assert(byId(2L) == (math.max(1, (base.length * 3) / 64) + 1) / 2)
  }

  test("centroids: per-label fixed-point means are exact on dyadic fixtures") {
    val emb = Seq(
      (1L, 0, Array(0.5f, -1.25f)),
      (2L, 0, Array(1.5f, 0.25f)),
      (3L, 1, Array(-2.0f, 4.0f))).toDF("vec_id", "label", "embedding")
    val out = Similarity.centroids(emb, "label").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // dyadic inputs snap to the 2^-20 grid exactly, so means are exact
    assert(out((0, 1L)) == ((2L, 1.0)) && out((0, 2L)) == ((2L, -0.5)))
    assert(out((1, 1L)) == ((1L, -2.0)) && out((1, 2L)) == ((1L, 4.0)))
  }

  test("capPerGroup equals the single-window per-source cap") {
    val d = (0L until 40L)
      .map(i => (i, s"src${i % 4}", s"the a of and doc $i words " * (1 + (i % 3)).toInt))
      .toDF("doc_id", "source", "text")
    val scored = d.select(col("source"), col("doc_id"), TextAnalysis.qualityCol.as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    val ref = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3).select("source", "rank", "doc_id", "quality")
    val got = Curation.capPerGroup(d, "source", 3)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("lmScore: exact integer accumulators and unigram probabilities") {
    // vocab(top-2) = {the: 3, cat: 1}; corpus total = 8 words
    val d = docs(1L -> "the the the cat", 2L -> "zzz qqq xxx vvv")
    val out = TextAnalysis.lmScore(d, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4 && out(1L).getLong(2) == 0)
    assert(out(1L).getDouble(4) == 10.0 / 32.0) // (3+3+3+1) / (4 * 8)
    assert(out(2L).getLong(2) == 4 && out(2L).getDouble(3) == 1.0
      && out(2L).getDouble(4) == 0.0)
  }

  test("lmScoreBigram: bigram vocab, exact integer accumulators, conditional mass") {
    // bigram counts: "a b":2, "b a":1, "b c":1, "x y":1 (total 5); top-2
    // vocab = {"a b", "b a"} (count desc, then lexicographic); unigrams a:2 b:2
    val d = docs(1L -> "a b a b c", 2L -> "x y", 3L -> "solo")
    val out = TextAnalysis.lmScoreBigram(d, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L)) // one-word docs have no pairs
    val r1 = out(1L)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 1) // pairs; "b c" is OOV
    assert(r1.getDouble(3) == 0.25)
    assert(r1.getDouble(4) == 5.0 / 20.0) // (2+1+2) / (4 pairs x 5 corpus pairs)
    assert(r1.getDouble(5) == 5.0 / 6.0)  // sum c12 / sum c1(head) over vocab pairs
    val r2 = out(2L)
    assert(r2.getLong(2) == 1 && r2.getDouble(3) == 1.0 && r2.getDouble(4) == 0.0)
    assert(r2.isNullAt(5)) // no in-vocab pair -> null conditional
  }

  test("importanceWeights: exact masses, target/raw ratio, null on zero raw evidence") {
    // target: {cat:2, dog:1} total_t=3; raw words: {cat:3, dog:1, zz:1, qq:1}
    // total_r=6. Vocab(top-2 by target count) = {cat, dog}.
    val target = docs(100L -> "cat cat dog")
    val raw = docs(1L -> "cat cat cat", 2L -> "dog zz qq")
    val out = Curation.importanceWeights(raw, target, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L) // t_mass 2*3=6, r_mass 3*3=9 -> (6*6)/(9*3) = 4/3
    assert(r1.getLong(1) == 3 && r1.getLong(2) == 6 && r1.getLong(3) == 9)
    assert(r1.getDouble(4) == 36.0 / 27.0)
    val r2 = out(2L) // dog in vocab (t=1, r=1); zz/qq OOV -> (1*6)/(1*3) = 2
    assert(r2.getLong(2) == 1 && r2.getLong(3) == 1 && r2.getDouble(4) == 2.0)
    // a raw doc with zero in-vocab mass has no evidence under either model
    val r3 = Curation.importanceWeights(docs(3L -> "xx yy"), target, vocabSize = 2)
      .collect().head
    assert(r3.getLong(2) == 0 && r3.getLong(3) == 0 && r3.isNullAt(4))
  }

  test("bpeTrain: frequency-weighted merges, deterministic ties, leftmost rewrite") {
    // word freqs: low:3 lower:2 newest:1. Round 1: "l o" and "o w" tie at 5,
    // lexicographic -> "l o". Round 2: "lo w" 5. Round 3: "low </w>" 3.
    val d = docs(1L -> "low low low", 2L -> "lower lower", 3L -> "newest")
    val out = TextAnalysis.bpeTrain(d, iters = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "l o", 5L), (2L, "lo w", 5L), (3L, "low </w>", 3L)))
    // consecutive-occurrence rewrite: pair (a,a) over "a a a a </w>" must
    // merge leftmost-first into "aa aa </w>" (the doubled-gap replace
    // contract) — proven by round 2 seeing pairs {"aa aa", "aa </w>"}, tie
    // at 2, '<' sorting before 'a'
    val rep = TextAnalysis.bpeTrain(docs(1L -> "aaaa aaaa"), iters = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rep.toSeq == Seq((1L, "a a", 6L), (2L, "aa </w>", 2L)))
  }

  test("chunk: stride/overlap windows with provenance; no pure-subset tail chunks") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = TextAnalysis.chunk(docs(1L -> text, 2L -> "solo", 3L -> ((1 to 11).map(i => s"v$i").mkString(" "))),
        chunkWords = 4, strideWords = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1 (10 words): starts 0,3,6 — chunk 2 already reaches w10, so no
    // start-9 tail (it would be a pure subset of chunk 2)
    assert(out((1L, 0L)) == ((0L, 4L, "w1 w2 w3 w4")))
    assert(out((1L, 1L)) == ((3L, 4L, "w4 w5 w6 w7")))
    assert(out((1L, 2L)) == ((6L, 4L, "w7 w8 w9 w10")))
    assert(out((2L, 0L)) == ((0L, 1L, "solo")))
    // doc 3 (11 words): start 9 DOES add a new word (v11) -> short tail kept
    assert(out((3L, 3L)) == ((9L, 2L, "v10 v11")))
    assert(out.size == 3 + 1 + 4)
  }

  test("bloomScreen: no false negatives; decision equals the exact position-set reference") {
    val existing = docs((0L until 40L).map(i => i -> s"existing document number $i with words"): _*)
    val incoming = docs(
      100L -> "existing document number 7 with words",  // exact re-occurrence
      101L -> "existing document number 23 with words", // exact re-occurrence
      102L -> "a brand new document nothing has seen",
      103L -> "another unseen document entirely")
    val flagged = Dedup.bloomScreen(incoming, existing).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(Set(100L, 101L).subsetOf(flagged), "re-occurrences must always be flagged")
    // reference decision: all k md5 positions present in the existing set —
    // the Bloom bitset bijects with this set, so outputs must match EXACTLY
    // (false positives included, were any to occur)
    def positions(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"), explode(array((0 until 4).map(i =>
        conv(substring(md5(concat(lit(s"$i:"), col("h"))), 1, 5), 16, 10).cast("long")): _*)).as("pos"))
    val exSet = positions(existing).select("pos").distinct()
    val ref = positions(incoming).join(exSet, "pos")
      .groupBy("doc_id").count().where(col("count") === 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == ref)
  }

  test("gopherFilter: each rule flags independently; keep is the conjunction") {
    val prose = "the quick brown jumping foxes wander through these autumn meadows " // true mean word len 5.6
    val good = (prose * 6).trim                                                      // 60 words, stopword-rich
    val short = "the and is of to"                                                   // fails min word count
    val longWords = (1 to 60).map(_ => "supercalifragilistic").mkString(" ")         // mean word length > 10
    val punct = (prose * 6).trim + " " + ("!" * 120)
    val accented = ("der müßige König zögert über die schöne Straße immer wieder " * 6).trim
    val out = TextAnalysis.gopherFilter(
      docs(1L -> good, 2L -> short, 3L -> longWords, 4L -> punct, 5L -> accented))
      .collect().map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = (out(id).getLong(5), out(id).getLong(6), out(id).getLong(7),
      out(id).getLong(8), out(id).getLong(9))
    assert(flags(1L) == ((1L, 1L, 1L, 1L, 1L)))
    assert(flags(2L)._1 == 0L && flags(2L)._5 == 0L)       // too short -> dropped
    assert(flags(3L)._2 == 0L && flags(3L)._4 == 0L && flags(3L)._5 == 0L) // long words, no stopwords
    assert(flags(4L)._3 == 0L && flags(4L)._5 == 0L)       // punctuation wall -> dropped
    // Unicode-aware punct class: umlauts/eszett are LETTERS, not punctuation
    assert(out(5L).getDouble(3) == 0.0 && flags(5L) == ((1L, 1L, 1L, 1L, 1L)))
  }

  test("sharded bloomScreen: no false negatives; flags within the unsharded screen's; tiny per-shard filters") {
    val existing = docs((0L until 60L).map(i => i -> s"existing sharded doc $i some words"): _*)
    val incoming = docs(
      (Seq(200L -> "existing sharded doc 5 some words",   // exact re-occurrence
           201L -> "existing sharded doc 41 some words",  // exact re-occurrence
           202L -> "fresh never before seen content one",
           203L -> "fresh never before seen content two") ++
        (300L until 340L).map(i => i -> s"probe-only doc $i unseen")): _*)
    // deliberately TINY per-shard filters (2^8 bits) so saturation/FP paths
    // are exercised, across 16 shards
    val sharded = Dedup.bloomScreenSharded(incoming, existing, shardHexDigits = 1, hexDigits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val unsharded = Dedup.bloomScreen(incoming, existing, hexDigits = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(200L, 201L).subsetOf(sharded), "re-occurrences must always be flagged")
    // per-shard bitsets are subsets of the union bitset, so sharding can only
    // REMOVE false positives relative to one shared filter of the same size
    assert(sharded.subsetOf(unsharded), s"sharded $sharded not within unsharded $unsharded")
    // exact (shard, position)-set reference: the sharded decision bijects
    // with membership in the per-shard position set
    def positions(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"),
        substring(md5(concat(lit("shard:"), col("h"))), 1, 1).as("shard"),
        explode(array((0 until 4).map(i =>
          conv(substring(md5(concat(lit(s"$i:"), col("h"))), 1, 2), 16, 10).cast("long")): _*)).as("pos"))
    val exSet = positions(existing).select("shard", "pos").distinct()
    val ref = positions(incoming).join(exSet, Seq("shard", "pos"))
      .groupBy("doc_id").count().where(col("count") === 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sharded == ref, s"sharded screen $sharded != exact per-shard reference $ref")
  }

  test("streaming bloom screen: micro-batches probe one prebuilt history bitset") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val history = docs((0L until 30L).map(i => i -> s"historic doc number $i"): _*)
    // built ONCE outside the query; each micro-batch only pays the probe
    val bits = Dedup.bloomBits(history).cache()
    val input = MemoryStream[(Long, String)]
    val flagged = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val f = Dedup.bloomProbe(batch, bits).select("doc_id").collect().map(_.getLong(0))
        flagged.synchronized { flagged ++= f }
        ()
      }
      .start()
    input.addData(100L -> "historic doc number 7", 101L -> "fresh unseen content")
    q.processAllAvailable()
    input.addData(102L -> "historic doc number 21", 103L -> "more novel text")
    q.processAllAvailable()
    q.stop()
    // re-occurrences flagged in their own batches; FP odds at 2^20 bits with
    // 120 set positions are ~1e-16, so exact equality is safe to assert
    assert(flagged.toSet == Set(100L, 102L))
  }

  test("randomized: chunk, bloomScreen and qualitySummary equal brute-force references") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("the", "and", "of", "data", "model", "ein", "der", "los", "que", "une", "les", "zz")
    val texts = Seq.tabulate(120)(i => (i.toLong,
      Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val d = docs(texts: _*)

    // chunk vs a driver-side brute force (short docs, exact-tiling tails, ties)
    val gotChunks = TextAnalysis.chunk(d, chunkWords = 7, strideWords = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    val expChunks = texts.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      val last = if (ws.length <= 7) 0 else math.ceil((ws.length - 7) / 5.0).toInt
      (0 to last).map { i =>
        val start = i * 5
        (id, i.toLong, start.toLong, math.min(7, ws.length - start).toLong,
          ws.slice(start, start + 7).mkString(" "))
      }
    }.toSet
    assert(gotChunks == expChunks)

    // bloomScreen vs the exact md5-position-set decision — the 12-word vocab
    // makes chance text collisions across the split likely (real overlap)
    val existing = docs(texts.take(80): _*)
    val incoming = docs(texts.drop(80).map { case (id, t) => (id + 1000L, t) }: _*)
    val flagged = Dedup.bloomScreen(incoming, existing).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val exTexts = texts.take(80).map(_._2).toSet
    val rereads = texts.drop(80).collect { case (id, t) if exTexts(t) => id + 1000L }.toSet
    assert(rereads.subsetOf(flagged), "no false negatives on genuine re-occurrences")
    def positions(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"), explode(array((0 until 4).map(i =>
        conv(substring(md5(concat(lit(s"$i:"), col("h"))), 1, 5), 16, 10).cast("long")): _*)).as("pos"))
    val ref = positions(incoming).join(positions(existing).select("pos").distinct(), "pos")
      .groupBy("doc_id").count().where(col("count") === 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged == ref)

    // qualitySummary vs the single-window nearest-rank form (quality TIES
    // from repeated random texts exercise the doc_id tie-break)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang_guess").orderBy(col("quality"), col("doc_id"))
    val sc = d.select(col("doc_id"), TextAnalysis.qualityCol.as("quality"),
        TextAnalysis.langGuessCol(
          TextAnalysis.lexiconHits("de"), TextAnalysis.lexiconHits("en"),
          TextAnalysis.lexiconHits("es"), TextAnalysis.lexiconHits("fr")).as("lang_guess"))
      .where(col("quality").isNotNull)
    val r = sc.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang_guess")))
    val refSummary = r.groupBy("lang_guess").agg(
      max("n").as("n_docs"), min("quality").as("min_q"), max("quality").as("max_q"),
      max(when(col("rk") === ceil(lit(0.5) * col("n")).cast("long"), col("quality"))).as("p50"),
      max(when(col("rk") === ceil(lit(0.9) * col("n")).cast("long"), col("quality"))).as("p90"),
      max(when(col("rk") === ceil(lit(0.99) * col("n")).cast("long"), col("quality"))).as("p99"))
    val gotSummary = Curation.qualitySummary(d)
    assert(gotSummary.exceptAll(refSummary).isEmpty && refSummary.exceptAll(gotSummary).isEmpty)
  }

  test("mixReport cells carry exact counts and corpus shares") {
    val d = Seq(
      (1L, "a b", "en", "s1"),
      (2L, "c", "en", "s2"),
      (3L, "d e f", "de", "s1")).toDF("doc_id", "text", "lang", "source")
    val out = Curation.mixReport(d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(("en", "s1")) == ((1L, 2L, 1.0 / 3.0, 2.0 / 6.0)))
    assert(out(("en", "s2")) == ((1L, 1L, 1.0 / 3.0, 1.0 / 6.0)))
    assert(out(("de", "s1")) == ((1L, 3L, 1.0 / 3.0, 3.0 / 6.0)))
  }

  test("lengthReport: exact nearest-rank percentiles per source") {
    // source 'a': 10 docs of 1..10 words -> p50 = 5, p90 = 9, p99 = 10
    val rows = (1 to 10).map(i => (i.toLong, ("w " * i).trim, "a")) :+
      ((99L, "one two three", "b"))
    val out = Curation.lengthReport(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 10L && a.getLong(2) == 55L) // n_docs, total
    assert(a.getDouble(3) == 5.5)
    assert((a.getLong(4), a.getLong(5), a.getLong(6)) == ((5L, 9L, 10L)))
    val b = out("b")
    assert((b.getLong(4), b.getLong(5), b.getLong(6)) == ((3L, 3L, 3L)))
  }

  test("sentenceStats: terminal-punctuation runs split; stats hand-checked") {
    val d = docs(
      1L -> "one two three. four five! six seven eight?? nine",
      2L -> "no terminal punctuation at all",
      3L -> "trailing end.")
    val out = TextAnalysis.sentenceStats(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 4L)      // sentences
    assert(r1.getLong(2) == 9L)      // words across sentences
    assert(r1.getLong(3) == 3L)      // max sentence words
    assert(r1.getDouble(4) == 9.0 / 4)
    assert(out(2L).getLong(1) == 1L && out(2L).getLong(2) == 5L)
    assert(out(3L).getLong(1) == 1L && out(3L).getLong(2) == 2L)
  }

  test("shuffleOrder: a permutation with dense per-shard positions; salt changes it") {
    val d = (0L until 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Curation.shuffleOrder(d, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == (0L until 300L).toSet) // every doc once
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq) // dense
    }
    val other = Curation.shuffleOrder(d, nShards = 4, salt = "epoch2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(other.toSet != out.toSet) // a different permutation
    // determinism across partitioning
    val out2 = Curation.shuffleOrder(d.repartition(13), nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out2.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("lengthReport is bit-identical across parallelism") {
    val rows = (0L until 400L).map(i => (i, ("x " * ((i % 37) + 1).toInt).trim, s"s${i % 5}"))
    def run(df: DataFrame) = Curation.lengthReport(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1).toSeq
    val df = rows.toDF("doc_id", "text", "source")
    assert(run(df) == run(df.repartition(17)))
  }

  test("Kneser-Ney: hand-computed smoothed probabilities, discount mass conserved") {
    // corpus pairs: (a,b) x3, (b,a) x1, (b,c) x1 -> n_bigrams = 3
    // P(b|a) = (3-.75)/3 + (.75*1/3)*(1/3) = 0.75 + 1/12
    // P(a|b) = (1-.75)/2 + (.75*2/2)*(1/3) = 0.125 + 0.25 = 0.375
    // P(c|b) = same head stats as (b,a) -> 0.375
    val d = docs(1L -> "a b a b", 2L -> "a b c")
    val out = TextAnalysis.lmScoreKN(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("kn_mean"))).toMap
    val pba = 2.25 / 3 + (0.75 * 1 / 3) * (1.0 / 3)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (pba + 0.375 + pba) / 3) < 1e-12)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - (pba + 0.375) / 2) < 1e-12)
    // KN invariant: P(.|b) over its observed continuations = discounted mass
    // 0.25 plus the backoff weight 0.75 times their continuation share 2/3
    assert(math.abs((0.375 + 0.375) - (0.25 + 0.75 * 2.0 / 3)) < 1e-12)
    // single-word and empty docs have no pairs and drop out
    assert(TextAnalysis.lmScoreKN(docs(1L -> "solo", 2L -> "")).count() == 0)
  }

  test("lmBuckets: buckets exhaust each source, shares sum to 1, short docs report unscored") {
    val d = (Seq(
      (1L, "a b a b a b a b", "web"),   // head: dominated by the top bigram
      (2L, "a b c d e f g h", "web"),   // mixed
      (3L, "x", "web"),                 // < 2 words -> unscored
      (4L, "a b a b c d", "books"),
      (5L, "q r s t u v", "books")))
      .toDF("doc_id", "text", "source")
    val out = Curation.lmBuckets(d).collect()
    val bySource = out.groupBy(_.getString(0))
    // every doc lands in exactly one bucket
    assert(bySource("web").map(_.getLong(2)).sum == 3L)
    assert(bySource("books").map(_.getLong(2)).sum == 2L)
    // within-source doc shares sum to 1
    bySource.values.foreach { rows =>
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12)
    }
    val webBuckets = bySource("web")
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(webBuckets("unscored") == 1L) // the 1-word doc, explicit
  }

  test("pipelineKeep: each stage gates the next; flags monotone; budget is a quality prefix") {
    // all-stopword 100-word texts score quality exactly 1.0; permuting the
    // word order changes the content hash without touching the score
    def sw(lead: String) = (lead +: Seq.fill(99)("the")).mkString(" ")
    val d = Seq(
      (1L, sw("of"), "A"),   // kept everywhere
      (2L, sw("of"), "A"),   // exact duplicate of 1 -> dedup drop
      (3L, Seq.fill(10)("the").mkString(" "), "A"), // quality 0.1 -> q drop
      (4L, sw("to"), "B"),
      (5L, sw("in"), "B"),
      (6L, sw("is"), "B"))   // rank 3 in B -> cap=2 drop
      .toDF("doc_id", "text", "source")
    val out = Curation.pipelineKeep(d, minQuality = 0.3, capPerSource = 2,
        budgetWords = 250L).collect()
      .map(r => r.getLong(0) -> r).toMap
    def flags(id: Long) = {
      val r = out(id)
      (r.getAs[Long]("q_keep"), r.getAs[Long]("dedup_keep"),
        r.getAs[Long]("cap_keep"), r.getAs[Long]("final_keep"))
    }
    assert(flags(1L) == (1L, 1L, 1L, 1L))
    assert(flags(2L) == (1L, 0L, 0L, 0L), "higher-id exact copy drops at dedup")
    assert(flags(3L) == (0L, 0L, 0L, 0L), "low quality drops at the screen")
    assert(flags(4L) == (1L, 1L, 1L, 1L))
    assert(flags(5L) == (1L, 1L, 1L, 0L), "cap survivor past the budget")
    assert(flags(6L) == (1L, 1L, 0L, 0L), "rank 3 of cap 2 drops")
    // budget walk: docs 1 and 4 fill 100 + 100 <= 250; doc 5 would hit 300
    assert(out(1L).getAs[Long]("cum_words") == 100L)
    assert(out(4L).getAs[Long]("cum_words") == 200L)
    assert(out(5L).isNullAt(out(5L).fieldIndex("cum_words")))
    // flags are monotone per doc: final <= cap <= dedup <= q
    out.values.foreach { r =>
      assert(r.getAs[Long]("final_keep") <= r.getAs[Long]("cap_keep"))
      assert(r.getAs[Long]("cap_keep") <= r.getAs[Long]("dedup_keep"))
      assert(r.getAs[Long]("dedup_keep") <= r.getAs[Long]("q_keep"))
    }
  }

  test("interleaveOrder: dense per-source ranks on the r*S + idx slot grid; deterministic") {
    val d = (1L to 5L).map(i => (i, s"t$i", if (i <= 3) "A" else "B"))
      .toDF("doc_id", "text", "source")
    val out = Curation.interleaveOrder(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // per-source ranks are dense 1..n
    assert(out.values.filter(_._1 == "A").map(_._2).toSet == Set(1L, 2L, 3L))
    assert(out.values.filter(_._1 == "B").map(_._2).toSet == Set(1L, 2L))
    // every position sits on its slot: (rank-1)*2 + idx(source)
    out.values.foreach { case (src, rank, pos) =>
      val idx = if (src == "A") 0L else 1L
      assert(pos == (rank - 1) * 2 + idx)
    }
    // positions are collision-free and the first two slots hold one of each
    assert(out.values.map(_._3).toSet.size == 5)
    assert(out.values.filter(_._3 < 2).map(_._1).toSet == Set("A", "B"))
    // parallelism determinism
    val again = Curation.interleaveOrder(d.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == out)
  }

  test("splitReport: counts reconcile with splitAssign; doc shares sum to 1") {
    val d = (1L to 200L).map(i => (i, Seq.fill(5)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rep = Curation.splitReport(d).collect().map(r => r.getString(0) -> r).toMap
    assert(rep.keySet.subsetOf(Set("train", "val", "test")))
    assert(rep.values.map(_.getAs[Long]("n_docs")).sum == 200L)
    assert(rep.values.map(_.getAs[Long]("n_tokens")).sum == 1000L)
    assert(math.abs(rep.values.map(_.getAs[Double]("doc_share")).sum - 1.0) < 1e-12)
    // uniform 5-token docs: token share == doc share exactly
    rep.values.foreach(r =>
      assert(r.getAs[Double]("token_share") == r.getAs[Double]("doc_share")))
    // reconciles against the assignment itself
    val byAssign = Curation.splitAssign(d).groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rep.foreach { case (k, r) => assert(r.getAs[Long]("n_docs") == byAssign(k)) }
  }

  test("minhashLshIncremental == full LSH restricted to pairs touching a new doc") {
    // three near-dup families so base-base, base-new and new-new pairs all exist
    val fam = (v: String, i: Long) => base.replace("dog", v) + s" tail$i"
    val baseDocs = docs(
      1L -> fam("dog", 1), 2L -> fam("dog", 2),
      10L -> fam("cat", 1), 20L -> ("unrelated words about engines " * 3))
    val newDocs = docs(3L -> fam("dog", 3), 11L -> fam("cat", 2))
    val newIds = Set(3L, 11L)
    val full = Dedup.minhashLsh(baseDocs.unionByName(newDocs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = full.filter(p => newIds(p._1) || newIds(p._2))
    val incr = Dedup.minhashLshIncremental(baseDocs, newDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr == expected)
    assert(expected.nonEmpty && expected.size < full.size,
      "fixture sanity: base-base pairs exist and are excluded")
  }

  test("minhashLshIncremental honors the bucket cap over the combined corpus") {
    val clique = (1L to 6L).map(i => i -> (base + " shared")).toSeq
    val baseDocs = docs(clique.take(4): _*)
    val newDocs = docs(clique.drop(4): _*)
    val capped = Dedup.minhashLshIncremental(baseDocs, newDocs, maxBucket = 3L)
    assert(capped.count() == 0L, "the 6-clique bucket exceeds the cap on the COMBINED corpus")
  }
}
