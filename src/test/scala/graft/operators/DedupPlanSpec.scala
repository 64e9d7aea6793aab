package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/**
 * Scale-safety of the fuzzy-dedup plans: no stage may broadcast a
 * corpus-sized (per-doc or per-shingle) table. With the auto-broadcast
 * threshold disabled, a BroadcastExchange can only appear if the operator
 * itself planted a broadcast hint — so its absence proves the plan
 * shuffle-joins on distributed keys and would survive a 100 TB corpus
 * (AQE may still elect a broadcast at runtime when a side is genuinely
 * small, which is the desired behavior and not hint-forced).
 */
class DedupPlanSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def docs: DataFrame =
    (0L until 32L).map(i => (i, s"some document number $i with shared words and unique token t$i"))
      .toDF("doc_id", "text")

  private def broadcasts(df: DataFrame): Seq[BroadcastExchangeExec] = {
    val plan = df.queryExecution.executedPlan
    val unwrapped = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    unwrapped.collect { case b: BroadcastExchangeExec => b }
  }

  private def withNoAutoBroadcast[T](body: => T): T = {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("minhashLsh plans without any broadcast exchange") {
    withNoAutoBroadcast {
      val b = broadcasts(Dedup.minhashLsh(docs))
      assert(b.isEmpty, s"corpus-sized broadcast in minhashLsh plan: $b")
    }
  }

  test("ngramJaccard (capped and uncapped) plans without any broadcast exchange") {
    withNoAutoBroadcast {
      val plain = broadcasts(Dedup.ngramJaccard(docs, threshold = 0.1))
      assert(plain.isEmpty, s"corpus-sized broadcast in ngramJaccard plan: $plain")
      val capped = broadcasts(Dedup.ngramJaccard(docs, threshold = 0.1, maxDocFreq = 16))
      assert(capped.isEmpty, s"corpus-sized broadcast in capped ngramJaccard plan: $capped")
    }
  }

  test("containment plans without any broadcast exchange") {
    withNoAutoBroadcast {
      val b = broadcasts(Dedup.containment(docs, threshold = 0.1))
      assert(b.isEmpty, s"corpus-sized broadcast in containment plan: $b")
    }
  }

  test("embedding LSH pair path plans without any broadcast exchange") {
    withNoAutoBroadcast {
      val emb = (0L until 64L)
        .map(i => (i, Array.tabulate(8)(d => (0.1 * ((i + d) % 7)).toFloat)))
        .toDF("vec_id", "embedding")
      val b = broadcasts(Similarity.lshBucketedPairs(emb))
      assert(b.isEmpty, s"corpus-sized broadcast in lshBucketedPairs plan: $b")
    }
  }

  test("simhashPairs plans without any broadcast exchange") {
    withNoAutoBroadcast {
      val b = broadcasts(Dedup.simhashPairs(docs))
      assert(b.isEmpty, s"corpus-sized broadcast in simhashPairs plan: $b")
    }
  }

  test("contamination plans without a FORCED broadcast of the probe grams") {
    // probes here are corpus-sized; with auto-broadcast off, any
    // BroadcastExchange in the plan could only come from a planted hint —
    // the round-3 OOM hazard. (With AQE on, genuinely small probe sets still
    // get a runtime broadcast, which is the wanted behavior.)
    withNoAutoBroadcast {
      val b = broadcasts(TextAnalysis.contamination(docs, docs, n = 3, minShared = 1))
      assert(b.isEmpty, s"forced broadcast in contamination plan: $b")
    }
  }

  test("passageDedup plans without any broadcast exchange under forced-off AQE") {
    // with auto-broadcast disabled, a BroadcastExchange could only come from
    // a planted hint; the frequency side must be left to AQE's runtime call
    // (probe-gram pattern), never forced — the corpus side must never ship
    withNoAutoBroadcast {
      val b = broadcasts(Dedup.passageDedup(docs))
      assert(b.isEmpty, s"forced broadcast in passageDedup plan: $b")
    }
  }

  test("simhashPairs pair path is codegen arithmetic — no higher-order functions") {
    // the round-3 regression: an interpreted 64-element filter(sequence(...))
    // lambda per candidate pair. The packed-LONG rewrite must keep Hamming as
    // bit_count(xor) — no HigherOrderFunction anywhere in the plan.
    val df = Dedup.simhashPairs(docs)
    val hofs = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case h: org.apache.spark.sql.catalyst.expressions.HigherOrderFunction => h
      })
    }.flatten
    assert(hofs.isEmpty, s"interpreted higher-order function in simhash pair path: $hofs")
  }

  test("simhashPairs bucket cap drops hot-key buckets from candidate generation") {
    // 8 identical docs collide on every band-pair key (bucket size 8); a cap
    // below that kills all their candidates, while distinct docs sharing no
    // near-dup structure are unaffected by construction
    val same = (0L until 8L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val capped = Dedup.simhashPairs(same.toDF("doc_id", "text"), maxBucket = 7L)
    assert(capped.collect().isEmpty, "cap must drop the hot bucket's candidates")
    val uncapped = Dedup.simhashPairs(same.toDF("doc_id", "text"))
    assert(uncapped.count() == 8L * 7L / 2L, "uncapped finds every identical pair once")
  }

  test("minhashLsh still surfaces a planted near-duplicate (post de-broadcast)") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val out = Dedup.minhashLsh(
      Seq(1L -> base, 2L -> base.replace("dog", "cat"), 3L -> "completely unrelated words about engines")
        .toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.exists { case (a, b, est) => a == 1L && b == 2L && est >= 0.5 })
    assert(out.count { case (a, b, _) => a == 1L && b == 2L } == 1, "pair emitted once")
  }
}
