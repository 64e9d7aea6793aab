package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The 1000×-class smoke tier: ONLY the ~10 heaviest operators, one decade
 * above [[ScaleSmoke]]'s 100× sweep — 5M documents (sf0.1 × 1000 replicas)
 * and ~100M events — each in its 100 TB configuration (auto-derived or
 * hand-tuned caps, blocked candidate generation). The claim under test is
 * the same as ScaleSmoke's, one more decade out: growth stays
 * linear-or-better, the auto-caps still bound candidate volume on a
 * pathologically duplicated corpus (every doc has 999 near-identical
 * siblings), and nothing OOMs or goes quadratic. Not part of the driver
 * contract; results are appended to BASELINE.md by hand.
 *
 * Run: SPARK_GRAFT_SMOKE_REPS=1000 SPARK_GRAFT_SMOKE_EV_REPS=100
 *      runMain graft.tools.ScaleSmokeHeavy   (Xmx >= 64g recommended)
 */
object ScaleSmokeHeavy {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPS", "1000").toInt
    val evReps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_EV_REPS", "100").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64) // 5M-doc shuffles spill less in 64 slices
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SMOKE_ONLY=substr: run only ops whose label contains it
    // (isolating one row on an idle host — shared-JVM cache pressure from
    // earlier ops measurably inflates later rows at this tier)
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
    def t[A](name: String)(f: => A): Any =
      if (only.exists(s => !name.contains(s))) ()
      else {
        val t0 = System.nanoTime(); val r = f
        println(f"SCALE1K $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
    val base = graft.operators.Points.table(spark, sfDir, "documents")
    val n = base.count()
    val docs = base
      .crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("doc_id") * reps + col("r")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("r")).as("text"))
      .repartition(64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"SCALE1K corpus: ${docs.count()} docs (${n} x $reps)")

    // 1-2. minhash auto-cap at the 1000-sibling clique corpus: the derived
    // cap must land BELOW the duplication factor so candidate generation
    // stays linear (the whole point of the data-derived cap)
    val autoCap: Long = t("minhashAutoCap (quantile pre-aggregate)") {
      graft.operators.Dedup.minhashAutoCap(docs)
    } match {
      case c: Long => c
      case _ => 0L // filtered out by SPARK_GRAFT_SMOKE_ONLY
    }
    if (autoCap > 0L) {
      println(s"SCALE1K minhash auto-derived cap = $autoCap (duplication factor $reps)")
      t(s"minhashLsh auto-capped (maxBucket=$autoCap)") {
        graft.operators.Dedup.minhashLsh(docs, maxBucket = autoCap).count()
      }
    }

    // 3. exact-substring dedup: worst-case island merging (every window of
    // the shared prefix repeats reps times)
    t("substringSpans (k=10 exact-substring dedup)") {
      graft.operators.Dedup.substringSpans(docs).count()
    }

    // 4. component representative selection over capped pairs
    t("keepBest (capped pairs, quality representative per component)") {
      graft.operators.Dedup.keepBest(docs, threshold = 0.7, maxDocFreq = 50L)
        .where(col("doc_id") === col("keep_doc_id")).count()
    }

    // 5. cluster histogram over the same capped pair frame
    t("clusterSizes (capped pairs + clusters + histogram)") {
      graft.operators.Dedup.clusterSizes(docs, maxDocFreq = 50L).count()
    }

    // 6. corpus-wide nearest-rank percentiles
    t("qualitySummary (nearest-rank p50/p90/p99)") {
      graft.operators.Curation.qualitySummary(docs).count()
    }

    // 7. the composed production screen
    val sdocs = docs.withColumn("source", (col("doc_id") % 40).cast("string"))
    t("pipelineKeep (quality -> dedup -> cap -> budget, composed)") {
      graft.operators.Curation.pipelineKeep(sdocs, minQuality = 0.3,
        capPerSource = 200000, budgetWords = 1000000000L).count()
    }

    // 8. eval-set decontamination at a 0.1% probe set (5k probes)
    t("decontamFilter (0.1% probe set, n-gram-blocked join + rollup)") {
      graft.operators.Curation.decontamFilter(
        docs, docs.where(col("doc_id") % 1000 === 0)).agg(sum("keep")).collect()
    }

    // 9-10. retrieval over the 5M-doc corpus: 20 probe queries
    val q20 = docs.where(col("doc_id") % (n * reps / 20) === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
    t("bm25TopK (20 queries, k=10)") {
      graft.operators.Search.bm25TopK(docs, q20, k = 10).count()
    }
    t("bestSnippets (matched-position anchors; per-(q,doc) windows)") {
      graft.operators.Search.bestSnippets(docs, q20, window = 12).count()
    }
    docs.unpersist()

    // 11. robust outliers over ~100M events (two rank-picked stats)
    val evBase = graft.operators.Points.table(spark, sfDir, "events")
    val ev = evBase
      .crossJoin(spark.range(evReps).select(col("id").as("r")))
      .select((col("event_id") * evReps + col("r")).as("event_id"),
        (col("user_id") * evReps + col("r")).as("user_id"),
        expr("ts div 1000000").as("ts_ms"), col("event_type"), col("value"))
      .repartition(64)
    println(s"SCALE1K events: ${ev.count()}")
    t("madOutliers (two rank-picked stats, broadcast back)") {
      graft.operators.Anomaly.madOutliers(ev, threshold = 1.5).count()
    }

    spark.stop()
  }
}
