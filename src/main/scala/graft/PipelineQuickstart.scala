package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Sessionize, TextAnalysis}

/**
 * End-to-end training-data pipeline demo over the synthetic corpus: score ->
 * filter -> dedup -> curate -> budget, the flow a 100 TB pretraining mix
 * preparation actually runs, here at demo scale with every stage printed.
 * Usage: `runMain graft.PipelineQuickstart [sfDir]`.
 */
object PipelineQuickstart {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.operators.Points.table(spark, sfDir, "documents").cache()
    println(s"corpus: ${docs.count()} docs")

    // 1. score: quality + repetition as row-wise columns on the SAME scan —
    //    no corpus self-join for values that are functions of the row
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityCol)
      .withColumn("dup_gram_ratio", TextAnalysis.dupGramRatioCol())

    // 2. filter: drop degenerate docs (low quality or heavy repetition)
    val kept = scored.where(col("quality") > 0.2 && coalesce(col("dup_gram_ratio"), lit(0.0)) < 0.5)
    println(s"after quality/repetition filter: ${kept.count()}")

    // 3. dedup: exact first (cheap), then near-dup clustering keeps one
    //    representative per connected component of jaccard pairs
    val exactReps = Dedup.exact(kept).select(col("keep_doc_id").as("doc_id"))
    val exactKept = kept.join(exactReps, "doc_id")
    val pairs = Dedup.ngramJaccard(exactKept, threshold = 0.7).select("a", "b")
    val comps = Dedup.clusters(pairs)
    val dropped = comps.where(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val deduped = exactKept.join(dropped, Seq("doc_id"), "left_anti")
    println(s"after exact + near-dup dedup: ${deduped.count()}")

    // 4. curate: per-language quality top-k, then a token budget per language
    val top = Curation.topKByLanguage(deduped, k = 100)
    println(s"per-language top-100 sample:")
    top.groupBy("lang_guess").count().orderBy("lang_guess").show()
    val budget = Curation.tokenBudget(deduped, budget = 5000L)
    println(s"5k-token-per-language budget keeps ${budget.count()} docs:")
    budget.groupBy("lang_guess")
      .agg(count(lit(1)).as("docs"), max("cum_words").as("words_used"))
      .orderBy("lang_guess").show()

    // 5. the same engine serves the behavioral side: sessionized events
    val ev = graft.operators.Points.table(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
    val sessions = Sessionize.sessionStats(ev, "user_id", "ts_ms", "event_id",
      gapMs = 21600000L, valueCol = "value")
    println(s"6h-gap sessions: ${sessions.count()} across ${ev.select("user_id").distinct().count()} users")

    spark.stop()
  }
}
