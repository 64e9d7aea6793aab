package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dev-only scale smoke for the ROUND-9 operators, same replica scheme as
 * [[ScaleSmoke]] (docs ×reps near-dup siblings, embeddings ×embReps,
 * events ×reps with a widened key space). The scale claims under test:
 *   - tfidfTopK: matched-volume-bounded like bm25 (its extra norm pass is
 *     matched-docs-only);
 *   - pairCosineHistogram: pair count FIXED at nBlocks·C(cap,2) regardless
 *     of corpus size (the row should stay FLAT as vectors grow);
 *   - centroidSilhouette: one nLists fan-out — linear in vectors;
 *   - adamicAdar: wedge-bounded like linkPredict;
 *   - rollingUniques: a 7× explode + one distinct-count aggregate;
 *   - theilSen / holtForecast / volumeBands / seasonalNaiveError: bounded
 *     by BUCKETS (time range), so they should be FLAT as event volume
 *     grows within the same range;
 *   - quotaSample2d: the sharded cap window;
 *   - bloomFprAudit: one bitset build + a probe scan;
 *   - centroidDrift: one (group, split, dim) aggregate.
 * Run: SPARK_GRAFT_SMOKE_REPS / SPARK_GRAFT_SMOKE_EMB_REPS as in ScaleSmoke.
 */
object ScaleSmokeR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPS", "20").toInt
    val embReps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_EMB_REPS", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_SMOKE_ONLY=substr: run only ops whose label contains it
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
    def t[A](name: String)(f: => A): Any =
      if (only.exists(s => !name.contains(s))) ()
      else {
        val t0 = System.nanoTime(); val r = f
        println(f"SCALER9 $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }

    val base = graft.operators.Points.table(spark, sfDir, "documents")
    val n = base.count()
    val docs = base
      .crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("doc_id") * reps + col("r")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("r")).as("text"),
        col("lang"), col("source"))
      .repartition(32)
      .cache()
    println(s"SCALER9 corpus: ${docs.count()} docs (${n} x $reps)")

    val q20 = docs.where(col("doc_id") % (n * reps / 20) === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
    t("tfidfTopK (20 queries, k=10; matched-docs-only norm pass)") {
      graft.operators.Search.tfidfTopK(docs, q20, k = 10).count()
    }
    t("quotaSample2d (cap=5 per lang x source cell, sharded windows)") {
      graft.operators.Curation.quotaSample2d(docs, cap = 5).count()
    }
    t("bloomBits build alone (2^24-bit bitset agg)") {
      graft.operators.Dedup.bloomBits(docs, hexDigits = 6).collect()
    }
    t("bloomFprAudit (bitset build + salted probe scan)") {
      val probes = docs.select(col("doc_id"),
        concat(col("text"), lit(" fprprobe")).as("text"))
      graft.operators.Dedup.bloomFprAudit(docs, probes, hexDigits = 6).collect()
    }
    val edges = docs.select(
      concat(lit("site"), (col("doc_id") % 2000).cast("string")).as("src"),
      concat(lit("cdn"), (col("doc_id") % 300).cast("string")).as("dst"))
    t("adamicAdar (wedge-bounded, maxDeg=2000 hub cap)") {
      graft.operators.Graph.adamicAdar(edges, maxDeg = 2000L).count()
    }
    docs.unpersist()

    val embBase = graft.operators.Points.table(spark, sfDir, "embeddings")
    val emb = embBase
      .crossJoin(spark.range(embReps).select(col("id").as("r")))
      .select((col("vec_id") * embReps + col("r")).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .cache()
    println(s"SCALER9 vectors: ${emb.count()}")
    t("pairCosineHistogram (64 blocks x C(32,2) pairs — should be FLAT)") {
      graft.operators.Similarity.pairCosineHistogram(emb).count()
    }
    t("centroidSilhouette (16-centroid fan-out, per-vec window)") {
      graft.operators.SimilarityIvf.centroidSilhouette(emb, nLists = 16).count()
    }
    t("centroidDrift (one (label, split, dim) aggregate)") {
      graft.operators.Similarity.centroidDrift(emb).count()
    }
    emb.unpersist()

    val evBase = graft.operators.Points.table(spark, sfDir, "events")
    val ev = evBase
      .crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("event_id") * reps + col("r")).as("event_id"),
        (col("user_id") * reps + col("r")).as("user_id"),
        expr("ts div 1000000").as("ts_ms"), col("event_type"), col("value"))
      .repartition(32)
      .cache()
    println(s"SCALER9 events: ${ev.count()}")
    t("rollingUniques (7x explode + distinct-count aggregate)") {
      graft.operators.Funnel.rollingUniques(ev, "event_type", "ts_ms", "user_id").count()
    }
    t("volumeBands (bucket-bounded trailing window — FLAT)") {
      graft.operators.Anomaly.volumeBands(ev, "event_type", "ts_ms").count()
    }
    t("seasonalNaiveError (bucket-bounded lag join — FLAT)") {
      graft.operators.Anomaly.seasonalNaiveError(ev, "event_type", "ts_ms").count()
    }
    val ptsMs = ev.select(col("event_type").as("metric"), col("ts_ms").as("ts"),
      col("value"), map(lit("user"), col("user_id").cast("string")).as("tags"))
    t("holtForecast (bucket-bounded sorted fold — FLAT)") {
      graft.operators.TimeSeries.holtForecast(ptsMs).count()
    }
    t("theilSen (quadratic in BUCKETS only — FLAT in event volume)") {
      graft.operators.TimeSeries.theilSen(ptsMs).count()
    }
    spark.stop()
  }
}
