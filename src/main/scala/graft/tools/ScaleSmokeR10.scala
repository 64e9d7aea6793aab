package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Dev-only scale smoke for the ROUND-10 operators, same replica scheme as
 * [[ScaleSmoke]] / [[ScaleSmokeR9]]. The scale claims under test:
 *   - matchedPostings: ONE corpus scan + term-filtered tf aggregate whose
 *     cost amortizes across the whole retrieval family — the three scorers
 *     on the persisted frame should each cost a small fraction of the
 *     self-contained form (scorer work is matched-bounded);
 *   - prfExpandFromPostings: the incremental expansion fetch scans only the
 *     newly picked terms — second-core cost ≪ a fresh full core;
 *   - dirichletTopKFromPostings (decomposed): no candidates×terms frame —
 *     growth tracks MATCHED volume, same class as bm25;
 *   - kmvSetOps: sketches are ≤ k per key — the pair/est stage is
 *     corpus-size-independent (the linear part is the distinct+hash scan);
 *   - holtWintersForecast: bucket-bounded sorted fold — FLAT in event
 *     volume within a fixed time range;
 *   - funnelRates: funnel (users-bounded) + one global aggregate — linear;
 *   - heapsLaw: one exploded scan + two (source[, term]) aggregates —
 *     linear in tokens, vocabulary-bounded output.
 * Run: SPARK_GRAFT_SMOKE_REPS / SPARK_GRAFT_SMOKE_EMB_REPS as in ScaleSmoke;
 * SPARK_GRAFT_SMOKE_ONLY=substr isolates one op per JVM.
 */
object ScaleSmokeR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPS", "20").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
    def t[A](name: String)(f: => A): Any =
      if (only.exists(s => !name.contains(s))) ()
      else {
        val t0 = System.nanoTime(); val r = f
        println(f"SCALER10 $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
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
    println(s"SCALER10 corpus: ${docs.count()} docs (${n} x $reps)")

    val q20 = docs.where(col("doc_id") % (n * reps / 20) === 0)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("qtext"))
    val qTerms = q20
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    val postings = graft.operators.Search.matchedPostings(docs, qTerms)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stats = graft.operators.Search.corpusStats(docs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("matchedPostings build (the family's one corpus scan)") {
      postings.count(); stats.count()
    }
    t("bm25TopKFromPostings (k=10 on the shared frame)") {
      graft.operators.Search.bm25TopKFromPostings(postings, stats, qTerms, k = 10).count()
    }
    t("dirichletTopKFromPostings (decomposed, k=10)") {
      graft.operators.Search.dirichletTopKFromPostings(postings, stats, qTerms, k = 10).count()
    }
    t("tfidfTopKFromPostings (k=10; + matched-docs norm pass)") {
      graft.operators.Search.tfidfTopKFromPostings(docs, postings, stats, qTerms, k = 10).count()
    }
    t("prfExpandFromPostings (r=3, m=2: incremental expansion fetch + re-rank)") {
      val fb = graft.operators.Search.bm25TopKFromPostings(postings, stats, qTerms, k = 3)
      graft.operators.Search.prfExpandFromPostings(
        docs, Some((postings, stats)), q20, fb, r = 3, m = 2, k = 10).count()
    }
    t("heapsLaw (one exploded scan, two aggregates)") {
      graft.operators.TextAnalysis.heapsLaw(docs).count()
    }
    postings.unpersist(); stats.unpersist(); docs.unpersist()

    val evBase = graft.operators.Points.table(spark, sfDir, "events")
    val ev = evBase
      .crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("event_id") * reps + col("r")).as("event_id"),
        (col("user_id") * reps + col("r")).as("user_id"),
        expr("ts div 1000000").as("ts_ms"), col("event_type"), col("value"))
      .repartition(32)
      .cache()
    println(s"SCALER10 events: ${ev.count()}")
    t("kmvSetOps (k=64 sketches; pair stage corpus-size-independent)") {
      graft.operators.Sketches.kmvSetOps(ev, "event_type", "user_id", k = 64).count()
    }
    val ptsMs = ev.select(col("event_type").as("metric"), col("ts_ms").as("ts"),
      col("value"), map(lit("user"), col("user_id").cast("string")).as("tags"))
    t("holtWintersForecast (bucket-bounded rotating fold — FLAT)") {
      graft.operators.TimeSeries.holtWintersForecast(ptsMs).count()
    }
    t("funnelRates (users-bounded funnel + one global aggregate)") {
      graft.operators.Funnel.funnelRates(ev, "user_id", "ts_ms", "event_type",
        Seq("signup", "view", "purchase"), horizonMs = 86400000L).count()
    }
    spark.stop()
  }
}
