package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dev-only growth-tier smoke for the ROUND-14 trades (VERDICT r13 item 7 +
 * this round's graph change), same replica scheme as [[ScaleSmokeR13]].
 * Claims under test, each at a small tier and a `grow`× tier:
 *
 *  1. `events_cuped` / `events_concurrency` cached intermediates: the r13
 *     trade accepted ~+0.5–1 s of local cache-materialization cost for
 *     fewer corpus passes at scale — the cached form must be ≤ the
 *     uncached form at the grown tier ([[graft.operators.Frames.disableForAb]]
 *     toggles the uncached form, same code path).
 *  2. `Graph.hits` raw-frame lineage cut (round 14): cutting the RAW
 *     half-step frame (instead of the renormed one) removes the duplicated
 *     |V|⋈|E| join+aggregate the tot-broadcast re-executed each half-step;
 *     the old placement is reproduced inline (hitsOldCut) for the A/B.
 *
 * Run: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_SMOKE_REPS
 * (default 1), SPARK_GRAFT_SMOKE_GROW (default 20).
 */
object ScaleSmokeR14 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPS", "1").toInt
    val grow = sys.env.getOrElse("SPARK_GRAFT_SMOKE_GROW", "20").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- events tiers (replicated users keep per-user row counts flat) ----
    val ev0 = graft.operators.Points.table(spark, sfDir, "events")
      .withColumn("ts_ms", expr("ts div 1000000"))
      .select(col("user_id"), col("ts_ms"), col("event_id"), col("event_type"))
    def evTier(r: Int) = ev0
      .crossJoin(spark.range(r.toLong).select(col("id").as("r")))
      .select(concat(col("user_id"), lit("_"), col("r")).as("user_id"),
        col("ts_ms"), col("event_id"), col("event_type"))
      .repartition(32)
      .localCheckpoint() // pin the input so A/B times the operator, not the replica build
    def cupedOn(ev: DataFrame) = graft.operators.Funnel.cupedReport(
      ev.withColumn("variant",
        when(substring(col("user_id"), -1, 1).isin("0", "2", "4", "6", "8"), "control")
          .otherwise("treat")), "variant")
    def concOn(ev: DataFrame) = graft.operators.Sessionize.concurrency(
      ev, "user_id", "ts_ms", "event_id", gapMs = 3600000L)

    for ((r, label) <- Seq(reps -> s"${reps}x", grow -> s"${grow}x")) {
      val ev = evTier(r)
      ev.count()
      for ((name, mk) <- Seq("cuped" -> (() => cupedOn(ev)),
                             "concurrency" -> (() => concOn(ev)))) {
        graft.operators.Frames.disableForAb = true
        spark.catalog.clearCache()
        mk().count() // codegen warm
        val un = timed(mk().count())
        graft.operators.Frames.disableForAb = false
        spark.catalog.clearCache()
        mk().count()
        spark.catalog.clearCache()
        val ca = timed(mk().count())
        println(f"SCALER14 $name $label uncached $un%.2f s vs cached $ca%.2f s " +
          f"(cached/uncached ${ca / un}%.2f)")
      }
    }

    // ---- graph tiers: hits with the r14 raw-frame cut vs the old
    // ---- renormed-frame cut (inline copy of the pre-r14 loop) ----
    def hitsOldCut(edges: DataFrame, iters: Int): DataFrame = {
      val scale = 1000000000000L
      val w = edges.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .localCheckpoint(false)
      val nodes = w.select(col("src").as("domain"))
        .union(w.select(col("dst").as("domain"))).distinct()
        .localCheckpoint(false)
      val n = broadcast(nodes.agg(count(lit(1)).as("n")))
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
        val authRaw = nodes.join(
          hubs.as("h").join(w.as("e"), col("h.domain") === col("e.src"))
            .groupBy(col("e.dst").as("domain"))
            .agg(sum(col("h.hub_fp") * col("e.w")).as("auth_fp")),
          Seq("domain"), "left")
          .select(col("domain"), coalesce(col("auth_fp"), lit(0L)).as("auth_fp"))
        auths = renorm(authRaw, "auth_fp")
        val hubRaw = nodes.join(
          auths.as("a").join(w.as("e"), col("a.domain") === col("e.dst"))
            .groupBy(col("e.src").as("domain"))
            .agg(sum(col("a.auth_fp") * col("e.w")).as("hub_fp")),
          Seq("domain"), "left")
          .select(col("domain"), coalesce(col("hub_fp"), lit(0L)).as("hub_fp"))
        hubs = renorm(hubRaw, "hub_fp")
        if (i < iters) { auths = auths.localCheckpoint(false); hubs = hubs.localCheckpoint(false) }
      }
      auths.join(hubs, Seq("domain"))
        .select(col("domain"), col("auth_fp"), col("hub_fp"),
          (col("auth_fp").cast("double") / scale).as("auth"),
          (col("hub_fp").cast("double") / scale).as("hub"))
    }

    val docs = graft.operators.Points.table(spark, sfDir, "documents")
    def edgeTier(r: Int) = docs
      .crossJoin(spark.range(r.toLong).select(col("id").as("rr")))
      .select(concat(lit("site"), (col("doc_id") % 97) * (col("rr") + 1)).as("src"),
        concat(lit("site"), (col("doc_id") % 89) * (col("rr") + 1) + 1).as("dst"))
      .repartition(32).localCheckpoint()
    for ((r, label) <- Seq(reps -> s"${reps}x", grow -> s"${grow}x")) {
      val e = edgeTier(r)
      e.count()
      hitsOldCut(e, 5).count() // warm
      val old = timed(hitsOldCut(e, 5).count())
      graft.operators.Graph.hits(e, 5).count() // warm
      val nw = timed(graft.operators.Graph.hits(e, 5).count())
      // bit-exactness: the two cut placements must agree value-for-value
      val diff = graft.operators.Graph.hits(e, 5)
        .exceptAll(hitsOldCut(e, 5)).count()
      println(f"SCALER14 hits $label oldCut $old%.2f s vs rawCut $nw%.2f s " +
        f"(raw/old ${nw / old}%.2f), exceptAll diff rows = $diff")
    }
    spark.stop()
  }
}
