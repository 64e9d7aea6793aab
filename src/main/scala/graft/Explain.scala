package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan inspector: prints `explain("formatted")` for selected queries so scan
 * pushdown, partial aggregation, and broadcast joins can be audited.
 * Usage: `runMain graft.Explain [queryName ...]` (defaults to a headline set).
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing", "q3_segment_revenue", "ts_downsample_avg", "ts_rate", "embed_knn",
        "events_asof_attrib", "events_sessions", "dedup_embed_cross", "curate_stratified",
        "dedup_passages", "curate_pack", "text_vocab", "embed_quantize",
        "embed_centroid", "curate_source_cap", "text_lm_score",
        "dedup_bloom_screen", "text_chunks", "text_gopher", "curate_quality_summary",
        "cdc_scd2", "priv_tcloseness", "layout_prune_audit", "events_join_skew",
        "dedup_incremental")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
