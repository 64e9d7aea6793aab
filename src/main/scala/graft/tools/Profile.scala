package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timer for hot queries (dev tool; not part of the driver
  * contract). Usage: `runMain graft.tools.Profile` with SPARK_GRAFT_SF_DIR. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.operators.Points.table(spark, sfDir, "documents")
    if (args.contains("lsh")) {
      // decompose shared_build_lsh_store's per-pass cost: batch LSH over the
      // bootstrap 2/3 vs the bucket-pruned increment screen against the
      // persisted signature store (mirrors LlmQueries.lshStoreCandidates)
      import org.apache.spark.sql.functions.col
      val d = docs.select(col("doc_id"), col("text"))
      val base = d.where(col("doc_id") % 3 =!= 0)
      val inc = d.where(col("doc_id") % 3 === 0)
      val idx = java.nio.file.Files.createTempDirectory("graft-lshprof").toString + "/index"
      t("lshMaintain bootstrap (one-time store write)") {
        graft.tools.Maintenance.lshMaintain(spark, idx, base, passId = "boot")
      }
      for (i <- 1 to 3) {
        spark.catalog.clearCache()
        t(s"pass$i a: Dedup.minhashLsh(base).count") {
          graft.operators.Dedup.minhashLsh(base).count()
        }
        t(s"pass$i b: Maintenance.lshCandidates(store, inc).count") {
          graft.tools.Maintenance.lshCandidates(spark, idx, inc).count()
        }
      }
    } else {
      val sh = t("shingles.distinct.count") { graft.operators.Dedup.shingles(docs).count() }
      println(s"  shingle rows: $sh")
      val pairs = graft.operators.Dedup.ngramJaccard(docs, threshold = 0.7).select("a", "b")
      val n = t("ngramJaccard(0.7) pairs count") { pairs.count() }
      println(s"  pair rows: $n")
      t("clusters over cached pairs") { graft.operators.Dedup.clusters(pairs).count() }
      t("clusters again (everything warm)") { graft.operators.Dedup.clusters(pairs).count() }
    }
    spark.stop()
  }
}
