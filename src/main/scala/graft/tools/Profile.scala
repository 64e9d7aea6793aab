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
    val sh = t("shingles.distinct.count") { graft.operators.Dedup.shingles(docs).count() }
    println(s"  shingle rows: $sh")
    val pairs = graft.operators.Dedup.ngramJaccard(docs, threshold = 0.7).select("a", "b")
    val n = t("ngramJaccard(0.7) pairs count") { pairs.count() }
    println(s"  pair rows: $n")
    t("clusters over cached pairs") { graft.operators.Dedup.clusters(pairs).count() }
    t("clusters again (everything warm)") { graft.operators.Dedup.clusters(pairs).count() }
    spark.stop()
  }
}
// scratch: finer clusters breakdown (appended temporarily)
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val docs = graft.operators.Points.table(spark, sfDir, "documents")
    val pairs = graft.operators.Dedup.ngramJaccard(docs, threshold = 0.7).select("a", "b")
    t("warmup pairs") { pairs.count() }
    val p = pairs.cache()
    t("p.count") { p.count() }
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .unionByName(p.select(col("a").as("src"), col("a").as("dst")))
      .unionByName(p.select(col("b").as("src"), col("b").as("dst")))
      .cache()
    t("edges.count") { edges.count() }
    for (np <- Seq(32, 4, 1)) {
      spark.conf.set("spark.sql.shuffle.partitions", np)
      def sweep(l: org.apache.spark.sql.DataFrame) =
        edges.join(l.select(col("id").as("dst"), col("label")), "dst")
          .groupBy(col("src").as("id")).agg(min("label").as("label"))
      val labels = t(s"np=$np labels init") {
        val l = edges.select(col("src").as("id")).distinct().withColumn("label", col("id")).cache()
        l.count(); l }
      val s2 = sweep(sweep(labels)).cache()
      val s3 = sweep(s2).cache()
      val conv = t(s"np=$np 3 sweeps + compare") {
        s3.join(s2.withColumnRenamed("label", "prev"), "id").where(col("label") =!= col("prev")).isEmpty }
      println(s"  converged=$conv")
      labels.unpersist(); s2.unpersist(); s3.unpersist()
    }
    spark.stop()
  }
}
