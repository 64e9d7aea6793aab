package graft.tools
object ProfileSh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    val docs = graft.operators.Points.table(spark, sfDir, "documents")
    println("docs=" + t("docs.count") { docs.count() })
    println("raw=" + t("shingles nodistinct") { graft.operators.Dedup.shingles(docs, distinct = false).count() })
    println("raw2=" + t("shingles nodistinct again") { graft.operators.Dedup.shingles(docs, distinct = false).count() })
    println("dist=" + t("shingles distinct") { graft.operators.Dedup.shingles(docs).count() })
    val sh = graft.operators.Dedup.shingles(docs).cache()
    sh.count()
    import org.apache.spark.sql.functions._
    println("pairs=" + t("selfjoin+groupBy warm sh") {
      sh.as("x").join(sh.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id"), col("y.doc_id")).agg(count(lit(1))).count() })
    spark.stop()
  }
}
