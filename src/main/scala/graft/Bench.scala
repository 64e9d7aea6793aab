package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up so the first measured query doesn't absorb JIT cost
    spark.range(1 << 20).selectExpr("sum(id)", "count(distinct id % 1000)").collect()
    SparkEntry.entry(spark).count()
    // a failed query must be visible as a failure, not a fast timing:
    // record per-query errors and exit nonzero if any query broke
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String) = "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
    val errField = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errField,"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) {
      System.err.println(s"bench: ${errs.size} quer${if (errs.size == 1) "y" else "ies"} failed")
      sys.exit(1)
    }
  }
}
