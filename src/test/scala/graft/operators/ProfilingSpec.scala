package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Column profiler: hand-checked stats, NULL handling, empty frames, and
  * the one-scan plan contract. */
class ProfilingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def d = Seq(
    (1L, Some("aa"), Some(2.0)),
    (2L, Some("bbbb"), None),
    (3L, None, Some(-1.5)),
    (3L, Some("c"), Some(2.0))
  ).toDF("id", "s", "v")

  test("hand-checked per-column stats") {
    val p = Profiling.columnProfile(d, Seq("id", "s", "v"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    val id = p("id")
    assert(id.getAs[Long]("n_rows") == 4L && id.getAs[Long]("n_null") == 0L &&
      id.getAs[Long]("n_distinct") == 3L)
    assert(id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 3.0)
    assert(id.isNullAt(id.fieldIndex("min_str")) && id.isNullAt(id.fieldIndex("avg_len")))
    val s = p("s")
    assert(s.getAs[Long]("n_null") == 1L && s.getAs[Long]("n_distinct") == 3L)
    assert(s.getAs[String]("min_str") == "aa" && s.getAs[String]("max_str") == "c")
    assert(s.getAs[Double]("avg_len") == (2 + 4 + 1) / 3.0)
    assert(s.isNullAt(s.fieldIndex("min_num")))
    val v = p("v")
    assert(v.getAs[Long]("n_null") == 1L && v.getAs[Long]("n_distinct") == 2L)
    assert(v.getAs[Double]("min_num") == -1.5 && v.getAs[Double]("max_num") == 2.0)
  }

  test("empty frame profiles to zero counts, no throw") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val p = Profiling.columnProfile(empty, Seq("id", "s"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.size == 2)
    assert(p("id").getAs[Long]("n_rows") == 0L &&
      p("id").getAs[Long]("n_null") == 0L &&
      p("id").getAs[Long]("n_distinct") == 0L)
  }

  test("all columns profile in ONE scan of the input") {
    val plan = Profiling.columnProfile(d, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected a single input scan, got $scans:\n$plan")
  }

  test("unknown column is rejected eagerly") {
    intercept[IllegalArgumentException] {
      Profiling.columnProfile(d, Seq("nope"))
    }
  }
}
