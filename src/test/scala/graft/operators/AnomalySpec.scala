package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Deterministic z-score outliers and the HTML-to-text extraction pass. */
class AnomalySpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("zscoreOutliers flags exactly the planted spike, with the textbook dev") {
    // group 'a': 99 values of 10.0 plus one 1000.0 spike
    val rows = (1L to 99L).map(i => (i, "a", 10.0)) :+ ((100L, "a", 1000.0)) :+
      ((200L, "b", 5.0)) // single-row group: dropped by n >= 2
    val out = Anomaly.zscoreOutliers(rows.toDF("event_id", "event_type", "value"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(100L))
    val r = out.head
    val mean = (99 * 10.0 + 1000.0) / 100
    assert(r.getDouble(3) == mean)
    assert(r.getDouble(5) > 3.0) // the spike's z-score
  }

  test("zscoreOutliers is identical across parallelism (exact-decimal moments)") {
    val rows = (0L until 500L).map(i => (i, s"t${i % 3}", (i % 97).toDouble / 3.0))
    def run(df: DataFrame) = Anomaly.zscoreOutliers(df, threshold = 1.8)
      .collect().map(r => (r.getLong(0), r.getDouble(5))).sortBy(_._1)
    val df = rows.toDF("event_id", "event_type", "value")
    assert(run(df).toSeq == run(df.repartition(13)).toSeq)
  }

  test("zscoreOutliers: constant groups (dev 0) flag nothing") {
    val rows = (0L until 50L).map(i => (i, "c", 7.5))
    assert(Anomaly.zscoreOutliers(rows.toDF("event_id", "event_type", "value"))
      .count() == 0L)
  }

  test("htmlStrip drops script/style contents, decodes entities, keeps prose") {
    val docs = Seq(
      (1L, "<html><body><p>Hello &amp; welcome</p><script>var x = 1;</script>" +
        "<style>p { x: y }</style><div>a &lt; b &gt; c &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>"),
      (2L, "no markup at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.htmlStrip(docs).collect().map(r => r.getLong(0) -> r).toMap
    val clean1 = out(1L).getString(1)
    assert(clean1 == "Hello & welcome a < b > c \"q\" 's' end", s"got: $clean1")
    assert(!clean1.contains("var x") && !clean1.contains("x: y"))
    assert(out(1L).getLong(2) > 0 && out(1L).getLong(3) == 8L)
    assert(out(2L).getString(1) == "no markup at all")
    assert(out(2L).getLong(2) == 0L && out(2L).getLong(3) == 0L)
  }

  test("htmlStrip never decodes &amp;-escaped entities twice") {
    val docs = Seq((1L, "<p>&amp;lt; stays literal</p>")).toDF("doc_id", "text")
    val clean = TextAnalysis.htmlStrip(docs).collect().head.getString(1)
    assert(clean == "&lt; stays literal", s"got: $clean")
  }
}
