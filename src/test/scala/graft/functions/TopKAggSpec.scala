package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TopKScoreIdAgg]] must be bit-equal to the rank window it replaces —
  * including score ties (id tiebreak), k larger than the group, NaN ordering
  * (Spark's DOUBLE total order: NaN greatest), and the merge path (partial
  * buffers crossing a real shuffle at local[4]). */
class TopKAggSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKScoreIdAgg.topKScoreId($"s", $"id", k).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "e")))
      .select($"g", $"e.id".as("id"), $"e.score".as("s"), ($"pos" + 1).cast("long").as("rank"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy($"s".desc, $"id")
    df.withColumn("rank", row_number().over(w).cast("long")).where($"rank" <= k)
      .select("g", "id", "s", "rank")
  }

  private def assertEqual(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    // scores compared as raw bits: NaN == NaN must hold for the equality
    val a = viaAgg(df, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).sorted
    val b = viaWindow(df, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getLong(3))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("matches the rank window on a spread of groups, ties, and k sizes") {
    val rows = for (g <- 0L until 7L; i <- 0L until 50L)
      yield (g, g * 100 + i, ((i * 31 + g * 17) % 13).toDouble) // many score ties
    val df = rows.toDF("g", "id", "s").repartition(8)
    for (k <- Seq(1, 5, 49, 60)) assertEqual(df, k) // 60 > group size
  }

  test("NaN scores rank first (Spark's DOUBLE total order), ties to lower id") {
    val df = Seq(
      (0L, 1L, Double.NaN), (0L, 2L, Double.PositiveInfinity), (0L, 3L, 5.0),
      (0L, 4L, Double.NaN), (0L, 5L, Double.NegativeInfinity), (0L, 6L, -0.0),
      (0L, 7L, 0.0)).toDF("g", "id", "s").repartition(3)
    assertEqual(df, 4)
    val top = viaAgg(df, 2).orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(top == Seq(1L, 4L)) // both NaNs, id ascending
  }
}
