package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming rate (first difference) — the live counterpart of
 * [[graft.operators.TimeSeries.rate]], with the reference's counter/reset
 * semantics (server/src/main/java/timely/server/sample/iterators/
 * RateIterator.java:64-106). The batch operator derives each point's
 * predecessor with a lag window; over an unbounded stream the predecessor is
 * CUSTOM STATE — one `LastPoint` per series held in
 * `flatMapGroupsWithState`, the Structured Streaming tool for exactly this
 * (a value the built-in windowed aggregates cannot express).
 *
 * Scale: state is one (ts, value) pair per live series — series-cardinality
 * sized, partitioned by the series key across executors, checkpointed with
 * the query. Within a micro-batch a series' rows are sorted by (ts, value) —
 * the batch operator's exact tie-break — so a stream fed in timestamp order
 * produces bit-identical rates to the batch window (pinned by StreamingSpec);
 * out-of-order arrivals across batches rate against the latest seen point,
 * the inherent stream/batch divergence any incremental rate has.
 */
object RateJob {

  /** Per-series state: the last observed point. */
  case class LastPoint(ts: Long, value: Double)

  case class RatePoint(metric: String, series: String, ts: Long, value: Double, rate: Double)

  def rateStream(
      points: DataFrame,
      intervalMs: Long,
      counter: Boolean = false,
      counterMax: Long = 0L,
      resetValue: Long = 0L): Dataset[RatePoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .withColumn("series", graft.operators.TimeSeries.seriesKey(col("tags")))
      .select(col("metric"), col("series"), col("ts"), col("value"))
      .as[(String, String, Long, Double)]
      .groupByKey { case (m, s, _, _) => (m, s) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), rows: Iterator[(String, String, Long, Double)],
         state: GroupState[LastPoint]) => {
          val (metric, series) = key
          val sorted = rows.toIndexedSeq.sortBy { case (_, _, ts, v) => (ts, v) }
          var last = state.getOption
          val out = Vector.newBuilder[RatePoint]
          for ((_, _, ts, v) <- sorted) {
            last.foreach { lp =>
              val cur =
                if (counter && v < lp.value)
                  v + (if (counterMax > 0) counterMax.toDouble else lp.value)
                else v
              val dt = (ts - lp.ts).toDouble
              val raw = if (dt == 0d) 0d else (cur - lp.value) / dt * intervalMs.toDouble
              val rated = if (resetValue > 0 && raw > resetValue.toDouble) 0d else raw
              out += RatePoint(metric, series, ts, v, rated)
            }
            last = Some(LastPoint(ts, v))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }
}
