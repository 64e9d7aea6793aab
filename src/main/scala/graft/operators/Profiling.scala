package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/**
 * ONE-PASS column profiler — the schema-drift / data-quality audit a
 * pipeline runs on every new source or crawl drop before trusting it:
 * per column, row/null/distinct counts, numeric min/max, string min/max
 * and mean length. "A feed whose `lang` distinct-count doubled or whose
 * `text` mean length halved changed upstream" is the cheapest regression
 * tell there is, and at 100 TB it must come from a single scan, not a
 * per-column loop of jobs.
 *
 * Scale design: ALL statistics for ALL columns fold in ONE aggregate over
 * one scan of the frame (the per-column stats ride as parallel aggregate
 * expressions; Catalyst plans the multi-distinct via Expand — one shuffle,
 * k-way row expansion, still a single pass over storage). The wide 1-row
 * result is then exploded to the per-column layout driver-side — k structs,
 * nothing data-sized.
 *
 * Determinism: counts are exact integers; min/max are order-independent;
 * `avg_len` is the one division, pinned as exact-LONG sum / exact-LONG
 * count. Numeric min/max surface as DOUBLE (int64→double is IEEE
 * round-to-nearest in every engine); strings compare in binary collation
 * (Spark UTF8String == DuckDB default).
 *
 * @return one row per profiled column:
 *         (column, n_rows, n_null, n_distinct, min_num, max_num,
 *          min_str, max_str, avg_len).
 */
object Profiling {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val nullStr = lit(null).cast("string")
    val nullDbl = lit(null).cast("double")
    val aggs = cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__n_null"),
        countDistinct(col(c)).as(s"${c}__n_distinct"),
        (if (isNum) min(col(c)).cast("double") else min(nullDbl)).as(s"${c}__min_num"),
        (if (isNum) max(col(c)).cast("double") else max(nullDbl)).as(s"${c}__max_num"),
        (if (isStr) min(col(c)) else min(nullStr)).as(s"${c}__min_str"),
        (if (isStr) max(col(c)) else max(nullStr)).as(s"${c}__max_str"),
        (if (isStr)
          sum(length(col(c))).cast("double") / count(col(c)).cast("double")
        else max(nullDbl)).as(s"${c}__avg_len"))
    }
    val allAggs = count(lit(1)).as("n_rows") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column"), col("n_rows"),
        coalesce(col(s"${c}__n_null"), lit(0L)).as("n_null"),
        col(s"${c}__n_distinct").as("n_distinct"),
        col(s"${c}__min_num").as("min_num"), col(s"${c}__max_num").as("max_num"),
        col(s"${c}__min_str").as("min_str"), col(s"${c}__max_str").as("max_str"),
        col(s"${c}__avg_len").as("avg_len"))
    }
    wide.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
  }
}
