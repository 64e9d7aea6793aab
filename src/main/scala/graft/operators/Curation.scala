package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators — the selection stage of a training-data
 * pipeline, composed from the text-analysis operators: deterministic
 * sampling, per-language quality ranking, and greedy token budgeting (how a
 * training mix is actually cut).
 *
 * Scale notes: the hash sample is a pure filter (no shuffle, prunes at the
 * scan); ranking/budgeting sort WITHIN a language partition via Spark's
 * external sort — spillable, one shuffle on the language key. With very few
 * distinct languages the sort per partition is large; at 100 TB you shard the
 * rank window by a quality-bucket prefix first (same two-level idea as
 * [[TimeSeries.crossSeries]]) — the greedy budget cut, being a prefix
 * property, cannot shard without changing semantics and is documented as the
 * per-language sequential step.
 */
object Curation {

  /** Deterministic hash sample predicate: keep a doc iff the first hex digit
    * of md5(doc_id) is below `sixteenths`/16 — reproducible in any engine,
    * stable across runs, uniform in expectation. A free-standing Column (it
    * binds to whatever frame it filters), so it pushes to the scan. */
  def hashSample(sixteenths: Int): Column = {
    require(sixteenths >= 1 && sixteenths <= 16, "sixteenths in 1..16")
    substring(md5(col("doc_id").cast("string")), 1, 1) < lit("0123456789abcdefg".charAt(sixteenths).toString)
  }

  /** Per-doc (n_words, quality, lang_guess) in ONE pass — every feature is a
    * row-wise expression over the same scan, so no self-join of the corpus
    * (the naive qualityScore-join-languageId plan shuffles the corpus twice
    * for values that are functions of the row). */
  private def scored(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words"),
      TextAnalysis.qualityCol.as("quality"),
      TextAnalysis.langGuessCol(
        TextAnalysis.lexiconHits("de"), TextAnalysis.lexiconHits("en"),
        TextAnalysis.lexiconHits("es"), TextAnalysis.lexiconHits("fr")).as("lang_guess"))

  /** Top-k docs per language by quality (ties broken by doc_id — fully
    * deterministic ranking). */
  def topKByLanguage(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("lang_guess").orderBy(col("quality").desc, col("doc_id"))
    scored(docs)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("lang_guess", "rank", "doc_id", "quality")
  }

  /** Greedy token budget per language: walk docs best-quality-first and keep
    * them while the running token (word) total stays within `budget` — the
    * standard way a per-language quota of a training mix is filled. */
  def tokenBudget(docs: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy("lang_guess").orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored(docs)
      .withColumn("cum_words", sum(col("n_words")).over(w))
      .where(col("cum_words") <= budget)
      .select("lang_guess", "doc_id", "quality", "n_words", "cum_words")
  }
}
