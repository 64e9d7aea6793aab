package graft.model

/**
 * Ingest-time exclusion filters — parity with the reference's
 * `Exclusions` (common/src/main/java/timely/util/Exclusions.java:96-156):
 *
 *  - metric exclusion: each configured regex matches against the metric LINE
 *    `"name tag1=v1 tag2=v2"` (sorted tags), with `.*` auto-appended when the
 *    pattern doesn't already end with it (Exclusions.java:66-72) — so a bare
 *    metric-name prefix excludes every series of that metric;
 *  - tag exclusion: a per-metric set of tag KEYS stripped from matching
 *    points before storage (Exclusions.java:147-155) — the series keeps
 *    flowing, minus the configured tags.
 *
 * Both are pure functions over [[MetricPoint]] so they compose with any
 * ingest path (put lines, FlatBuffers frames) and run executor-side.
 */
object Exclusions {

  /** `"name k=v k=v"` with sorted tags — the reference's buildMetricLine
    * (Exclusions.java:119-124; the parser keeps tags sorted). */
  def metricLine(p: MetricPoint): String =
    (p.metric +: p.tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }).mkString(" ")

  /** Auto-append `.*` like getFilteredMetrics (Exclusions.java:66-72). */
  def normalizeRegex(r: String): String = if (r.endsWith(".*")) r else r + ".*"

  /** True when any configured regex full-matches the metric line. */
  def isExcluded(regexes: Seq[String], p: MetricPoint): Boolean = {
    lazy val line = metricLine(p)
    regexes.exists(r => line.matches(normalizeRegex(r)))
  }

  /** Strip the configured tag keys for this metric (filterExcludedTags,
    * Exclusions.java:147-155). Unconfigured metrics pass through untouched. */
  def stripTags(filteredTags: Map[String, Set[String]], p: MetricPoint): MetricPoint =
    filteredTags.get(p.metric) match {
      case Some(keys) if keys.nonEmpty =>
        p.copy(tags = p.tags.filterNot { case (k, _) => keys.contains(k) })
      case _ => p
    }
}
