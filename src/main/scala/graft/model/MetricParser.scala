package graft.model

/**
 * Parser for the OpenTSDB-style put line protocol:
 * {{{
 *   put <metric> <epoch> <double> k1=v1 k2=v2 ...
 * }}}
 * Semantics pinned to the reference
 * (common/src/main/java/timely/model/parse/MetricParser.java:17-30):
 *   - the line must start with "put" and have >= 4 tokens (metric, ts, value,
 *     and at least one tag);
 *   - timestamps are normalized to epoch millis: a seconds-precision epoch
 *     (< 10^12, i.e. fewer than 13 digits) is multiplied by 1000
 *     (common/src/main/java/timely/model/Value.java:43-45);
 *   - the reserved `viz` tag is stripped from the tag map and kept separately
 *     (common/src/main/java/timely/accumulo/MetricAdapter.java:152-159);
 *   - tag keys/values may escape '=' and ',' with a backslash
 *     (MetricAdapter.java:55-85, TagListParser.java:45-73).
 */
object MetricParser {

  /** ms vs s heuristic from Value.java:43-45: treat < 10^12 as seconds. */
  private val MsThreshold = 1000000000000L

  def normalizeTs(ts: Long): Long = if (math.abs(ts) < MsThreshold) ts * 1000L else ts

  /** Unescape `\=` and `\,` in a tag key or value (MetricAdapter.java:55-85). */
  def unescape(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && (s.charAt(i + 1) == '=' || s.charAt(i + 1) == ',')) {
        sb.append(s.charAt(i + 1)); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def escape(s: String): String =
    s.replace("=", "\\=").replace(",", "\\,")

  /** Split a tag token on the first unescaped '='. */
  private def splitTag(tok: String): Option[(String, String)] = {
    var i = 0
    while (i < tok.length) {
      if (tok.charAt(i) == '=' && (i == 0 || tok.charAt(i - 1) != '\\')) {
        if (i == 0) return None
        return Some((unescape(tok.substring(0, i)), unescape(tok.substring(i + 1))))
      }
      i += 1
    }
    None
  }

  /**
   * Parse one put line. Returns None on malformed input (wrong opcode, < 4
   * tokens after "put", unparseable numbers, malformed tags) — the reference
   * throws and Netty drops the message; in a Spark pipeline a None row goes to
   * a rejects side-channel instead.
   */
  def parse(line: String): Option[MetricPoint] = {
    val toks = line.trim.split("\\s+")
    // "put" + metric + ts + value + >=1 tag  (MetricParser.java:22-29)
    if (toks.length < 5 || toks(0) != "put") return None
    try {
      val metric = toks(1)
      val ts = normalizeTs(toks(2).toLong)
      val value = toks(3).toDouble
      var viz: Option[String] = None
      val tags = Map.newBuilder[String, String]
      var i = 4
      while (i < toks.length) {
        splitTag(toks(i)) match {
          case Some((k, v)) =>
            if (k == MetricPoint.VisibilityTag) viz = Some(v) else tags += (k -> v)
          case None => return None
        }
        i += 1
      }
      Some(MetricPoint(metric, ts, value, tags.result(), viz))
    } catch { case _: NumberFormatException => None }
  }

  /** Render a point back to the wire format (for sinks / round-trip tests). */
  def format(p: MetricPoint): String = {
    val tagStr = (p.tags.toSeq.sortBy(_._1).map { case (k, v) => s"${escape(k)}=${escape(v)}" } ++
      p.viz.map(v => s"viz=${escape(v)}")).mkString(" ")
    val v = if (p.value == p.value.toLong.toDouble) p.value.toLong.toString else p.value.toString
    s"put ${p.metric} ${p.ts} $v $tagStr"
  }
}
