package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native lexicon-hit counter for the language-ID / quality hot path: the
 * number of whitespace words of `lower(text)` present in a small lexicon.
 *
 * Semantically identical to the declarative form it replaces —
 * `size(filter(split(lower(text), ' '), w -> w IN (...)))` — but Spark
 * evaluates higher-order-function lambdas interpreted, one closure dispatch
 * per word, and the scored-documents pass (curation) runs FIVE of these per
 * row (quality + four languages). This compiles to a split + hash-set probe
 * inside whole-stage codegen. Lowercasing uses UTF8String.toLowerCase — the
 * exact `lower()` the declarative form applied.
 */
case class LexiconHits(child: Expression, lexicon: Seq[String],
                       punctBoundary: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"LexiconHits requires STRING, got $other")
  }

  override def dataType: DataType = IntegerType // size() parity

  @transient private lazy val set: java.util.HashSet[String] = LexiconHits.toSet(lexicon)

  override def nullSafeEval(t: Any): Any =
    if (punctBoundary) LexiconHits.countPunct(t.asInstanceOf[UTF8String], set)
    else LexiconHits.count(t.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("lexicon", set, "java.util.HashSet")
    val helper = "graft.functions.LexiconHits$.MODULE$"
    val fn = if (punctBoundary) "countPunct" else "count"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.$fn($t, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconHits =
    copy(child = newChild)
}

object LexiconHits {

  def toSet(lexicon: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](lexicon.size * 2)
    lexicon.foreach(w => s.add(w))
    s
  }

  /** Split on single spaces (split-regex ' ' fast path — identical token
    * boundaries, including empty tokens for runs of spaces, which can never
    * be lexicon members) and count set membership. */
  def count(text: UTF8String, set: java.util.HashSet[String]): Int = {
    val words = text.toLowerCase.toString.split(" ", -1)
    var hits = 0
    var i = 0
    while (i < words.length) {
      if (set.contains(words(i))) hits += 1
      i += 1
    }
    hits
  }

  /** ASCII word-class tokenization for the blocklist screen: boundaries are
    * any run of characters outside [a-z0-9'], so "bad.", "bad\n" and
    * "(bad)" all surface the token "bad" — unlike [[count]]'s single-space
    * split, whose boundaries are pinned by the langid/quality oracles and
    * must stay put. Apostrophes stay inside tokens ("don't"). The class is
    * RE2/Java-identical, so a DuckDB oracle reproduces it exactly. */
  private val PunctSplit = java.util.regex.Pattern.compile("[^a-z0-9']+")

  def countPunct(text: UTF8String, set: java.util.HashSet[String]): Int = {
    val words = PunctSplit.split(text.toLowerCase.toString, -1)
    var hits = 0
    var i = 0
    while (i < words.length) {
      if (set.contains(words(i))) hits += 1
      i += 1
    }
    hits
  }
}

/**
 * Native winnowing-style fingerprint: the minimum md5 hex over every
 * `gramLen`-character sliding window of the text — semantically identical to
 * `array_min(transform(sequence(1, char_length(text) - gramLen + 1),
 * i -> md5(substr(text, i, gramLen))))`, which materializes an O(len) array
 * of hex strings through an interpreted lambda. Here the windows are
 * byte-ranges over the text's UTF-8 encoding (character boundaries computed
 * once, exactly substr's code-point indexing), each hashed in place with one
 * reused digest, tracking the minimum digest as raw bytes (unsigned byte
 * order == hex string order). NULL when the text is shorter than one window,
 * like the declarative form's empty-array array_min.
 */
case class MinGramMd5(child: Expression, gramLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"MinGramMd5 requires STRING, got $other")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true // short text -> null

  override def nullSafeEval(t: Any): Any =
    MinGramMd5.minGram(t.asInstanceOf[UTF8String], gramLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.MinGramMd5$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"""
         |${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $helper.minGram($t, $gramLen);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinGramMd5 =
    copy(child = newChild)
}

object MinGramMd5 {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** null when numChars < gramLen (array_min over an empty array). */
  def minGram(text: UTF8String, gramLen: Int): UTF8String = {
    val bytes = text.getBytes
    val n = text.numChars()
    if (n < gramLen) return null
    // code-point start offsets: substr() indexes characters, not bytes
    val offs = new Array[Int](n + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(n) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var k = 0
    while (k + gramLen <= n) {
      md.reset()
      md.update(bytes, offs(k), offs(k + gramLen) - offs(k))
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      k += 1
    }
    val hex = new Array[Char](best.length * 2)
    var j = 0
    while (j < best.length) {
      hex(j * 2) = HexDigits((best(j) >> 4) & 0xf)
      hex(j * 2 + 1) = HexDigits(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }

  /** Unsigned lexicographic compare of equal-length digests — identical to
    * comparing their lowercase-hex encodings as strings. */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/**
 * Unicode NFC normalization (canonical decomposition + canonical
 * composition) as a codegen'd expression — Spark has no built-in for it,
 * and every serious text-curation pipeline normalizes before hashing /
 * dedup so that `café` and `café` collapse to one key. Verified
 * byte-identical to DuckDB's `nfc_normalize()` on composition, the
 * Angstrom-sign singleton, and NFC-stable ligatures/edge codepoints (both
 * implement Unicode normalization; the oracle gate pins the parity).
 *
 * 100-TB hot path: an ASCII-only scan of the raw UTF-8 bytes (one branch
 * per byte, no decode) short-circuits to the input — NFC is the identity
 * on ASCII, which is the overwhelming majority of web-corpus bytes — and
 * non-ASCII rows take `Normalizer.isNormalized` (no allocation when
 * already composed) before paying for the rewrite.
 */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"NfcNormalize requires STRING, got $other")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(t: Any): Any =
    NfcNormalize.normalize(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.NfcNormalize$.MODULE$"
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $helper.normalize($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize; returns the input reference unchanged on the ASCII /
    * already-normalized fast paths (safe: consumed before the next row,
    * same contract as Spark's own pass-through string expressions). */
  def normalize(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) {
        val s = text.toString
        return if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
        else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    text
  }
}

/**
 * All-lexicons-at-once variant of [[LexiconHits]]: one lowercase + split of
 * the text, probed against EVERY lexicon, returning the hit counts as an
 * array in lexicon order. The scoring scans (language ID, curation's scored
 * frame, the Gopher stopword rule) need four language counts plus the
 * English quality ratio from the same text — as separate [[LexiconHits]]
 * expressions each redoes the lowercase+split allocation, which dominates
 * the scan. Consumers take `element_at(_, i)`; codegen subexpression
 * elimination computes the shared array once per row.
 */
case class LexiconHitsAll(child: Expression, lexicons: Seq[Seq[String]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"LexiconHitsAll requires STRING, got $other")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    lexicons.map(LexiconHits.toSet).toArray

  override def nullSafeEval(t: Any): Any =
    LexiconHitsAll.count(t.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("lexicons", sets, "java.util.HashSet[]")
    val helper = "graft.functions.LexiconHitsAll$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.count($t, $setsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconHitsAll =
    copy(child = newChild)
}

object LexiconHitsAll {
  /** Same tokenization as [[LexiconHits.count]] (split on single spaces,
    * empty tokens kept — never lexicon members), one pass over the words
    * probing every set. */
  def count(text: UTF8String,
            sets: Array[java.util.HashSet[String]]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val words = text.toLowerCase.toString.split(" ", -1)
    val hits = new Array[Int](sets.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      var j = 0
      while (j < sets.length) {
        if (sets(j).contains(w)) hits(j) += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hits)
  }
}

/**
 * Native non-overlapping regex match counter — semantically identical to
 * `size(regexp_extract_all(text, pattern, 0))` (same java.util.regex.Pattern
 * compile, same find() walk), but counts matches in place instead of
 * materializing every match as a UTF8String element of an array that only
 * ever feeds `size()`. The scoring scans (quality, gopher, token counts,
 * urls, redact) run up to three of these per row over full document texts,
 * so the per-match allocation is the scan's dominant garbage.
 */
case class RegexCount(child: Expression, pattern: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"RegexCount requires STRING, got $other")
  }

  override def dataType: DataType = IntegerType // size() parity

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(t: Any): Any =
    RegexCount.count(t.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("pattern", compiled, "java.util.regex.Pattern")
    val helper = "graft.functions.RegexCount$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.count($t, $patRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexCount =
    copy(child = newChild)
}

object RegexCount {
  def count(text: UTF8String, p: java.util.regex.Pattern): Int = {
    val m = p.matcher(text.toString)
    var n = 0
    while (m.find()) n += 1
    n
  }
}

/**
 * One-pass repetition statistics for the Gopher-family document filters
 * (Rae et al. 2021 §A1.1): duplicate-line occurrence/character counts and
 * the most-frequent word-n-gram (count + its character length) for
 * n = 2, 3, 4 — everything the dup-line and top-n-gram fraction rules need,
 * computed with per-doc hash maps instead of the O(L²)/O(G²) declarative
 * list-lambda forms (which also evaluate interpreted).
 *
 * Pinned semantics (the oracle mirrors them):
 *  - lines = '\n'-split, EMPTY LINES EXCLUDED (paragraph breaks are not
 *    boilerplate); a line is duplicate when its exact value occurs >= 2
 *    times in the doc; dup counts include every occurrence.
 *  - words = runs split on [ \t\n\r]+ (the explicit class keeps Java and
 *    RE2 whitespace semantics identical), empties excluded; n-grams join
 *    with a single space.
 *  - top n-gram = max occurrences, ties to the UTF-8-binary-smallest gram.
 *  - all character counts are code points (DuckDB `length()` parity).
 */
case class GopherRepStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"GopherRepStats requires STRING, got $other")
  }

  override def dataType: DataType = GopherRepStats.schema

  override def nullSafeEval(t: Any): Any =
    GopherRepStats.stats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.GopherRepStats$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $helper.stats($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRepStats =
    copy(child = newChild)
}

object GopherRepStats {
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("dup_line_occ", IntegerType, nullable = false),
    StructField("dup_line_chars", IntegerType, nullable = false),
    StructField("line_chars", IntegerType, nullable = false),
    StructField("top2_count", IntegerType, nullable = false),
    StructField("top2_chars", IntegerType, nullable = false),
    StructField("top3_count", IntegerType, nullable = false),
    StructField("top3_chars", IntegerType, nullable = false),
    StructField("top4_count", IntegerType, nullable = false),
    StructField("top4_chars", IntegerType, nullable = false)))

  private def chars(s: String): Int = s.codePointCount(0, s.length)

  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  def stats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toString
    val lines = s.split("\n", -1).filter(_.nonEmpty)
    val lineCounts = new java.util.HashMap[String, Integer](lines.length * 2)
    lines.foreach(l => lineCounts.merge(l, 1, (a, b) => a + b))
    var dupOcc = 0; var dupChars = 0; var lineChars = 0
    lines.foreach { l =>
      val c = chars(l)
      lineChars += c
      if (lineCounts.get(l) >= 2) { dupOcc += 1; dupChars += c }
    }
    val words = s.split("[ \t\n\r]+", -1).filter(_.nonEmpty)
    def top(n: Int): (Int, Int) = {
      if (words.length < n) return (0, 0)
      val counts = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder(words(i))
        var j = 1
        while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
        counts.merge(sb.toString, 1, (a, b) => a + b)
        i += 1
      }
      var bestG: String = null; var bestC = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c: Int = e.getValue
        if (c > bestC || (c == bestC && utf8Less(e.getKey, bestG))) {
          bestG = e.getKey; bestC = c
        }
      }
      (bestC, chars(bestG))
    }
    val (c2, h2) = top(2); val (c3, h3) = top(3); val (c4, h4) = top(4)
    org.apache.spark.sql.catalyst.InternalRow(
      lines.length, dupOcc, dupChars, lineChars, c2, h2, c3, h3, c4, h4)
  }
}

/**
 * One-pass character-histogram statistics for the gibberish / char-spam
 * screen: over the code points of `text`, the struct
 * `(n_chars, n_distinct, top_count, sum_sq)` where `sum_sq = Σ c_i²` over
 * per-character counts. Downstream a single IEEE division turns these exact
 * LONGs into top-char fraction and the Simpson concentration index
 * `Σ p_i²` — no log, no fold-order concern, so a SQL oracle that explodes
 * characters and aggregates integers matches bit-for-bit.
 *
 * The declarative equivalent (explode positions → substr → two groupBys)
 * shuffles one row per (doc, char) group; this computes the same LONGs
 * row-wise inside whole-stage codegen — zero shuffle, linear scan.
 */
case class CharHistStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"CharHistStats requires STRING, got $other")
  }

  override def dataType: DataType = CharHistStats.schema
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    CharHistStats.stats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.CharHistStats$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"""
       |${ev.value} = $helper.stats($t);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CharHistStats =
    copy(child = newChild)
}

object CharHistStats {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))

  /** Exact integer histogram stats over code points; null for empty text
    * (no distribution to measure — callers filter or coalesce). */
  def stats(text: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return null
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1L
      i += Character.charCount(cp)
    }
    var top = 0L
    var sumSq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      sumSq += c * c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, counts.size.toLong, top, sumSq))
  }
}

/**
 * Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the
 * MOSS algorithm): md5 over every `gramLen`-char sliding gram, then the
 * minimum hash of each `window` consecutive grams; the distinct minima are
 * the document's fingerprints. Guarantees every shared substring of length
 * ≥ gramLen + window − 1 contributes at least one shared fingerprint, at
 * ~2/(window+1) the density of full k-gram hashing.
 *
 * Returns the SORTED distinct minima as ARRAY<STRING> (lowercase hex) —
 * order-canonical, so exploding it matches a SQL oracle's
 * `DISTINCT doc_id, min-over-window` rows exactly. Documents with fewer
 * than `window` grams yield their single overall minimum (every document
 * of ≥ gramLen chars has at least one fingerprint); shorter text → null.
 *
 * One row-wise pass (monotonic-deque sliding min, O(n) digests) inside
 * whole-stage codegen: no explode, no per-position shuffle rows.
 */
case class WinnowGramMd5(child: Expression, gramLen: Int, window: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(gramLen >= 1 && window >= 1, "gramLen, window >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"WinnowGramMd5 requires STRING, got $other")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    WinnowGramMd5.fingerprints(t.asInstanceOf[UTF8String], gramLen, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.WinnowGramMd5$.MODULE$"
    nullSafeCodeGen(ctx, ev, t => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
       |  $helper.fingerprints($t, $gramLen, $window);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowGramMd5 =
    copy(child = newChild)
}

object WinnowGramMd5 {
  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var j = 0
    while (j < d.length) {
      out(j * 2) = HexDigits((d(j) >> 4) & 0xf)
      out(j * 2 + 1) = HexDigits(d(j) & 0xf)
      j += 1
    }
    new String(out)
  }

  private def unsignedLeq(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    true
  }

  /** null when numChars < gramLen; else sorted distinct window minima. */
  def fingerprints(text: UTF8String, gramLen: Int, window: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = text.getBytes
    val n = text.numChars()
    if (n < gramLen) return null
    // code-point start offsets (substr indexes characters, not bytes)
    val offs = new Array[Int](n + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(n) = bytes.length
    val nGrams = n - gramLen + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](nGrams)
    var k = 0
    while (k < nGrams) {
      md.reset()
      md.update(bytes, offs(k), offs(k + gramLen) - offs(k))
      digests(k) = md.digest()
      k += 1
    }
    val out = new java.util.TreeSet[String]()
    if (nGrams <= window) {
      var best = digests(0)
      k = 1
      while (k < nGrams) {
        if (!unsignedLeq(best, digests(k))) best = digests(k)
        k += 1
      }
      out.add(hex(best))
    } else {
      // monotonic deque of indices with nondecreasing digests
      val deque = new Array[Int](nGrams)
      var head = 0
      var tail = 0 // exclusive
      k = 0
      while (k < nGrams) {
        while (tail > head && !unsignedLeq(digests(deque(tail - 1)), digests(k))) tail -= 1
        deque(tail) = k; tail += 1
        if (deque(head) <= k - window) head += 1
        if (k >= window - 1) out.add(hex(digests(deque(head))))
        k += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/**
 * Best-window coverage over a SORTED matched-position array — the O(m)
 * replacement for the snippet extractor's position-band self-join: given a
 * (query, doc)'s matched positions `[(pos, w), ...]` sorted by pos, find the
 * `window`-token span anchored at a matched position covering the most
 * DISTINCT terms, earliest span on ties. Semantically identical to the
 * quadratic form it replaces (anchor×member band join + countDistinct +
 * (n_covered DESC, snip_start ASC) argmax window) — every anchor is
 * evaluated, coverage is exact distinct-term count, strictly-greater update
 * keeps the earliest best — so `search_snippets` / `search_highlight` stay
 * hash-exact against the quadratic SQL oracle.
 *
 * One two-pointer sweep with a term-count map: add positions entering the
 * window, drop positions behind the anchor — O(m) per pair instead of the
 * self-join's O(m·window) rows (O(m²) on dense matches), which made the
 * shared snippets build the bench's single most expensive entry. Duplicate
 * positions (can't arise from matchedPositions, whose (doc, pos) rows are
 * unique) are still handled exactly: eviction is by position, not by index.
 *
 * @param child `ARRAY<STRUCT<pos: INT, w: STRING>>` sorted ascending by pos
 * @return `STRUCT<snip_start: BIGINT, n_covered: BIGINT>`; null for an
 *         empty/null array (no matched positions — callers never produce
 *         such a group).
 */
case class BestWindowCover(child: Expression, window: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(window >= 1, "window >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(s: org.apache.spark.sql.types.StructType, _)
        if s.length == 2 && s(0).dataType == IntegerType && s(1).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BestWindowCover requires ARRAY<STRUCT<INT, STRING>>, got $other")
  }

  override def dataType: DataType = BestWindowCover.schema
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    BestWindowCover.cover(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.BestWindowCover$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = $helper.cover($a, $window);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BestWindowCover =
    copy(child = newChild)
}

object BestWindowCover {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("snip_start", LongType, nullable = false),
    StructField("n_covered", LongType, nullable = false)))

  /** Two-pointer best-window sweep (see class doc). `arr` must be sorted
    * ascending by position; terms are counted with a small hash map whose
    * key set is bounded by the query's distinct terms. */
  def cover(arr: org.apache.spark.sql.catalyst.util.ArrayData, window: Int):
      org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val pos = new Array[Int](n)
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      pos(i) = r.getInt(0)
      words(i) = r.getUTF8String(1)
      i += 1
    }
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var distinct = 0
    var bestStart = 0
    var bestCov = 0
    var lo = 0 // first index still inside the current anchor's window
    var hi = 0 // first index not yet added (exclusive frontier)
    var a = 0  // anchor index
    while (a < n) {
      while (pos(lo) < pos(a)) { // evict positions behind the anchor
        val slot = counts.get(words(lo))
        slot(0) -= 1
        if (slot(0) == 0) distinct -= 1
        lo += 1
      }
      while (hi < n && pos(hi) < pos(a) + window) { // admit the window tail
        val slot = counts.computeIfAbsent(words(hi), _ => new Array[Int](1))
        if (slot(0) == 0) distinct += 1
        slot(0) += 1
        hi += 1
      }
      if (distinct > bestCov) { bestCov = distinct; bestStart = pos(a) }
      a += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestStart.toLong, bestCov.toLong))
  }
}

object TextFunctions {
  /** Column API: # whitespace words of lower(text) present in `lexicon`. */
  def lexiconHits(text: Column, lexicon: Seq[String]): Column =
    GraftSqlBridge.column(LexiconHits(GraftSqlBridge.expression(text), lexicon))

  /** Column API: like [[lexiconHits]] but word boundaries are punctuation /
    * whitespace runs (`[^a-z0-9']+`), the C4-style blocklist tokenization. */
  def lexiconHitsPunct(text: Column, lexicon: Seq[String]): Column =
    GraftSqlBridge.column(
      LexiconHits(GraftSqlBridge.expression(text), lexicon, punctBoundary = true))

  /** Column API: hit counts for ALL lexicons (in order) from one split pass. */
  def lexiconHitsAll(text: Column, lexicons: Seq[Seq[String]]): Column =
    GraftSqlBridge.column(LexiconHitsAll(GraftSqlBridge.expression(text), lexicons))

  /** Column API: # non-overlapping matches of `pattern` in text
    * (`size(regexp_extract_all(text, pattern, 0))` without the array). */
  def regexCount(text: Column, pattern: String): Column =
    GraftSqlBridge.column(RegexCount(GraftSqlBridge.expression(text), pattern))

  /** Column API: Gopher repetition stats struct (dup lines, top n-grams). */
  def gopherRepStats(text: Column): Column =
    GraftSqlBridge.column(GopherRepStats(GraftSqlBridge.expression(text)))

  /** Column API: min md5 hex over `gramLen`-char sliding windows of text. */
  def minGramMd5(text: Column, gramLen: Int): Column =
    GraftSqlBridge.column(MinGramMd5(GraftSqlBridge.expression(text), gramLen))

  /** Column API: Unicode NFC normalization (identity fast path on ASCII). */
  def nfcNormalize(text: Column): Column =
    GraftSqlBridge.column(NfcNormalize(GraftSqlBridge.expression(text)))

  /** Column API: exact char-histogram stats struct (see [[CharHistStats]]). */
  def charHistStats(text: Column): Column =
    GraftSqlBridge.column(CharHistStats(GraftSqlBridge.expression(text)))

  /** Column API: sorted distinct winnowing fingerprints (see [[WinnowGramMd5]]). */
  def winnowGramMd5(text: Column, gramLen: Int, window: Int): Column =
    GraftSqlBridge.column(WinnowGramMd5(GraftSqlBridge.expression(text), gramLen, window))

  /** Column API: best-window coverage struct over a sorted matched-position
    * array (see [[BestWindowCover]]). */
  def bestWindowCover(sortedPosWords: Column, window: Int): Column =
    GraftSqlBridge.column(BestWindowCover(GraftSqlBridge.expression(sortedPosWords), window))
}
