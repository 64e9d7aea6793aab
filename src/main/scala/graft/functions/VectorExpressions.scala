package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression for the embedding-similarity hot path: a
 * sequential double-precision dot product of two `ARRAY<FLOAT>` columns.
 *
 * Semantically identical to the declarative form it replaces —
 * `aggregate(zip_with(castD(a), castD(b), (x,y) -> x*y), 0D, (acc,v) -> acc+v)`
 * — including the fold ORDER (index 0 upward, accumulator seeded 0.0), so
 * every similarity result stays bit-exact vs the SQL oracle. Unlike the
 * higher-order-function form (interpreted lambda per element), this compiles
 * to a tight scalar loop inside whole-stage codegen: no per-element closure
 * dispatch, no intermediate zipped array allocation. At ANN scale the dot
 * product runs once per candidate pair — this is the single hottest scalar in
 * the similarity suite.
 *
 * Null semantics mirror zip_with: mismatched lengths or a null element yield
 * null (zip_with pads the shorter side with null, nulling the sum).
 */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"FloatVectorDot requires ARRAY<FLOAT> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  // can yield null (length mismatch / null element) even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // acc must be freshName'd too: with non-nullable children the snippet is
      // emitted unbraced, and two dots fused into one codegen stage would
      // collide on a fixed local
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/**
 * Dot product of a float-array column against a PLAN-TIME literal weight
 * vector (the LSH hyperplane case): same sequential double fold as
 * [[FloatVectorDot]], with the weights held as a codegen reference object —
 * no per-row literal-array construction, no lambda dispatch.
 */
case class FloatDotWeights(child: Expression, weights: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"FloatDotWeights requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val w: Array[Double] = weights.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != w.length) return null
    var acc = 0.0
    var i = 0
    while (i < w.length) {
      if (x.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * w(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", w, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc") // see FloatVectorDot: avoid fused-stage collisions
      s"""
         |if ($a.numElements() != $wRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $wRef.length; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * $wRef[$i];
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FloatDotWeights =
    copy(child = newChild)
}

/**
 * Per-vector squared L2 norm on the 2^-20 fixed-point grid, as one codegen'd
 * LONG pass: each element snaps to `floor(v·2^20 + 0.5)` (the
 * [[graft.operators.Similarity.centroids]] grid) and the squares accumulate
 * in LONG — order-independent, engine-reproducible (`SUM(fp*fp)` over
 * `UNNEST` replays it in SQL), and far inside LONG for unit-scale embeddings
 * (dim·2^40). The embedding-health primitive behind norm-outlier screens.
 * Null elements yield null (corrupt row, not a zero).
 */
case class FloatNormFp(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"FloatNormFp requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  // null on a null ELEMENT even for a non-null array
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    FloatNormFp.normFp(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.FloatNormFp$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"""java.lang.Long ${ev.value}Box = $helper.normFp($a);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}Box.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): FloatNormFp =
    copy(child = newChild)
}

object FloatNormFp {
  val Grid = 1L << graft.operators.Similarity.CentroidScaleBits

  /** Σ floor(v·2^20 + 0.5)² as LONG; null if any element is null. */
  def normFp(x: ArrayData): java.lang.Long = {
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val fp = math.floor(x.getFloat(i).toDouble * Grid + 0.5).toLong
      s += fp * fp
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

/**
 * SimHash signature from a collected array of md5 hex strings (one per
 * distinct word), packed into one LONG: logical bit i (i = 0 is the most
 * significant, stored at long bit 63-i) is the sign of the +1/-1 balance over
 * words, where a word votes +1 iff bit (i%4) of hex digit (i/4) of its hash
 * is set — the exact arithmetic of the SQL oracle of
 * [[graft.operators.Dedup.simhashSignatures]], all integer ops (no rounding
 * concerns), one pass over the hashes instead of a 64-way interpreted fold.
 * The LONG packing (vs a '0'/'1' string) makes downstream Hamming distance a
 * single codegen'd `bit_count(x ^ y)` and band extraction a shift+mask —
 * the per-candidate-pair hot path of [[graft.operators.Dedup.simhashPairs]].
 * 64 bits (the width of Manku et al.'s web-scale near-dup fingerprints, and
 * of the reference's own hash granularity) gives the banded blocking a true
 * Hamming recall guarantee while keeping false band-collisions rare.
 */
case class SimHashBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"SimHashBits requires ARRAY<STRING>, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(a: Any): Any = {
    val hashes = a.asInstanceOf[ArrayData]
    SimHashBits.signature(hashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.SimHashBits$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $helper.signature($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  /** Signature width in bits (16 of md5's 32 hex digits). */
  val Bits = 64

  /** One pass: per word-hash, hex digit p (of the first Bits/4) contributes
    * its 4 bits to balances [4p, 4p+3]; logical bit i = (balance(i) > 0),
    * stored at long bit position Bits-1-i (logical bit 0 most significant,
    * so the long reads like the former bit STRING in binary). */
  def signature(hashes: ArrayData): Long = {
    val bal = new Array[Int](Bits)
    val n = hashes.numElements()
    var k = 0
    while (k < n) {
      val h = hashes.getUTF8String(k)
      var p = 0
      while (p < Bits / 4) {
        val c = h.getByte(p).toChar
        val d = if (c >= '0' && c <= '9') c - '0' else c - 'a' + 10
        var b = 0
        while (b < 4) {
          bal(p * 4 + b) += (if (((d >> b) & 1) == 1) 1 else -1)
          b += 1
        }
        p += 1
      }
      k += 1
    }
    var sig = 0L
    var i = 0
    while (i < Bits) {
      if (bal(i) > 0) sig |= 1L << (Bits - 1 - i)
      i += 1
    }
    sig
  }

  /** [[signature]] over plain Scala strings — the entry point for per-row
    * Scala callers (the streaming near-dup screen computes signatures
    * inside its state function, where no Catalyst expression runs). */
  def signatureOf(hashes: Iterable[String]): Long =
    signature(new org.apache.spark.sql.catalyst.util.GenericArrayData(
      hashes.iterator.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any]))
}

/**
 * Per-vector int8 max-abs scalar quantization, as ONE codegen'd pass: the
 * compression step an embedding store applies before ANN at scale (4× smaller
 * vectors, integer dot products). Emits the quantization summary a pipeline
 * audits and an int8 scorer needs:
 * `struct(scale, q_sum, q_l1, q_max, q_sq)` where `q_i = floor(x_i/max|x| *
 * 127 + 0.5)` (round-half-up, reproducible as `FLOOR(CAST(v AS DOUBLE)/mx*127
 * + 0.5)` in any engine), `scale = max|x|/127` dequantizes, and `q_sq` is the
 * quantized self-dot an int8 ANN actually computes. All accumulators are
 * LONG — order-independent, so results are bit-exact at any parallelism with
 * no sorted-fold machinery. A zero vector quantizes to all-zero q with
 * scale 0; an empty array or null element yields null.
 */
case class FloatQuantStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"FloatQuantStats requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = FloatQuantStats.schema

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    FloatQuantStats.stats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.FloatQuantStats$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = $helper.stats($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): FloatQuantStats =
    copy(child = newChild)
}

object FloatQuantStats {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_l1", LongType, nullable = false),
    StructField("q_max", LongType, nullable = false),
    StructField("q_sq", LongType, nullable = false)))

  /** Two tight passes over the floats (max-abs, then quantize-accumulate);
    * returns null for an empty array or a null element. */
  def stats(x: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = x.numElements()
    if (n == 0) return null
    var mx = 0f
    var finite = true
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i)
      if (!java.lang.Float.isFinite(v)) finite = false
      val a = math.abs(v)
      if (a > mx) mx = a
      i += 1
    }
    // a NaN/Inf element has no quantizable direction: collapse to the
    // scale-0 degenerate form (downstream scale > 0 guards then exclude the
    // vector) instead of emitting scale=Inf with zero q, which would
    // NaN-score rank-1 against every query in the int8 ANN path
    val mxd = if (finite) mx.toDouble else 0.0
    var qSum = 0L; var l1 = 0L; var qMax = 0L; var sq = 0L
    i = 0
    while (i < n) {
      val q = if (mxd > 0.0)
        math.floor(x.getFloat(i).toDouble / mxd * 127.0 + 0.5).toLong
      else 0L
      qSum += q
      val aq = math.abs(q)
      l1 += aq
      if (aq > qMax) qMax = aq
      sq += q * q
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mxd / 127.0, qSum, l1, qMax, sq))
  }
}

/**
 * Int8 max-abs quantization of a float vector, returning what the int8 ANN
 * scorer stores: `struct(scale DOUBLE, q ARRAY<TINYINT>)` with the SAME
 * rounding as [[FloatQuantStats]] (`floor(x/max|x| * 127 + 0.5)`, so q_i in
 * [-127, 127] always fits a signed byte). The 4×-smaller byte vectors are the
 * 100 TB embedding-store representation; [[Int8DotProduct]] scores them with
 * pure integer arithmetic. A zero vector yields scale 0 and all-zero q; an
 * empty array or null element yields null.
 */
case class QuantizeInt8Vec(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"QuantizeInt8Vec requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = QuantizeInt8Vec.schema

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    QuantizeInt8Vec.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.QuantizeInt8Vec$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = $helper.quantize($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Vec =
    copy(child = newChild)
}

object QuantizeInt8Vec {
  import org.apache.spark.sql.types.{ByteType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))

  def quantize(x: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = x.numElements()
    if (n == 0) return null
    var mx = 0f
    var finite = true
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i)
      if (!java.lang.Float.isFinite(v)) finite = false
      val a = math.abs(v)
      if (a > mx) mx = a
      i += 1
    }
    // non-finite element -> scale-0 degenerate form (see FloatQuantStats)
    val mxd = if (finite) mx.toDouble else 0.0
    val q = new Array[Byte](n)
    i = 0
    while (i < n) {
      if (mxd > 0.0)
        q(i) = math.floor(x.getFloat(i).toDouble / mxd * 127.0 + 0.5).toByte
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      mxd / 127.0,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(q)))
  }
}

/**
 * Integer dot product of two `ARRAY<TINYINT>` quantized vectors — the int8
 * ANN scoring kernel: one multiply-accumulate per byte pair in a codegen'd
 * loop, LONG accumulator (no overflow below 2^48 elements at |q| <= 127), no
 * floating point until the caller applies the two dequantization scales.
 * Null semantics mirror [[FloatVectorDot]]: length mismatch or null element
 * yields null.
 */
case class Int8DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isByteArray(dt: DataType) = dt match {
      case ArrayType(org.apache.spark.sql.types.ByteType, _) => true
      case _ => false
    }
    if (isByteArray(left.dataType) && isByteArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"Int8DotProduct requires ARRAY<TINYINT> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Int8DotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Product-quantization subspace encoder: argmin over `ksub` codeword
 * distances for ONE subspace slice, as a single native expression holding the
 * codebook as a reference object. This is what keeps PQ encode a PURE
 * PROJECTION at any `ksub`: inlining `ksub` per-codeword distance expressions
 * blows Janino's 64 KB method limit past ksub≈32 (measured: interpreted
 * fallback, ~10× slower), while this compiles to two tight nested loops of
 * constant code size.
 *
 * Distance semantics are the expanded squared L2 the SQL oracle writes —
 * `(s·s + w·w) - 2·(s·w)` with every dot a sequential index-order double
 * fold and `w·w` a train-time constant — and ties go to the LOWER codeword
 * id (strict `<` keeps the earlier candidate), matching
 * `ROW_NUMBER() OVER (ORDER BY d, c)`. Returns the 1-based codeword id.
 * Null element or a slice/codebook length mismatch yields null.
 */
case class PqSubspaceCode(child: Expression, weights: Seq[Seq[Double]], selfDots: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"PqSubspaceCode requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  private lazy val w: Array[Array[Double]] = weights.map(_.toArray).toArray
  private lazy val sd: Array[Double] = selfDots.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != w(0).length) return null
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      ss += v * v
      i += 1
    }
    var best = 0
    var bestD = 0.0
    var c = 0
    while (c < w.length) {
      val wc = w(c)
      var acc = 0.0
      i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * wc(i); i += 1 }
      val d = (ss + sd(c)) - 2.0 * acc
      if (c == 0 || d < bestD) { best = c; bestD = d }
      c += 1
    }
    best + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("pqW", w, "double[][]")
    val sdRef = ctx.addReferenceObj("pqSd", sd, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      val ss = ctx.freshName("ss")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val wc = ctx.freshName("wc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $wRef[0].length);
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; }
         |  else { double $v = (double) $a.getFloat($i); $ss += $v * $v; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestD = 0.0;
         |  for (int $c = 0; $c < $wRef.length; $c++) {
         |    double[] $wc = $wRef[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $a.getFloat($i) * $wc[$i];
         |    }
         |    double $d = ($ss + $sdRef[$c]) - 2.0 * $acc;
         |    if ($c == 0 || $d < $bestD) { $best = $c; $bestD = $d; }
         |  }
         |  ${ev.value} = $best + 1;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqSubspaceCode =
    copy(child = newChild)
}

/**
 * Product-quantization ADC table for ONE subspace: the full `ksub`-entry
 * array of exact query-slice-to-codeword distances (indexed by 1-based
 * codeword id via `element_at`). Same distance arithmetic, fold order, and
 * null semantics as [[PqSubspaceCode]] — one expression per subspace turns a
 * query row into its asymmetric-distance lookup table.
 */
case class PqSubspaceDists(child: Expression, weights: Seq[Seq[Double]], selfDots: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"PqSubspaceDists requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val w: Array[Array[Double]] = weights.map(_.toArray).toArray
  private lazy val sd: Array[Double] = selfDots.toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != w(0).length) return null
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getFloat(i).toDouble
      ss += v * v
      i += 1
    }
    val out = new Array[Double](w.length)
    var c = 0
    while (c < w.length) {
      val wc = w(c)
      var acc = 0.0
      i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * wc(i); i += 1 }
      out(c) = (ss + sd(c)) - 2.0 * acc
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("pqW", w, "double[][]")
    val sdRef = ctx.addReferenceObj("pqSd", sd, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      val ss = ctx.freshName("ss")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val wc = ctx.freshName("wc")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $wRef[0].length);
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; }
         |  else { double $v = (double) $a.getFloat($i); $ss += $v * $v; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$wRef.length];
         |  for (int $c = 0; $c < $wRef.length; $c++) {
         |    double[] $wc = $wRef[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $a.getFloat($i) * $wc[$i];
         |    }
         |    $out[$c] = ($ss + $sdRef[$c]) - 2.0 * $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqSubspaceDists =
    copy(child = newChild)
}

/**
 * Binary (1-bit) quantization signature: `nbits` hyperplane sign bits packed
 * into one LONG — logical bit j (j = 0 first hyperplane) stored at long bit
 * `63 - j`, so Hamming distance between two vectors is a single codegen'd
 * `bit_count(a ^ b)`. The most aggressive point of the quantization ladder
 * (float → int8 → PQ → binary): 64 dims × 4 bytes become 8 bytes, and
 * candidate scoring needs one XOR+popcount per pair.
 *
 * Hyperplane weights arrive as a reference object (same constant-code-size
 * rationale as [[PqSubspaceCode]]); each bit's projection is a sequential
 * index-order double fold, sign strictly `> 0` — the same decision an
 * `acc > 0` SQL replay makes. Null element or length mismatch yields null.
 */
case class SignBits(child: Expression, weights: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(weights.nonEmpty && weights.size <= 64, "1..64 hyperplanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"SignBits requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private lazy val w: Array[Array[Double]] = weights.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != w(0).length) return null
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    var sig = 0L
    var j = 0
    while (j < w.length) {
      val wj = w(j)
      var acc = 0.0
      i = 0
      while (i < n) { acc += x.getFloat(i).toDouble * wj(i); i += 1 }
      if (acc > 0) sig |= (1L << (63 - j))
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("sbW", w, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val wj = ctx.freshName("wj")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $wRef[0].length);
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i)) { $bad = true; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $wRef.length; $j++) {
         |    double[] $wj = $wRef[$j];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += (double) $a.getFloat($i) * $wj[$i];
         |    }
         |    if ($acc > 0) $sig |= (1L << (63 - $j));
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits =
    copy(child = newChild)
}

/**
 * Signed fixed-point sum for random-projection sketches:
 * `Σ_d signs[d] · floor(v_d · 2^scaleBits + 0.5)` as LONG. Grid-snapping each
 * element FIRST makes the sum exact integer arithmetic — order-free, so the
 * projection reproduces bit-for-bit in any engine that can snap to the same
 * grid (no sorted-fold machinery), unlike a double accumulation whose value
 * depends on element order. One codegen'd pass; null if the array length
 * mismatches `signs` or any element is null.
 */
case class FloatFpSignedSum(child: Expression, signs: Seq[Int], scaleBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(signs.forall(s => s == 1 || s == -1), "signs must be +-1")
  require(scaleBits >= 1 && scaleBits <= 30, "scaleBits in [1, 30]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"FloatFpSignedSum requires ARRAY<FLOAT>, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  private lazy val s: Array[Int] = signs.toArray

  override def nullSafeEval(a: Any): Any =
    FloatFpSignedSum.signedSum(a.asInstanceOf[ArrayData], s, 1L << scaleBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = "graft.functions.FloatFpSignedSum$.MODULE$"
    val sRef = ctx.addReferenceObj("signs", s, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""java.lang.Long ${ev.value}Box = $helper.signedSum($a, $sRef, ${1L << scaleBits}L);
         |if (${ev.value}Box == null) { ${ev.isNull} = true; } else { ${ev.value} = ${ev.value}Box.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): FloatFpSignedSum =
    copy(child = newChild)
}

object FloatFpSignedSum {
  def signedSum(x: ArrayData, signs: Array[Int], grid: Long): java.lang.Long = {
    if (x.numElements() != signs.length) return null
    var acc = 0L
    var i = 0
    while (i < signs.length) {
      if (x.isNullAt(i)) return null
      val fp = math.floor(x.getFloat(i).toDouble * grid + 0.5).toLong
      acc += signs(i) * fp
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

object VectorFunctions {
  /** Column API: sequential double dot product of two float-array columns. */
  def floatDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVectorDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API: dot of a float-array column against literal weights. */
  def floatDotWeights(a: Column, weights: Seq[Double]): Column =
    GraftSqlBridge.column(FloatDotWeights(GraftSqlBridge.expression(a), weights))

  /** Column API: 64-bit SimHash signature (packed LONG) from an array of md5
    * hex strings. */
  def simhashBits(hashes: Column): Column =
    GraftSqlBridge.column(SimHashBits(GraftSqlBridge.expression(hashes)))

  /** Column API: squared L2 norm on the 2^-20 grid as LONG. */
  def normFp(a: Column): Column =
    GraftSqlBridge.column(FloatNormFp(GraftSqlBridge.expression(a)))

  /** Column API: signed fixed-point sum `Σ signs_d · fp(v_d)` as LONG. */
  def fpSignedSum(a: Column, signs: Seq[Int], scaleBits: Int): Column =
    GraftSqlBridge.column(FloatFpSignedSum(GraftSqlBridge.expression(a), signs, scaleBits))

  /** Column API: int8 max-abs quantization stats struct for a float-array
    * column — `(scale, q_sum, q_l1, q_max, q_sq)`. */
  def quantInt8(a: Column): Column =
    GraftSqlBridge.column(FloatQuantStats(GraftSqlBridge.expression(a)))

  /** Column API: int8 quantized vector struct `(scale, q ARRAY<TINYINT>)`. */
  def quantizeInt8Vec(a: Column): Column =
    GraftSqlBridge.column(QuantizeInt8Vec(GraftSqlBridge.expression(a)))

  /** Column API: integer dot product of two quantized byte vectors. */
  def int8Dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(Int8DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column API: 1-based argmin PQ codeword id for one subspace slice. */
  def pqCode(slice: Column, weights: Seq[Seq[Double]], selfDots: Seq[Double]): Column =
    GraftSqlBridge.column(PqSubspaceCode(GraftSqlBridge.expression(slice), weights, selfDots))

  /** Column API: full per-codeword ADC distance table for one subspace. */
  def pqDists(slice: Column, weights: Seq[Seq[Double]], selfDots: Seq[Double]): Column =
    GraftSqlBridge.column(PqSubspaceDists(GraftSqlBridge.expression(slice), weights, selfDots))

  /** Column API: packed hyperplane sign-bit signature (binary quantization). */
  def signBits(a: Column, weights: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(SignBits(GraftSqlBridge.expression(a), weights))
}
