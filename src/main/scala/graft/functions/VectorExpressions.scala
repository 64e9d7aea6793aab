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
}
