package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Fixed-size bitset OR-aggregate: folds LONG bit positions into an
 * `ARRAY<LONG>` of `numWords` 64-bit words. The distributed build of a Bloom
 * filter / membership bitset: `update` sets one bit, `merge` ORs whole
 * buffers, so the result is order-independent (OR is commutative,
 * associative, idempotent) and therefore identical on any partitioning —
 * the aggregation analog of the LONG-accumulator rule the other native
 * expressions follow.
 *
 * Partial aggregation applies as usual: each task folds its rows into a
 * local `numWords`-word buffer and only buffers cross the wire, so the
 * shuffle cost is `tasks x numWords x 8` bytes regardless of corpus size.
 *
 * Positions must lie in `[0, numWords * 64)`; out-of-range input is a
 * caller bug and fails fast rather than aliasing silently.
 */
case class BitsetOrAgg(
    child: Expression,
    numWords: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // ceiling: serialize() allocates numWords * 8 bytes in one ByteBuffer, so
  // the word count must keep that product inside Int range (~2 GiB buffer
  // bound — far beyond any sane broadcastable bitset already)
  require(numWords >= 1 && numWords <= Int.MaxValue / 8,
    s"numWords must be in [1, ${Int.MaxValue / 8}]")

  // analysis-time type pin: update()'s unboxing would otherwise surface a
  // non-LONG position as a per-row executor ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitset_or_agg requires a LONG position, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val pos = v.asInstanceOf[Long]
      if (pos < 0L || pos >= numWords.toLong * 64L)
        throw new IllegalArgumentException(
          s"bitset position $pos outside [0, ${numWords.toLong * 64L})")
      buffer((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numWords * 8)
    var i = 0
    while (i < numWords) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](numWords)
    var i = 0
    while (i < numWords) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitsetOrAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitset_or_agg"
}

object BitsetFunctions {
  /** Column API: OR-fold LONG bit positions into a `numWords`-word bitset. */
  def bitsetOr(pos: Column, numWords: Int): Column =
    GraftSqlBridge.column(
      BitsetOrAgg(GraftSqlBridge.expression(pos), numWords).toAggregateExpression())
}
