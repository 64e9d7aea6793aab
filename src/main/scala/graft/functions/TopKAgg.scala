package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate over (score DOUBLE, id LONG) pairs — the map-side
 * top-k that replaces a per-key rank window in the kNN scorers
 * ([[graft.operators.Similarity.bruteForceKnn]] and friends).
 *
 * A `ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id)`
 * shuffles EVERY scored row (|corpus| x |queries| of them) into |queries|
 * partitions before the `rank <= k` filter drops almost all of them — at few
 * queries that exchange is a funnel into a handful of tasks. This aggregate
 * keeps a k-bounded buffer per group instead: each task folds its scored rows
 * into a local top-k, and only `k`-entry buffers cross the wire (partial
 * aggregation), so the exchange carries at most `tasks x k` rows per query
 * regardless of corpus size, and no corpus-sized sort ever runs.
 *
 * Ordering is Spark's own total order for DOUBLE (`java.lang.Double.compare`:
 * NaN greatest, -0.0 < 0.0) descending, ties broken by ascending id — exactly
 * the window ordering it replaces, so results are bit-identical. The top-k SET
 * under a total order is independent of fold/merge order, so the result is
 * the same on any partitioning (the parallelism-independence rule all graft
 * aggregates follow). NULL scores/ids are skipped (a scored pair is never
 * null by construction; skipping matches the window's NULLS LAST under
 * `rank <= k` for k < group size).
 *
 * `eval` emits `ARRAY<STRUCT<score DOUBLE, id BIGINT>>` sorted best-first —
 * `posexplode` turns position into the 1-based rank.
 */
case class TopKScoreIdAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKScoreIdAgg.Buffer] with BinaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, ${1 << 20}], got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_score_id requires (DOUBLE score, LONG id), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")

  override def createAggregationBuffer(): TopKScoreIdAgg.Buffer =
    new TopKScoreIdAgg.Buffer(k)

  override def update(buffer: TopKScoreIdAgg.Buffer, input: InternalRow): TopKScoreIdAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: TopKScoreIdAgg.Buffer, b2: TopKScoreIdAgg.Buffer): TopKScoreIdAgg.Buffer = {
    b2.foreach((s, i) => b1.offer(s, i))
    b1
  }

  override def eval(buffer: TopKScoreIdAgg.Buffer): Any = {
    val sorted = buffer.sortedBestFirst()
    val rows = sorted.map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKScoreIdAgg.Buffer): Array[Byte] = {
    val n = buffer.size
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    buffer.foreach { (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKScoreIdAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKScoreIdAgg.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScoreIdAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScoreIdAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKScoreIdAgg =
    copy(score = newLeft, id = newRight)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_score_id"
}

object TopKScoreIdAgg {

  /** "a beats b": higher score first (Spark's DOUBLE total order — NaN
    * greatest, -0.0 < 0.0), ties to the smaller id. */
  @inline private def beats(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c > 0 || (c == 0 && ia < ib)
  }

  /**
   * k-bounded binary min-heap, "worst of the kept" at the root: `offer` is
   * O(log k) and a no-op once the candidate does not beat the current worst,
   * so a full corpus scan costs O(n log k) with O(k) memory.
   */
  final class Buffer(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    /** heap order: parent is WORSE than (beaten by) its children */
    @inline private def worseThan(i: Int, j: Int): Boolean =
      beats(scores(j), ids(j), scores(i), ids(i))

    private def swap(i: Int, j: Int): Unit = {
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0 && worseThan(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var worst = i
        if (l < n && worseThan(l, worst)) worst = l
        if (r < n && worseThan(r, worst)) worst = r
        if (worst == i) done = true
        else { swap(i, worst); i = worst }
      }
    }

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1; siftUp(n - 1)
      } else if (beats(s, i, scores(0), ids(0))) {
        scores(0) = s; ids(0) = i; siftDown()
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** entries best-first — rank order */
    def sortedBestFirst(): Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var j = 0
      while (j < n) { out(j) = (scores(j), ids(j)); j += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Double, Long), b: (Double, Long)) => beats(a._1, a._2, b._1, b._2))
      out
    }
  }

  /** Column API: bounded top-k of (score, id) pairs; emits
    * `ARRAY<STRUCT<score, id>>` best-first. */
  def topKScoreId(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKScoreIdAgg(
        GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id), k).toAggregateExpression())
}
