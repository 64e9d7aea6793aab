package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** FloatVectorDot must be a drop-in for the declarative fold: bit-exact on
  * the same inputs, zip_with-compatible null semantics, codegen-executable. */
class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val hof =
    expr("""aggregate(zip_with(transform(a, x -> CAST(x AS DOUBLE)),
           |                   transform(b, x -> CAST(x AS DOUBLE)),
           |                   (x, y) -> x * y), 0D, (acc, v) -> acc + v)""".stripMargin)

  test("bit-exact vs the aggregate(zip_with(...)) fold on awkward floats") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 64).map { i =>
      (Array.fill(64)(rnd.nextFloat() * (if (rnd.nextBoolean()) 1 else -1)),
        Array.fill(64)((rnd.nextFloat() - 0.5f) * 1e3f))
    }
    val df = rows.toDF("a", "b")
      .select(hof.as("want"), VectorFunctions.floatDot(col("a"), col("b")).as("got"))
    val collected = df.collect()
    assert(collected.length == 64)
    collected.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"mismatch: $r")
    }
  }

  test("null semantics match zip_with: length mismatch or null side -> null") {
    val df = Seq(
      (Array(1f, 2f), Array(3f, 4f)),       // 11.0
      (Array(1f, 2f, 3f), Array(1f, 1f))    // length mismatch -> null
    ).toDF("a", "b")
    val out = df.select(VectorFunctions.floatDot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    val nullSide = Seq((Array(1f), null.asInstanceOf[Array[Float]])).toDF("a", "b")
    assert(nullSide.select(VectorFunctions.floatDot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("literal-weight dot matches the zip_with fold bit-exactly") {
    val rnd = new scala.util.Random(11)
    val weights = Seq.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0)
    val wLit = weights.mkString("array(", "D, ", "D)")
    val hofW = expr(
      s"""aggregate(zip_with(transform(a, x -> CAST(x AS DOUBLE)), $wLit,
         |  (x, w) -> x * w), 0D, (acc, v) -> acc + v)""".stripMargin)
    val rows = (0 until 32).map(_ => Tuple1(Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val out = rows.toDF("a")
      .select(hofW.as("want"), VectorFunctions.floatDotWeights(col("a"), weights).as("got"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // length mismatch -> null (zip_with pad semantics)
    val short = Seq(Tuple1(Array(1f, 2f))).toDF("a")
    assert(short.select(VectorFunctions.floatDotWeights(col("a"), weights)).head().isNullAt(0))
  }

  test("quant_int8 stats match a per-element reference; edges behave") {
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 32).map(_ => Array.fill(64)((rnd.nextFloat() - 0.5f) * 2e-3f))
    val out = vecs.map(Tuple1(_)).toDF("a")
      .select(VectorFunctions.quantInt8(col("a")).as("s")).select("s.*").collect()
    vecs.zip(out).foreach { case (v, r) =>
      val mx = v.map(math.abs).max.toDouble
      val q = v.map(x => math.floor(x.toDouble / mx * 127.0 + 0.5).toLong)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(mx / 127.0))
      assert(r.getLong(1) == q.sum && r.getLong(2) == q.map(math.abs).sum)
      assert(r.getLong(3) == 127L, "max-abs quantization pins q_max to 127")
      assert(r.getLong(4) == q.map(x => x * x).sum)
    }
    // zero vector -> scale 0, all-zero stats; empty array -> null struct
    val edges = Seq(Array(0f, 0f), Array.empty[Float]).map(Tuple1(_)).toDF("a")
      .select(VectorFunctions.quantInt8(col("a")).as("s")).collect()
    assert(edges(0).getStruct(0).toSeq == Seq(0.0, 0L, 0L, 0L, 0L))
    assert(edges(1).isNullAt(0))
    // non-finite elements collapse to the scale-0 degenerate form: a
    // scale=Inf/zero-q quantization would otherwise NaN-score rank-1
    // against every query in the int8 ANN path
    val bad = Seq(Array(1f, Float.PositiveInfinity), Array(Float.NaN, 2f))
      .map(Tuple1(_)).toDF("a")
    bad.select(VectorFunctions.quantInt8(col("a")).as("s")).collect().foreach(r =>
      assert(r.getStruct(0).toSeq == Seq(0.0, 0L, 0L, 0L, 0L)))
    bad.select(VectorFunctions.quantizeInt8Vec(col("a")).as("s")).collect().foreach { r =>
      assert(r.getStruct(0).getDouble(0) == 0.0)
      assert(r.getStruct(0).getSeq[Byte](1).forall(_ == 0))
    }
  }

  test("quantized vector + int8 dot: exact integer kernel, score near float") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 16).map(_ =>
      (Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f), Array.fill(64)((rnd.nextFloat() - 0.5f) * 4f)))
    val out = rows.toDF("a", "b").select(
      col("a"), col("b"),
      VectorFunctions.quantizeInt8Vec(col("a")).as("qa"),
      VectorFunctions.quantizeInt8Vec(col("b")).as("qb"))
      .select(col("qa.scale").as("sa"), col("qb.scale").as("sb"),
        VectorFunctions.int8Dot(col("qa.q"), col("qb.q")).as("d"),
        VectorFunctions.floatDot(col("a"), col("b")).as("fd"))
      .collect()
    rows.zip(out).foreach { case ((a, b), r) =>
      // reference quantization per element
      def quant(v: Array[Float]): (Double, Array[Long]) = {
        val mx = v.map(math.abs).max.toDouble
        (mx / 127.0, v.map(x => math.floor(x.toDouble / mx * 127.0 + 0.5).toLong))
      }
      val (sa, qa) = quant(a); val (sb, qb) = quant(b)
      assert(r.getDouble(0) == sa && r.getDouble(1) == sb)
      assert(r.getLong(2) == qa.zip(qb).map { case (x, y) => x * y }.sum, "integer dot must be exact")
      // dequantized score approximates the float dot (both near-unit scale)
      val approx = r.getLong(2).toDouble * sa * sb
      assert(math.abs(approx - r.getDouble(3)) <= 0.05 * (1.0 + math.abs(r.getDouble(3))),
        s"int8 score $approx too far from float ${r.getDouble(3)}")
    }
    // edge semantics: empty vector -> null struct (and the null propagates
    // through the dot); genuine length mismatch -> null dot
    val e = Seq((Array.empty[Float], Array(1f, 2f))).toDF("a", "b")
      .select(VectorFunctions.quantizeInt8Vec(col("a")).as("qa"),
        VectorFunctions.quantizeInt8Vec(col("b")).as("qb"))
    assert(e.head().isNullAt(0))
    assert(e.select(VectorFunctions.int8Dot(col("qa.q"), col("qb.q"))).head().isNullAt(0))
    val mismatch = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
      .select(VectorFunctions.int8Dot(
        col("a").cast("array<byte>"), col("b").cast("array<byte>")))
    assert(mismatch.head().isNullAt(0))
  }

  test("participates in whole-stage codegen") {
    // spark.range keeps the projection in the physical plan (a local Seq
    // constant-folds into a LocalTableScan and skips codegen entirely)
    val df = spark.range(4)
      .select(
        array((0 until 4).map(i => (col("id") + lit(i)).cast("float")): _*).as("a"),
        array((0 until 4).map(i => lit(2f * i)): _*).as("b"))
      .select(VectorFunctions.floatDot(col("a"), col("b")).as("d"))
    // the dot must sit INSIDE a WholeStageCodegen span (shown as `*(n) Project`)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"dot not in a codegen span:\n$plan")
    // id=0 row: sum over i of i * 2i = 2 * (0 + 1 + 4 + 9) = 28
    assert(df.orderBy("d").head().getDouble(0) == 28.0)
  }
}
