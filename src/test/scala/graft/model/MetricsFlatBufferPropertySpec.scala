package graft.model

import org.scalacheck.{Gen, Prop, Properties}

/**
 * Property-based pinning of the hand-rolled FlatBuffers codec: ANY batch of
 * points round-trips losslessly (after ts normalization), including awkward
 * metric/tag characters, empty strings, negative/extreme values, and batch
 * sizes that force buffer growth.
 */
object MetricsFlatBufferPropertySpec extends Properties("MetricsFlatBuffer") {

  private val genStr: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('=', ',', ' ', '.', '-', '+', 'ü', 'é'))))

  private val genPoint: Gen[MetricPoint] = for {
    metric <- Gen.oneOf(Gen.const("sys.cpu.user"), genStr.suchThat(_.nonEmpty))
    // already-ms timestamps (>= 1e12, MetricParser.MsThreshold: smaller raw
    // values are treated as SECONDS and scaled — by design, on every ingest
    // path — so they wouldn't round-trip identically)
    ts <- Gen.chooseNum(1000000000000L, 4102444800000L)
    value <- Gen.oneOf(
      Gen.chooseNum(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1.5e308, -1.5e308))
    nTags <- Gen.chooseNum(0, 5)
    tags <- Gen.mapOfN(nTags, Gen.zip(genStr.suchThat(t => t.nonEmpty && t != MetricPoint.VisibilityTag), genStr))
    viz <- Gen.option(Gen.oneOf("A", "A&B", "(a|b)&c", ""))
  } yield MetricPoint(metric, ts, value, tags, viz)

  property("encode/decode round trip is lossless") = Prop.forAll(
    Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, genPoint))) { pts =>
    MetricsFlatBuffer.decode(MetricsFlatBuffer.encode(pts)) == pts
  }

  property("every encoded batch carries the auto-detect identifier") = Prop.forAll(
    Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, genPoint))) { pts =>
    MetricsFlatBuffer.hasIdentifier(MetricsFlatBuffer.encode(pts))
  }
}
