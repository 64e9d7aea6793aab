package graft.model

import org.scalacheck.{Gen, Prop, Properties}

/** Property pinning of the put-line wire format: format(parse) is the
  * identity over points whose tag keys/values need `\=`/`\,` escaping. */
object MetricParserPropertySpec extends Properties("MetricParser") {

  private val genTagStr: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('=', ',', '.', '-', '_'))))

  private val genPoint: Gen[MetricPoint] = for {
    metric <- Gen.identifier.suchThat(_.nonEmpty).map(_.take(16))
    ts <- Gen.chooseNum(1000000000000L, 4102444800000L) // already-ms
    value <- Gen.chooseNum(-1e9, 1e9)
    nTags <- Gen.chooseNum(1, 4) // reference requires >= 1 tag
    tags <- Gen.mapOfN(nTags,
      Gen.zip(genTagStr.suchThat(_ != MetricPoint.VisibilityTag), genTagStr))
      .suchThat(_.nonEmpty)
    viz <- Gen.option(Gen.oneOf("A", "A&B", "(a|b)&c"))
  } yield MetricPoint(metric, ts, value, tags, viz)

  property("format/parse round trip is the identity") = Prop.forAll(genPoint) { p =>
    MetricParser.parse(MetricParser.format(p)).contains(p)
  }
}
