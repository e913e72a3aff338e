package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{StringDistances, TextNormalizers}

/** Property-based pins for the pure string kernels (no Spark session
  * needed): the algebraic laws a normalizer/metric must satisfy on ANY
  * input, beyond the example-based pins in MlPrepSpec/TextVectorSpec. */
class NormalizePropSpec extends AnyFunSuite {

  private def u(s: String) = UTF8String.fromString(s)

  // Latin letters, digits, space, precomposed accents, and combining marks
  private val genChar: Gen[String] = Gen.oneOf(
    Gen.alphaNumChar.map(_.toString), Gen.const(" "),
    Gen.oneOf("\u00e1", "\u00e8", "\u00f6", "\u00f1", "\u00fc", "\u00e7"),
    Gen.oneOf("\u0301", "\u0300", "\u0308"))
  private val genText: Gen[String] =
    Gen.listOf(genChar).map(_.mkString).map(_.take(60))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("nfc is idempotent and length-non-increasing") {
    check(Prop.forAll(genText) { s =>
      val once = TextNormalizers.nfc(u(s)).toString
      val twice = TextNormalizers.nfc(u(once)).toString
      once == twice && once.length <= s.length
    })
  }

  test("stripAccents is idempotent and yields a mark-free string") {
    check(Prop.forAll(genText) { s =>
      val once = TextNormalizers.stripAccents(u(s)).toString
      val twice = TextNormalizers.stripAccents(u(once)).toString
      once == twice &&
        once.forall(c => Character.getType(c) != Character.NON_SPACING_MARK)
    })
  }

  test("stripAccents commutes with nfc (canonical-equivalence invariance)") {
    check(Prop.forAll(genText) { s =>
      TextNormalizers.stripAccents(TextNormalizers.nfc(u(s))).toString ==
        TextNormalizers.stripAccents(u(s)).toString
    })
  }

  test("jaro-winkler: identity, symmetry, bounds") {
    check(Prop.forAll(genText, genText) { (a, b) =>
      val ab = StringDistances.jaroWinkler(u(a), u(b))
      val ba = StringDistances.jaroWinkler(u(b), u(a))
      val aa = StringDistances.jaroWinkler(u(a), u(a))
      ab == ba && ab >= 0.0 && ab <= 1.0 &&
        (a.isEmpty || aa == 1.0)
    })
  }

  test("damerau-levenshtein: identity-zero, symmetry, triangle inequality") {
    val shortText = genText.map(_.take(15)) // keep the O(n·m) DP cheap
    check(Prop.forAll(shortText, shortText, shortText) { (a, b, c) =>
      def d(x: String, y: String) =
        StringDistances.damerauLevenshtein(u(x), u(y))
      d(a, a) == 0 && d(a, b) == d(b, a) &&
        d(a, c) <= d(a, b) + d(b, c)
    })
  }
}
