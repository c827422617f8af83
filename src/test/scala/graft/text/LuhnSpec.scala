package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.expressions.LuhnExpressions

class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def luhn(s: String) =
    LuhnExpressions.luhnCompute(UTF8String.fromString(s))

  test("luhnCompute: known valid/invalid PANs, degenerate inputs") {
    assert(luhn("79927398713"))        // the canonical Luhn example
    assert(luhn("4532015112830366"))   // valid 16-digit Visa test number
    assert(luhn("0"))                  // trivially valid
    assert(!luhn("79927398710"))       // wrong check digit
    assert(!luhn("4532015112830367"))
    assert(!luhn(""))                  // empty: not a number
    assert(!luhn("4532a15112830366"))  // non-digit
    assert(!luhn("453 2015"))          // embedded space
  }

  test("luhnCompute agrees with an independent reference implementation") {
    val rnd = new scala.util.Random(7)
    def ref(s: String): Boolean = {
      val digits = s.reverse.map(_ - '0')
      val sum = digits.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }
    for (_ <- 1 to 500) {
      val s = (1 to (13 + rnd.nextInt(7))).map(_ => rnd.nextInt(10)).mkString
      assert(luhn(s) == ref(s), s)
    }
  }

  test("candidate extraction: maximal runs, length gate") {
    val df = Seq(
      "pay 4532015112830366 ref 123",              // one 16-digit candidate
      "run 12345678901234567890 is 20 digits",     // over-long: NOT split into a 19-digit match
      "short 123456789012 only",                   // 12 digits: under the floor
      "two 79927398713 and 4532015112830366 here") // 11-digit + 16-digit: one candidate
      .toDF("t")
    val got = df.select(size(TextAnalysis.ccnCandidates(col("t"))).as("n"))
      .as[Int].collect().toSeq
    assert(got == Seq(1, 0, 0, 1))
  }

  test("redactCcns: valid candidates replaced, invalid and short runs preserved") {
    val df = Seq(
      ("a", "card 4532015112830366 ref 00012345678 done"),   // valid 16 + short run
      ("b", "card 4532015112830367 ref 00012345678 done"),   // invalid 16
      ("c", "x 4532015112830366 y 5425233430109903 z"),      // two valid
      ("d", "no digits at all")).toDF("k", "t")
    val got = df.select(col("k"), TextAnalysis.redactCcns(col("t")).as("r"))
      .as[(String, String)].collect().toMap
    assert(got("a") == "card <CC> ref 00012345678 done")
    assert(got("b") == "card 4532015112830367 ref 00012345678 done")
    assert(got("c") == "x <CC> y <CC> z")
    assert(got("d") == "no digits at all")
  }

  test("LuhnCheck stays codegen-compatible inside a projection") {
    val df = Seq("79927398713", "79927398710").toDF("s")
    val got = df.select(LuhnExpressions.luhnCheck(col("s")).as("ok"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false))
    // and under whole-stage codegen with a filter on top
    val n = df.filter(LuhnExpressions.luhnCheck(col("s"))).count()
    assert(n == 1)
  }
}
