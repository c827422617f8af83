package graft.fp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests (SURVEY §5.1): the fingerprint's algebra on generated
  * data, independent of the fixture tables. (Raw ScalaCheck Gen with a
  * deterministic seed loop — the scalatest bridge artifact isn't in the
  * offline cache.) */
class FingerprintPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genRows: Gen[List[(Long, String, Double)]] = Gen.listOfN(40,
    Gen.zip(Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.alphaStr,
      Gen.chooseNum(-1e6, 1e6)))

  private def samples(n: Int): Seq[List[(Long, String, Double)]] =
    (1 to n).flatMap(i => genRows.apply(Gen.Parameters.default, Seed(i.toLong)))
      .filter(_.nonEmpty)

  test("fingerprint is invariant under any permutation of rows") {
    samples(12).zipWithIndex.foreach { case (xs, i) =>
      val df = xs.toDF("a", "b", "c")
      val shuffled = new scala.util.Random(i).shuffle(xs).toDF("a", "b", "c")
      assert(Fingerprint.ofDataFrame(df) == Fingerprint.ofDataFrame(shuffled),
        s"permutation changed fingerprint for sample $i")
    }
  }

  test("appending a row always changes the (fp, count) pair") {
    samples(12).foreach { xs =>
      val df = xs.toDF("a", "b", "c")
      val dup = (xs ++ xs.headOption).toDF("a", "b", "c")
      // a duplicated row XORs its own hash in; fp alone may collide back,
      // but the (fp, count) PAIR — what the reconciler compares — must not
      assert(Fingerprint.ofDataFrame(df) != Fingerprint.ofDataFrame(dup))
    }
  }

  test("single-value perturbation flips the fingerprint") {
    samples(12).foreach { xs =>
      val df = xs.toDF("a", "b", "c")
      val perturbed = ((xs.head.copy(_1 = xs.head._1 ^ 1L)) :: xs.tail).toDF("a", "b", "c")
      val (fp1, _) = Fingerprint.ofDataFrame(df)
      val (fp2, _) = Fingerprint.ofDataFrame(perturbed)
      assert(fp1 != fp2)
    }
  }

  test("fused native portable hash ≡ builtin chain on generated rows (doubles incl. edge magnitudes)") {
    import org.apache.spark.sql.functions.col
    // the double arm is the subtlest canonicalization (BigDecimal.valueOf
    // shortest-string semantics, HALF_UP to scale 6, precision-38
    // overflow → null sentinel) — fuzz it across magnitudes the fixture
    // tables never reach, plus arbitrary unicode strings
    val genRow: Gen[(Long, String, Double)] = Gen.zip(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.oneOf(Gen.alphaStr, Gen.listOf(Gen.choose(32, 0x2FFF)).map(_.map(_.toChar).mkString)),
      Gen.oneOf(
        Gen.chooseNum(-1e6, 1e6),
        Gen.chooseNum(-1e-7, 1e-7),
        Gen.oneOf(0.0, -0.0, 1e31, -1e31, 1e33, 123456789.4999995, Double.MinPositiveValue)))
    val rows = (1 to 30).flatMap(i =>
      Gen.listOfN(20, genRow).apply(Gen.Parameters.default, Seed(1000L + i))).flatten
    val df = rows.toDF("a", "b", "c")
    val cols = Seq("a", "b", "c")
    val builtin = df.select(Fingerprint.portableRowHash(
      Fingerprint.portableCanonicalCols(df, cols)).as("h")).as[Long].collect()
    val native = df.select(Fingerprint.portableRowHashNative(
      cols.map(col)).as("h")).as[Long].collect()
    assert(builtin.toSeq == native.toSeq)
  }
}
