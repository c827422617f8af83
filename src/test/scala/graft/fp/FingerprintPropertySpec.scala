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
}
