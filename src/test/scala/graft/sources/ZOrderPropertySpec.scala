package graft.sources

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the Morton interleave on generated 16-bit pairs
  * (same raw-Gen + deterministic-seed pattern as FingerprintPropertySpec). */
class ZOrderPropertySpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L)((acc, i) =>
      acc | ((a.toLong >> i & 1L) << (2 * i)) | ((b.toLong >> i & 1L) << (2 * i + 1)))

  private val genPairs: Gen[List[(Int, Int)]] = Gen.listOfN(60,
    Gen.zip(Gen.chooseNum(0, 65535), Gen.chooseNum(0, 65535)))

  private def samples(n: Int): Seq[List[(Int, Int)]] =
    (1 to n).flatMap(i => genPairs.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("zValue equals the bitwise reference on random 16-bit pairs") {
    samples(8).foreach { xs =>
      val got = xs.toDF("a", "b")
        .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
        .collect()
      got.foreach(r => assert(r.getLong(2) == mortonRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})"))
    }
  }

  test("zValue is injective and curve-local on random pairs") {
    samples(4).foreach { xs =>
      val distinctPairs = xs.distinct
      val zs = distinctPairs.map { case (a, b) => mortonRef(a, b) }
      // injective: distinct (a,b) -> distinct z (bits never collide)
      assert(zs.distinct.size == distinctPairs.size)
      // locality: within any z-range, both coordinates are bounded by the
      // enclosing power-of-two cell — check the defining recursive property
      // on the top bit: z < 2^30 iff both a,b < 2^15 … via the max bit
      distinctPairs.zip(zs).foreach { case ((a, b), z) =>
        val maxCoordBit = math.max(63 - java.lang.Long.numberOfLeadingZeros(a.toLong | 1L),
          63 - java.lang.Long.numberOfLeadingZeros(b.toLong | 1L))
        val zBit = 63 - java.lang.Long.numberOfLeadingZeros(z | 1L)
        assert(zBit / 2 <= maxCoordBit, s"z high bit outside coordinate cell: ($a,$b) -> $z")
      }
    }
  }
}
