package graft.recon

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test: SnapshotDiff against a naive driver-side diff on
  * generated unique-keyed snapshots. */
class SnapshotDiffPropertySpec extends SparkSpec {
  import spark.implicits._

  // unique keys 0..n with generated values; dst derived by random edits
  private val genTable: Gen[(Map[Long, String], Map[Long, String])] = for {
    n <- Gen.chooseNum(1, 60)
    vals <- Gen.listOfN(n + 1, Gen.alphaStr)
    src = vals.zipWithIndex.map { case (v, k) => k.toLong -> v }.toMap
    ops <- Gen.listOfN(n + 1, Gen.chooseNum(0, 3)) // 0 keep 1 update 2 delete-from-dst 3 extra
  } yield {
    val dst = src.toSeq.zip(ops).flatMap {
      case ((k, v), 0) => Some(k -> v)
      case ((k, v), 1) => Some(k -> (v + "!"))
      case ((k, _), 2) => None
      case ((k, v), _) => Some(k -> v)
    }.toMap
    val extras = src.keys.zip(ops).collect { case (k, 3) => (k + 1000000L) -> "new" }
    (src, dst ++ extras)
  }

  private def naive(src: Map[Long, String], dst: Map[Long, String]): Map[Long, String] = {
    val inserts = (src.keySet -- dst.keySet).map(_ -> "insert")
    val deletes = (dst.keySet -- src.keySet).map(_ -> "delete")
    val updates = (src.keySet & dst.keySet)
      .filter(k => src(k) != dst(k)).map(_ -> "update")
    (inserts ++ deletes ++ updates).toMap
  }

  test("diff equals the naive set-difference on generated snapshots") {
    (1 to 10).foreach { i =>
      val (src, dst) = genTable(Gen.Parameters.default, Seed(i.toLong)).get
      val got = SnapshotDiff.diff(
          src.toSeq.toDF("k", "v"), dst.toSeq.toDF("k", "v"), Seq("k"), Seq("v"))
        .as[(Long, String)].collect().toMap
      assert(got == naive(src, dst), s"seed $i")
    }
  }
}
