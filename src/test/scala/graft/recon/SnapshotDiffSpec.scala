package graft.recon

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff reports planted insert/update/delete and nothing else") {
    val src = Seq(
      (1L, "a", 10.0), // unchanged
      (2L, "b", 20.0), // value changed in dst -> update
      (3L, "c", 30.0)  // missing from dst    -> insert
    ).toDF("k", "name", "v")
    val dst = Seq(
      (1L, "a", 10.0),
      (2L, "b", 99.0),
      (4L, "d", 40.0)  // dst-only            -> delete
    ).toDF("k", "name", "v")
    val got = SnapshotDiff.diff(src, dst, Seq("k"), Seq("name", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 3L -> "insert", 4L -> "delete"))
  }

  test("composite keys and null values compare correctly") {
    val src = Seq(
      (1L, 1, Option("x")),
      (1L, 2, None: Option[String]),  // null value, unchanged
      (2L, 1, Option("y"))            // becomes null -> update
    ).toDF("k1", "k2", "v")
    val dst = Seq(
      (1L, 1, Option("x")),
      (1L, 2, None: Option[String]),
      (2L, 1, None: Option[String])
    ).toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(src, dst, Seq("k1", "k2"), Seq("v"))
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((2L, 1, "update")))
  }

  test("identical snapshots diff to empty") {
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val d = SnapshotDiff.diff(o, o,
      Seq("o_orderkey"), Seq("o_totalprice", "o_orderstatus"))
    assert(d.count() == 0)
  }
}
