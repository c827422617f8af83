package graft.operators

import graft.SparkSpec

class MergeUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "alice", 10L), (2L, "bob", 20L), (3L, "carol", 30L))
    .toDF("k", "name", "bal")

  test("U overwrites, D drops, I appends, untouched rows pass through") {
    val changes = Seq(
      (2L, "U", "bobby", 25L),
      (3L, "D", null.asInstanceOf[String], 0L),
      (9L, "I", "ivan", 90L)).toDF("k", "op", "name", "bal")
    val got = MergeUpsert(base, changes, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "alice", 10L), (2L, "bobby", 25L), (9L, "ivan", 90L)))
  }

  test("duplicate change keys are rejected") {
    val changes = Seq(
      (2L, "U", "x", 1L), (2L, "D", "y", 2L)).toDF("k", "op", "name", "bal")
    val e = intercept[IllegalArgumentException](MergeUpsert(base, changes, "k"))
    assert(e.getMessage.contains("duplicate"))
  }

  test("U/D on an absent key and I on a present key are rejected") {
    val badU = Seq((99L, "U", "ghost", 1L)).toDF("k", "op", "name", "bal")
    assert(intercept[IllegalArgumentException](
      MergeUpsert(base, badU, "k")).getMessage.contains("inconsistently"))
    val badI = Seq((1L, "I", "dup", 1L)).toDF("k", "op", "name", "bal")
    assert(intercept[IllegalArgumentException](
      MergeUpsert(base, badI, "k")).getMessage.contains("inconsistently"))
  }

  test("empty change set is the identity") {
    val changes = Seq.empty[(Long, String, String, Long)]
      .toDF("k", "op", "name", "bal")
    val got = MergeUpsert(base, changes, "k").orderBy("k").collect().map(_.toSeq)
    assert(got.toSeq == base.orderBy("k").collect().map(_.toSeq).toSeq)
  }
}
