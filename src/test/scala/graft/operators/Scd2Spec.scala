package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("runs collapse to intervals; last interval open; versions 1-based") {
    val ev = Seq(
      (1L, ts(10), "a", 100L),
      (1L, ts(20), "a", 101L),
      (1L, ts(30), "b", 102L),
      (1L, ts(40), "a", 103L), // back to a: NEW version, not merged
      (2L, ts(15), "x", 104L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Scd2.history(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "version").collect()
    val rows = got.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5)))
    assert(rows.toSeq == Seq(
      (1L, 1L, "a", ts(10), Some(ts(30)), 2L),
      (1L, 2L, "b", ts(30), Some(ts(40)), 1L),
      (1L, 3L, "a", ts(40), None, 1L),
      (2L, 1L, "x", ts(15), None, 1L)))
  }

  test("equal timestamps break ties on the unique key deterministically") {
    val ev = Seq(
      (1L, ts(10), "a", 2L),
      (1L, ts(10), "b", 1L)) // same ts: event 1 (b) precedes event 2 (a)
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Scd2.history(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("version").collect().map(r => (r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "b"), (2L, "a")))
  }

  test("intervals tile the entity's history: valid_to(v) = valid_from(v+1)") {
    val rnd = new scala.util.Random(5)
    val ev = (1 to 500).map { i =>
      ((i % 7).toLong, ts(i * 10L), s"t${rnd.nextInt(3)}", i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    val rows = Scd2.history(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getTimestamp(3), Option(r.getTimestamp(4))))
    rows.groupBy(_._1).foreach { case (_, ivs) =>
      ivs.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from2, _)) => assert(to == from2)
        case _ => ()
      }
      assert(ivs.last._3.isEmpty, "last interval open")
      assert(ivs.init.forall(_._3.nonEmpty), "only the last interval open")
    }
  }
}
