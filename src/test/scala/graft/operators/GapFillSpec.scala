package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GapFill contract (q165's operator): per-key grids span each key's own
  * observation range, generated slots carry LOCF and linear interpolation,
  * observed slots pass through untouched, and the fixture data actually
  * exercises gaps (a gapless series would gate nothing). */
class GapFillSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int) = s"2024-03-01 ${"%02d".format(h)}:00:00"

  // key A: observations at hours 0 (v=10) and 3 (v=40); key B: hour 1 only
  private lazy val series = Seq(
    ("A", ts(0), 10L), ("A", ts(3), 40L), ("B", ts(1), 5L))
    .toDF("k", "h", "v")
    .select(col("k"), col("h").cast("timestamp").as("h"), col("v"))

  private lazy val filled = GapFill.fillInterpolate(
      series, Seq("k"), "h", "v", expr("INTERVAL 1 HOUR"))
    .orderBy("k", "h")
    .collect()
    .map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
      r.getLong(2), r.getDouble(3), r.getBoolean(4)))

  test("grid spans each key's own range; observed slots pass through") {
    assert(filled.map(t => (t._1, t._2)).toSeq ==
      Seq(("A", "00"), ("A", "01"), ("A", "02"), ("A", "03"), ("B", "01")))
    // observed slots: exact value, not a gap
    assert(filled.filter(!_._5).map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("A", "00", 10L), ("A", "03", 40L), ("B", "01", 5L)))
  }

  test("generated slots carry LOCF and linear interpolation") {
    val gaps = filled.filter(_._5).map(t => (t._2, t._3, t._4)).toSeq
    // LOCF carries 10; linear walks 10 → 40 in thirds
    assert(gaps == Seq(("01", 10L, 20.0), ("02", 10L, 30.0)))
    // observed slots interpolate to themselves (the 0/0 guard)
    assert(filled.filter(!_._5).forall(t => t._4 == t._3.toDouble))
  }

  test("q165's fixture series has real gaps at sf0.001") {
    val q = graft.SparkEntry.queries("q165_fill_interpolate")(spark, sf001)
    val n = q.filter(col("is_gap")).count()
    assert(n > 0, "hourly event series must contain gaps for the gate to bite")
  }
}
