package graft.pred

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pred.PartitionPredicate._

class PartitionPredicateSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sf001/lineitem.parquet")

  test("equality predicate on a functional key (GenerateWhere eq arm)") {
    val pred = build(Seq(Equals("date_format(l_shipdate, 'yyyyMM')", "199603")))
    val n = li.filter(pred).count()
    val expected = li.filter(date_format(col("l_shipdate"), "yyyyMM") === "199603").count()
    assert(n == expected && n > 0)
  }

  test("time-range predicate is a closed interval (sidefunctions.go:215-218)") {
    val lo = Timestamp.valueOf("1996-03-01 00:00:00")
    val hi = Timestamp.valueOf("1996-03-31 23:59:59")
    val pred = build(Seq(TimeRange("l_shipdate", Some(lo), Some(hi))))
    val n = li.filter(pred).count()
    assert(n == li.filter(col("l_shipdate").between(lo, hi)).count() && n > 0)
  }

  test("absent bounds disable range mode (epoch-sentinel semantics, no UTC+3 landmine)") {
    val pred = build(Seq(TimeRange("l_shipdate", None, None)))
    assert(li.filter(pred).count() == li.count())
  }

  test("conjunction is deterministic AND of all keys (no tmp=+1 bug)") {
    val pred = build(Seq(
      Equals("l_returnflag", "R"),
      TimeRange("l_shipdate", Some(Timestamp.valueOf("1996-01-01 00:00:00")), None)))
    val expected = li.filter(col("l_returnflag") === "R" &&
      col("l_shipdate") >= Timestamp.valueOf("1996-01-01 00:00:00")).count()
    assert(li.filter(pred).count() == expected)
  }

  test("empty key list selects everything") {
    assert(li.filter(build(Nil)).count() == li.count())
  }
}
