package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.QuantileSketchAggregate

/** The quantileState/quantileMerge pair's own contract, independent of the
  * rollup store: serialization round-trips the GK state exactly, partial
  * sketches merge to estimates inside the rank bound, and empty input
  * finishes to null rather than a crash. The 1..N fixture makes ranks
  * readable: value == rank, so the eps·N rank window IS a value window. */
class QuantileSketchSpec extends SparkSpec {

  private val N = 10000L
  private val eps = QuantileSketchAggregate.DefaultEps
  private def window(p: Double): (Double, Double) = {
    val slack = eps * N + 2
    (p * N - slack, p * N + slack)
  }

  test("serialization round-trips the digest exactly") {
    val d = new org.apache.spark.sql.catalyst.expressions.aggregate
      .ApproximatePercentile.PercentileDigest(eps)
    (1 to 1000).foreach(i => d.add(i.toDouble))
    val back = QuantileSketchAggregate.fromBytes(QuantileSketchAggregate.toBytes(d))
    assert(back.quantileSummaries.count == 1000L)
    val ps = Array(0.1, 0.5, 0.9)
    assert(back.getPercentiles(ps) == d.getPercentiles(ps))
  }

  test("partial sketches merge to estimates inside the eps rank bound") {
    val df = spark.range(1, N + 1)
      .select(col("id").cast("double").as("v"), pmod(col("id"), lit(8)).as("g"))
    // fold mode per group (8 independent shard states)...
    val parts = df.groupBy("g").agg(QuantileSketchAggregate.sketch(col("v")).as("sk"))
    assert(parts.count() == 8)
    // ...then merge mode across them, finished to estimates
    val est = parts
      .agg(QuantileSketchAggregate.mergeSketches(col("sk")).as("sk"))
      .select(QuantileSketchAggregate.estimate(col("sk"), Seq(0.5, 0.99)).as("e"))
      .head.getSeq[Double](0)
    Seq(0.5 -> est(0), 0.99 -> est(1)).foreach { case (p, v) =>
      val (lo, hi) = window(p)
      assert(v >= lo && v <= hi, s"p=$p estimate $v outside rank window [$lo, $hi]")
    }
    // the direct single-pass fold agrees with the merged path's contract
    val direct = df.agg(QuantileSketchAggregate.sketch(col("v")).as("sk"))
      .select(QuantileSketchAggregate.estimate(col("sk"), Seq(0.5)).as("e"))
      .head.getSeq[Double](0).head
    val (lo, hi) = window(0.5)
    assert(direct >= lo && direct <= hi)
  }

  test("null-only input folds to an empty sketch; estimate finishes to null") {
    val df = spark.range(10).select(lit(null).cast("double").as("v"))
    val row = df.agg(QuantileSketchAggregate.sketch(col("v")).as("sk"))
      .select(QuantileSketchAggregate.estimate(col("sk"), Seq(0.5)).as("e"))
      .head
    assert(row.isNullAt(0))
  }
}
