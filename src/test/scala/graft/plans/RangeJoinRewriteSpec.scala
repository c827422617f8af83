package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The automatic BETWEEN-join rewrite must (1) produce exactly the naive
  * join's rows, (2) replace the broadcast-nested-loop plan with a bucketed
  * equi-join, (3) leave ineligible joins untouched, (4) stay off without
  * the bin-size conf. */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withRule[A](bin: Long)(f: => A): A = {
    GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.BinSizeKey, bin.toString)
    try f finally spark.conf.unset(RangeJoinRewrite.BinSizeKey)
  }

  // deliberately skewed: intervals span up to 3 buckets at bin=100
  private lazy val points: DataFrame = {
    import spark.implicits._
    (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("pid", "t")
  }
  private lazy val intervals: DataFrame = {
    import spark.implicits._
    (0L until 40L).map(i => (i, i * 25, i * 25 + (i % 4) * 90)).toDF("iid", "lo", "hi")
  }

  private def sortedRows(df: DataFrame) =
    df.select("pid", "iid").orderBy("pid", "iid").collect().toSeq

  test("rewrite preserves the naive BETWEEN join result exactly") {
    val cond = col("t") >= col("lo") && col("t") <= col("hi")
    val naive = sortedRows(points.join(intervals, cond))
    val got = withRule(100) { sortedRows(points.join(intervals, cond)) }
    assert(got == naive && naive.nonEmpty)
  }

  test("plan becomes a bucketed equi-join (no nested loop), refine kept") {
    withRule(100) {
      val j = points.join(intervals, col("t") >= col("lo") && col("t") <= col("hi"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
      assert(p.contains("__graft_rj_ptb") && p.contains("Generate explode"), p.take(1500))
    }
  }

  test("mirrored orientation (intervals on the left) also rewrites") {
    val cond = col("t") >= col("lo") && col("t") <= col("hi")
    val naive = sortedRows(intervals.join(points, cond))
    withRule(100) {
      val j = intervals.join(points, cond)
      assert(!j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(sortedRows(j) == naive)
    }
  }

  test("strict bounds and an extra residual conjunct survive the rewrite") {
    val cond = col("t") > col("lo") && col("t") < col("hi") && col("pid") =!= col("iid")
    val naive = sortedRows(points.join(intervals, cond))
    withRule(100) {
      val j = points.join(intervals, cond)
      assert(!j.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(sortedRows(j) == naive)
    }
  }

  test("equi-join conjunct disables the rewrite; conf off disables it") {
    withRule(100) {
      // bucket equality already present -> Spark hash-joins; rule must not touch
      val j = points.join(intervals,
        col("pid") === col("iid") && col("t") >= col("lo") && col("t") <= col("hi"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("__graft_rj_ptb"), p.take(1200))
    }
    // conf unset -> nested loop stays (rule registered but gated off)
    val j2 = points.join(intervals, col("t") >= col("lo") && col("t") <= col("hi"))
    assert(j2.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("null bounds produce no rows on either path") {
    import spark.implicits._
    val iv = Seq((1L, Some(10L), None: Option[Long]), (2L, None: Option[Long], Some(20L)))
      .toDF("iid", "lo", "hi")
    val cond = col("t") >= col("lo") && col("t") <= col("hi")
    val naive = points.join(iv, cond).count()
    val got = withRule(100) { points.join(iv, cond).count() }
    assert(naive == 0L && got == 0L)
  }
}
