package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sf001/lineitem.parquet")
  private lazy val urgent = spark.read.parquet(s"$sf001/orders.parquet")
    .filter(col("o_orderpriority") === "1-URGENT")

  test("bloom semi join returns exactly the plain semi join rows") {
    val got = BloomJoin.semiJoin(li, col("l_orderkey"), urgent,
        col("o_orderkey"), expectedItems = 100000L)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val want = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(got.orderBy("l_returnflag").collect().toSeq ==
      want.orderBy("l_returnflag").collect().toSeq)
  }

  test("bloom probe: zero false negatives, real pre-shuffle selectivity") {
    val bloom = BloomJoin.buildBloom(urgent, col("o_orderkey"), 100000L)
    val total = li.count()
    val trueMatches = li.join(urgent,
      li("l_orderkey") === urgent("o_orderkey"), "left_semi").count()
    val pass = li.filter(BloomJoin.mightContain(bloom, col("l_orderkey"))).count()
    // no false negatives: every true match survives the probe
    assert(pass >= trueMatches)
    // the probe must do real work before the shuffle: it can exceed the
    // true matches only by the fp margin, far below the full table
    assert(pass < total,
      s"bloom filter passed all $total rows — no pre-filtering happened")
    assert(pass - trueMatches <= (0.1 * (total - trueMatches)).toLong + 1,
      s"false-positive rate too high: $pass passed vs $trueMatches true")
  }

  test("probe stays in the scan stage: no exchange below the bloom filter") {
    val bloom = BloomJoin.buildBloom(urgent, col("o_orderkey"), 100000L)
    val plan = li.filter(BloomJoin.mightContain(bloom, col("l_orderkey")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bloom probe should be map-side only:\n$plan")
  }
}
