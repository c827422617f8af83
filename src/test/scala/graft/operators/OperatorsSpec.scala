package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: picks latest right at-or-before, null before first") {
    val left = Seq(
      (1L, "u", ts("2024-01-01 00:00:05")),
      (2L, "u", ts("2024-01-01 00:00:10")), // equal-ts match (inclusive)
      (3L, "u", ts("2024-01-01 00:00:30")),
      (4L, "v", ts("2024-01-01 00:00:01"))  // v has no prior right row
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("u", ts("2024-01-01 00:00:10"), 10.0),
      ("u", ts("2024-01-01 00:00:20"), 20.0)
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("v")))           // before any right
    assert(got(1).getAs[Double]("v") == 10.0)                  // equal ts inclusive
    assert(got(2).getAs[Double]("v") == 20.0)                  // latest prior
    assert(got(3).isNullAt(got(3).fieldIndex("v")))            // other key
  }

  test("asof tolerance: stale matches nulled") {
    val left = Seq((1L, "u", ts("2024-01-01 01:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("u", ts("2024-01-01 00:00:00"), 5.0)).toDF("k", "ts", "v")
    val loose = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v"), Some(7200))
    val tight = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v"), Some(60))
    assert(loose.head().getAs[Double]("v") == 5.0)
    assert(tight.head().isNullAt(tight.head().fieldIndex("v")))
  }

  test("broadcastBackward equals backward on real data, incl. tolerance") {
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val leftSide = ev.filter(col("event_type") =!= "signup")
      .select("event_id", "user_id", "ts")
    val rightSide = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("value"))
    for (tol <- Seq(None, Some(3600L))) {
      val a = AsOfJoin.backward(leftSide, rightSide, Seq("user_id"),
        "ts", "s_ts", Seq("value"), tol)
      val b = AsOfJoin.broadcastBackward(leftSide, rightSide, Seq("user_id"),
        "ts", "s_ts", Seq("value"), tol)
      assert(a.orderBy("event_id").collect().toSeq ==
        b.orderBy("event_id").collect().toSeq, s"tolerance=$tol")
    }
  }

  test("broadcastBackward plans as a broadcast join, no window, no left shuffle") {
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val leftSide = ev.filter(col("event_type") =!= "signup")
      .select("event_id", "user_id", "ts")
    val rightSide = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("s_ts"), col("value"))
    val plan = AsOfJoin.broadcastBackward(leftSide, rightSide, Seq("user_id"),
      "ts", "s_ts", Seq("value")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"left side must not shuffle or sort:\n$plan")
  }

  test("sortedAsOfPick equals the filter/element_at formulation (randomized + edges)") {
    import graft.functions.expressions.AsOfExpressions
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(8) // includes empty histories
      val arr = Seq.fill(n)((new Timestamp(rnd.nextInt(100) * 1000L),
        rnd.nextInt(5).toDouble)) // duplicate ts values force the tiebreak
      val probe = new Timestamp(rnd.nextInt(110) * 1000L) // before/inside/after
      (i.toLong, arr, probe)
    }
    val df = rows.toDF("id", "arr0", "p")
      .select(col("id"), col("p"),
        sort_array(transform(col("arr0"),
          e => struct(e("_1").as("__ts"), e("_2").as("v")))).as("__arr"))
    val oldForm = {
      val cands = filter(col("__arr"), e => e("__ts") <= col("p"))
      when(size(cands) > 0, element_at(cands, size(cands)))
    }
    def run(): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = (
      df.select(col("id"), AsOfExpressions.sortedAsOfPick(col("__arr"), col("p"))
        .as("hit")).orderBy("id").collect().toSeq,
      df.select(col("id"), oldForm.as("hit")).orderBy("id").collect().toSeq)
    // CODEGEN_ONLY: a generated-code compile error must FAIL the test, not
    // silently fall back to the interpreted path (which round-5 shakeout
    // showed can mask a broken doGenCode indefinitely)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val (got, want) =
      try run()
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    assert(got == want)
    // interpreted eval path (codegen disabled) must agree bit-for-bit
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try { val (gi, wi) = run(); assert(gi == wi && gi == got) }
    finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("salted join equals plain join") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val supp = spark.read.parquet(s"$sf001/supplier.parquet")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val salted = SkewJoin.saltedInnerJoin(li, supp, "l_suppkey", 8)
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
    val plain = li.join(supp, "l_suppkey")
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))
    assert(salted.orderBy("s_nationkey").collect().toSeq ==
      plain.orderBy("s_nationkey").collect().toSeq)
  }

  test("approx sketches land near exact values") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("amed"),
      expr("percentile(l_extendedprice, 0.5)").as("emed")).head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"HLL error: $approx vs $exact")
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) / r.getDouble(3) < 0.05)
  }

  private def ts(s: String) = Timestamp.valueOf(s)
}
