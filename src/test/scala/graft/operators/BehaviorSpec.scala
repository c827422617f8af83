package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioral analytics: the greedy funnel fold vs a brute-force chain
  * enumeration, strict-tie semantics, the skip-and-flag guard, cohort
  * arithmetic, and pair counting. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.map { case (u, tMs, ty) => (u, new Timestamp(tMs), ty) }
      .toDF("user_id", "ts", "event_type")

  private val step =
    when(col("event_type") === "view", 1)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "purchase", 3)

  private def levels(df: DataFrame, windowMs: Long, cap: Int = 0): Map[Long, Int] =
    Behavior.funnelLevels(df, "user_id", "ts", step, 3, windowMs, cap)
      .as[(Long, Int)].collect().toMap

  test("funnel: planted chains hit the expected levels") {
    val m = 60000L
    val df = ev(Seq(
      (1L, 0L, "view"), (1L, 10 * m, "click"), (1L, 20 * m, "purchase"), // full chain
      (2L, 0L, "view"), (2L, 10 * m, "click"), (2L, 70 * m, "purchase"), // purchase outside 1h window
      (3L, 0L, "click"), (3L, 10 * m, "view"),                           // order violated -> level 1
      (4L, 0L, "purchase"),                                              // no step-1 -> 0
      (5L, 0L, "error")                                                  // non-funnel rows dropped entirely
    ))
    val got = levels(df, 60 * m)
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("funnel: window anchors at the chain start and a LATER start rescues the chain") {
    val m = 60000L
    // view@0 starts a chain whose window (60m) excludes purchase@70m, but
    // view@30m + the same click@50m re-anchor it: 70 <= 30+60.
    val df = ev(Seq(
      (1L, 0L, "view"), (1L, 30 * m, "view"),
      (1L, 50 * m, "click"), (1L, 70 * m, "purchase")))
    assert(levels(df, 60 * m) === Map(1L -> 3))
    // without the second view the same events stop at level 2
    val df2 = ev(Seq(
      (1L, 0L, "view"), (1L, 50 * m, "click"), (1L, 70 * m, "purchase")))
    assert(levels(df2, 60 * m) === Map(1L -> 2))
  }

  test("funnel: timestamp ties are strict — a same-instant next step does not count") {
    val df = ev(Seq(
      (1L, 1000L, "view"), (1L, 1000L, "click"),   // tie: click can't follow
      (2L, 1000L, "view"), (2L, 1001L, "click")))  // 1ms later: counts
    assert(levels(df, 3600000L) === Map(1L -> 1, 2L -> 2))
  }

  test("funnel: greedy fold equals brute-force chain enumeration on random sequences") {
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "click", "purchase", "error")
    val rows = for {
      u <- 1L to 40L
      _ <- 1 to (1 + rnd.nextInt(12))
    } yield (u, rnd.nextInt(200).toLong * 1000L, types(rnd.nextInt(types.size)))
    val w = 50000L
    def stepOf(t: String) = t match {
      case "view" => 1; case "click" => 2; case "purchase" => 3; case _ => 0 }
    val brute: Map[Long, Int] = rows.groupBy(_._1).map { case (u, es) =>
      val e = es.map { case (_, t, ty) => (t, stepOf(ty)) }.filter(_._2 > 0)
      def reach(lvl: Int): Boolean = e.exists { case (t1, s1) =>
        s1 == 1 && extend(e, 1, lvl, t1, t1) }
      def extend(e0: Seq[(Long, Int)], have: Int, want: Int,
                 start: Long, last: Long): Boolean =
        have >= want || e0.exists { case (t, s) =>
          s == have + 1 && t > last && t <= start + w &&
            extend(e0, have + 1, want, start, t) }
      val lvl = (3 to 1 by -1).find(reach).getOrElse(0)
      (u, lvl)
    }
    val got = levels(ev(rows), w)
    val all = brute.keySet.filter(u => rows.exists(r => r._1 == u && stepOf(r._3) > 0))
    assert(all.forall(u => got(u) == brute(u)),
      all.filter(u => got(u) != brute(u)).map(u => s"$u: got ${got(u)} want ${brute(u)}").mkString(", "))
  }

  test("funnel: maxUserEvents flags the fat user with -1 and leaves the rest exact") {
    val df = ev((1 to 10).map(i => (1L, i * 1000L, "view")) :+
      (2L, 0L, "view") :+ (2L, 1000L, "click"))
    assert(levels(df, 3600000L, cap = 5) === Map(1L -> -1, 2L -> 2))
  }

  test("cohort retention: hand-computed buckets") {
    val h = 3600000L
    val df = ev(Seq(
      (1L, 0L, "signup"), (1L, h + 1, "view"),        // cohort 0, active 0 and 1
      (2L, h, "signup"), (2L, 3 * h, "click"),        // cohort 1, active 1 and 3
      (3L, 0L, "view")))                              // never signs up -> no cohort
    val got = Behavior.cohortRetention(df, "user_id", "ts",
      col("event_type") === "signup", h, 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("cohort retention: random events equal the brute-force cohort matrix") {
    val rnd = new scala.util.Random(31)
    val types = Vector("signup", "view", "click")
    val h = 3600000L
    val rows = (1 to 400).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(72).toLong * 600000L,
        types(rnd.nextInt(types.size))))
    val brute: Map[(Long, Long), Long] = {
      val cohort = rows.filter(_._3 == "signup").groupBy(_._1)
        .map { case (u, es) => (u, es.map(_._2).min / h) }
      rows.flatMap { case (u, t, _) =>
        cohort.get(u).map(c => (u, c, t / h - c)) }
        .filter { case (_, _, off) => off >= 0 && off <= 10 }
        .distinct // one row per (user, bucket)
        .groupBy { case (_, c, off) => (c, off) }
        .map { case (k, xs) => (k, xs.map(_._1).distinct.size.toLong) }
    }
    val got = Behavior.cohortRetention(ev(rows), "user_id", "ts",
        col("event_type") === "signup", h, 10)
      .as[(Long, Long, Long)].collect()
      .map { case (c, off, n) => ((c, off), n) }.toMap
    // the fixture's ms values start at epoch 0, so both sides bucket on
    // the same integer hours — direct equality
    assert(got === brute)
  }

  test("sequence pairs: strict ordered count incl. ties") {
    val df = ev(Seq(
      (1L, 0L, "view"), (1L, 1L, "view"), (1L, 2L, "purchase"), (1L, 3L, "purchase"), // 2*2 pairs
      (2L, 5L, "view"), (2L, 5L, "purchase"),  // tie -> not counted
      (3L, 9L, "purchase"), (3L, 10L, "view")  // wrong order
    ))
    val got = Behavior.sequencePairs(df, "user_id", "ts",
      col("event_type") === "view", col("event_type") === "purchase")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 4L, true), (2L, 0L, false), (3L, 0L, false)))
  }

  private def strictLevels(df: DataFrame, windowMs: Long): Map[Long, Int] =
    Behavior.funnelLevelsStrictOrder(df, "user_id", "ts", step, 3, windowMs)
      .as[(Long, Int)].collect().toMap

  test("strict_order: an intervening tracked event kills the chain") {
    val m = 60000L
    val df = ev(Seq(
      (1L, 0L, "view"), (1L, 10 * m, "click"), (1L, 20 * m, "purchase"), // clean run -> 3
      (2L, 0L, "view"), (2L, 10 * m, "click"), (2L, 15 * m, "view"),
      (2L, 20 * m, "purchase"),                  // second view intervenes -> 2
      (3L, 0L, "view"), (3L, 10 * m, "purchase"), (3L, 20 * m, "click"), // step-3 kills -> 1
      (4L, 0L, "view"), (4L, 10 * m, "click"), (4L, 11 * m, "click"),
      (4L, 20 * m, "purchase")))                 // duplicate click kills -> 2
    assert(strictLevels(df, 60 * m) ===
      Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 2))
    // non-funnel events are NOT interventions (they never enter the fold)
    val df2 = ev(Seq(
      (1L, 0L, "view"), (1L, 5 * m, "error"), (1L, 10 * m, "click"),
      (1L, 20 * m, "purchase")))
    assert(strictLevels(df2, 60 * m) === Map(1L -> 3))
  }

  test("strict_order: fold equals the consecutive-run brute force on random sequences") {
    val rnd = new scala.util.Random(101)
    val types = Vector("view", "click", "purchase")
    val rows = for {
      u <- 1L to 50L
      _ <- 1 to (1 + rnd.nextInt(14))
    } yield (u, rnd.nextInt(150).toLong * 1000L, types(rnd.nextInt(types.size)))
    val w = 40000L
    def stepOf(t: String) = t match {
      case "view" => 1; case "click" => 2; case _ => 3 }
    val brute: Map[Long, Int] = rows.groupBy(_._1).map { case (u, es) =>
      // the fold's exact order: (t asc, step desc)
      val seq = es.map { case (_, t, ty) => (t, stepOf(ty)) }
        .sortBy { case (t, s) => (t, -s) }
      var start = Long.MinValue; var level = 0; var best = 0
      seq.foreach { case (t, s) =>
        if (s == 1) { start = t; level = 1 }
        else if (s == level + 1 && start != Long.MinValue && t <= start + w)
          level = s
        else { level = 0; start = Long.MinValue }
        best = math.max(best, level)
      }
      (u, best)
    }
    val got = strictLevels(ev(rows), w)
    assert(got === brute,
      brute.keys.filter(u => got.get(u) != brute.get(u))
        .map(u => s"$u: got ${got.get(u)} want ${brute.get(u)}").mkString(", "))
  }

  private def dedupLevels(df: DataFrame, windowMs: Long): Map[Long, Int] =
    Behavior.funnelLevelsStrictDedup(df, "user_id", "ts", step, 3, windowMs)
      .as[(Long, Int)].collect().toMap

  test("strict_dedup: a repeated matched condition kills the chain; lower levels survive") {
    val m = 60000L
    val df = ev(Seq(
      (1L, 0L, "view"), (1L, 10 * m, "click"), (1L, 20 * m, "purchase"), // clean -> 3
      (2L, 0L, "view"), (2L, 5 * m, "view"), (2L, 10 * m, "click"),
      (2L, 20 * m, "purchase"),   // repeat view kills chain 1, chain 2 completes -> 3
      (3L, 0L, "view"), (3L, 10 * m, "click"), (3L, 12 * m, "view"),
      (3L, 20 * m, "purchase"),   // view (matched) in gap (2,3) kills -> 2, no rebuild to 3
      (4L, 0L, "view"), (4L, 10 * m, "click"), (4L, 12 * m, "click"),
      (4L, 20 * m, "purchase")))  // repeat click kills level 2; re-extends from the
                                  // SURVIVING level-1 chain at 12m -> purchase completes -> 3
    assert(dedupLevels(df, 60 * m) === Map(1L -> 3, 2L -> 3, 3L -> 2, 4L -> 3))
  }

  test("strict_dedup: fold equals chain-enumeration brute force on random sequences") {
    val rnd = new scala.util.Random(202)
    val types = Vector("view", "click", "purchase")
    val rows = for {
      u <- 1L to 50L
      _ <- 1 to (1 + rnd.nextInt(14))
    } yield (u, rnd.nextInt(150).toLong * 1000L, types(rnd.nextInt(types.size)))
    val w = 40000L
    def stepOf(t: String) = t match {
      case "view" => 1; case "click" => 2; case _ => 3 }
    // fold-order comparison key
    def before(a: (Long, Int), b: (Long, Int)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
    val brute: Map[Long, Int] = rows.groupBy(_._1).map { case (u, es) =>
      val e = es.map { case (_, t, ty) => (t, stepOf(ty)) }
      // valid chain: steps 1..L, strictly increasing ts, window from the
      // first member, and no x with x.s <= k inside gap (member k, k+1)
      def gapClean(a: (Long, Int), b: (Long, Int), maxS: Int): Boolean =
        !e.exists(x => x._2 <= maxS && before(a, x) && before(x, b))
      def extend(have: List[(Long, Int)], want: Int, start: Long): Boolean = {
        val k = have.size
        if (k >= want) true
        else e.exists { c =>
          c._2 == k + 1 && c._1 > have.head._1 && c._1 <= start + w &&
            gapClean(have.head, c, k) && extend(c :: have, want, start)
        }
      }
      def reach(lvl: Int): Boolean =
        e.exists(a => a._2 == 1 && extend(List(a), lvl, a._1))
      (u, (3 to 1 by -1).find(reach).getOrElse(0))
    }
    val got = dedupLevels(ev(rows), w)
    assert(got === brute,
      brute.keys.filter(u => got.get(u) != brute.get(u))
        .map(u => s"$u: got ${got.get(u)} want ${brute.get(u)}").mkString(", "))
  }

  test("funnel store: sequential batch folds equal one pass; replay is a no-op") {
    import graft.streaming.StreamingReconcile
    val m = 60000L
    // users spanning the batch boundary (t < 45m | t >= 45m), incl. a
    // chain whose window straddles it and a later-start rescue
    val rows = Seq(
      (1L, 0L, "view"), (1L, 10 * m, "click"), (1L, 50 * m, "purchase"),
      (2L, 30 * m, "view"), (2L, 40 * m, "click"), (2L, 60 * m, "purchase"),
      (3L, 44 * m, "view"), (3L, 46 * m, "click"),
      (4L, 50 * m, "view"))
    val df = ev(rows)
    val store = tmpDir("graft_funnel_store") + "/state"
    val w = 60 * m
    StreamingReconcile.mergeFunnelBatch(spark, store,
      df.filter(col("ts") < new Timestamp(45 * m)), step, 3, w, batchId = 0L,
      nBuckets = 4)
    StreamingReconcile.mergeFunnelBatch(spark, store,
      df.filter(col("ts") >= new Timestamp(45 * m)), step, 3, w, batchId = 1L,
      nBuckets = 4)
    def storeLevels: Map[Long, Int] =
      spark.read.parquet(store)
        .select(col("user_id"),
          Behavior.funnelLevel(col("acc")).as("l"))
        .as[(Long, Int)].collect().toMap
    val batch = levels(df, w)
    assert(storeLevels === batch)
    // replayed batch id must not move the store (per-bucket in-row guard)
    StreamingReconcile.mergeFunnelBatch(spark, store,
      df.filter(col("ts") >= new Timestamp(45 * m)), step, 3, w, batchId = 1L,
      nBuckets = 4)
    assert(storeLevels === batch)
  }

  test("funnel store: a torn per-bucket commit heals on replay, and only touched buckets rewrite") {
    import graft.streaming.StreamingReconcile
    val m = 60000L
    val rnd = new scala.util.Random(77)
    val types = Vector("view", "click", "purchase")
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(120).toLong * m,
        types(rnd.nextInt(types.size))))
    val df = ev(rows)
    val w = 45 * m
    val cut = new Timestamp(60 * m)
    val b0 = df.filter(col("ts") < cut)
    val b1 = df.filter(col("ts") >= cut)
    val store = tmpDir("graft_funnel_torn") + "/state"
    StreamingReconcile.mergeFunnelBatch(spark, store, b0, step, 3, w, 0L, nBuckets = 4)
    // simulate a TORN batch-1 commit: only bucket 2's users got folded
    val bkt2 = b1.filter(
      pmod(xxhash64(col("user_id")), lit(4L)) === 2L)
    StreamingReconcile.mergeFunnelBatch(spark, store, bkt2, step, 3, w, 1L, nBuckets = 4)
    // the replay delivers the FULL batch 1: bucket 2 must be skipped
    // (refolding a post-fold accumulator corrupts it), the rest folded
    StreamingReconcile.mergeFunnelBatch(spark, store, b1, step, 3, w, 1L, nBuckets = 4)
    val got = spark.read.parquet(store)
      .select(col("user_id"), Behavior.funnelLevel(col("acc")).as("l"))
      .as[(Long, Int)].collect().toMap
    assert(got === levels(df, w))
    // untouched buckets keep their batch id — only touched dirs rewrote
    val perBucket = spark.read.parquet(store)
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(max(StreamingReconcile.BatchCol).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(perBucket.values.toSet.contains(1L))
  }

  test("funnel stream over the fixture equals the batch operator") {
    import graft.streaming.StreamingReconcile
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingReconcile.funnelStream(spark, dir, step, 3, 21600000L)
      .as[(Long, Int)].collect().toSet
    val batch = Behavior.funnelLevels(
        graft.core.Tables.load(spark, dir, "events"), "user_id", "ts",
        step, 3, 21600000L)
      .as[(Long, Int)].collect().toSet
    assert(streamed === batch)
  }

  test("sequence pairs: repartition-invariant") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong * 500L,
        if (rnd.nextBoolean()) "view" else "purchase"))
    val a = Behavior.sequencePairs(ev(rows), "user_id", "ts",
      col("event_type") === "view", col("event_type") === "purchase")
      .as[(Long, Long, Boolean)].collect().toSeq
    val b = Behavior.sequencePairs(ev(rows).repartition(7), "user_id", "ts",
      col("event_type") === "view", col("event_type") === "purchase")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(a === b)
  }
}
