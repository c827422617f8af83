package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("covisitEdges: symmetric weights, threshold applied, cap bounds fan-out") {
    // users 1..3 over items: u1 {10,11,12}, u2 {10,11}, u3 {10,11,13}
    val inter = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 10L), // dup interaction collapses
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L), (3L, 13L)).toDF("user_id", "item")
    val edges = LinkGraph.covisitEdges(inter, cap = 64, minW = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // only (10,11) is shared by >= 2 users (all three); every other pair
    // has weight 1 and is pruned
    assert(edges == Set((10L, 11L, 3L), (11L, 10L, 3L)))
  }

  test("cappedIncidence keeps the cap smallest items; cap stats count the rest") {
    val inter = (1 to 10).map(i => (1L, i.toLong)).toDF("user_id", "item")
    val kept = LinkGraph.cappedIncidence(inter, cap = 4)
      .select("item").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L, 4L))
    val stats = LinkGraph.covisitCapStats(inter, cap = 4).collect().head
    assert(stats.getLong(0) == 1L && stats.getLong(1) == 6L)
  }

  test("pagerankMicro matches the hand-unrolled integer formula on a 3-node path") {
    // path graph a-b-c (symmetric, unit weights): b is the hub
    val edges = Seq(
      (1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w")
    val got = LinkGraph.pagerankMicro(edges, iters = 4, checkpointShares = false)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

    // replicate the exact fixed-point arithmetic
    val S = LinkGraph.Scale; val SS = LinkGraph.ShareScale
    val share = Map( // (src,dst) -> (w*SS) div s
      (1L, 2L) -> SS, (2L, 1L) -> (SS / 2), (2L, 3L) -> (SS / 2),
      (3L, 2L) -> SS)
    var r = Map(1L -> S / 3, 2L -> S / 3, 3L -> S / 3)
    for (_ <- 1 to 4) {
      val contrib = Map(
        1L -> (r(2L) * share((2L, 1L))) / SS,
        2L -> ((r(1L) * share((1L, 2L))) / SS + (r(3L) * share((3L, 2L))) / SS),
        3L -> (r(2L) * share((2L, 3L))) / SS)
      r = r.keys.map(k => k -> ((15L * S) / (100L * 3) + (85L * contrib(k)) / 100L)).toMap
    }
    assert(got == r)
    // the hub outranks the leaves
    assert(got(2L) > got(1L) && got(1L) == got(3L))
  }

  test("pagerankMicro is deterministic across partitioning (exact long sums)") {
    val edges = LinkGraph.covisitEdges(
      Seq.tabulate(200)(i => ((i % 7).toLong, (i % 13).toLong))
        .toDF("user_id", "item"), cap = 8, minW = 1)
    def run(parts: Int) =
      LinkGraph.pagerankMicro(edges.repartition(parts), iters = 3,
        checkpointShares = false)
        .orderBy("item").collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }
}
