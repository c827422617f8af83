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

  test("labelPropagation: two cliques joined by a weak bridge settle on two communities") {
    // clique A {1,2,3} w=10 all pairs; clique B {7,8,9} w=10; bridge 3-7 w=1
    def sym(ps: Seq[(Long, Long, Long)]) =
      ps ++ ps.map { case (a, b, w) => (b, a, w) }
    val edges = sym(Seq(
      (1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L),
      (7L, 8L, 10L), (7L, 9L, 10L), (8L, 9L, 10L),
      (3L, 7L, 1L))).toDF("src", "dst", "w")
    val labels = LinkGraph.labelPropagation(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == labels(2L) && labels(2L) == labels(3L))
    assert(labels(7L) == labels(8L) && labels(8L) == labels(9L))
    assert(labels(1L) != labels(7L), "bridge must not merge the cliques")
  }

  test("labelPropagation ties break to the smallest label, deterministically") {
    // node 5 sees labels 1 and 2 with EQUAL weight -> must adopt 1
    val edges = Seq(
      (1L, 5L, 3L), (5L, 1L, 3L), (2L, 5L, 3L), (5L, 2L, 3L))
      .toDF("src", "dst", "w")
    val l1 = LinkGraph.labelPropagation(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1(5L) == 1L)
    def run(parts: Int) =
      LinkGraph.labelPropagation(edges.repartition(parts), iters = 3)
        .orderBy("item").collect().map(_.toSeq).toSeq
    assert(run(1) == run(5))
  }

  test("triangleStats: known census on a hand graph") {
    // triangle {1,2,3} + path edge 3-4: 1 triangle, wedges: orient by
    // (degree, id); plus an isolated edge 5-6
    def sym(ps: Seq[(Long, Long)]) =
      (ps ++ ps.map(_.swap)).map { case (a, b) => (a, b, 1L) }
    val edges = sym(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L)))
      .toDF("src", "dst", "w")
    val r = LinkGraph.triangleStats(edges).collect().head
    assert(r.getLong(0) == 6, "n_nodes")
    assert(r.getLong(1) == 5, "n_edges")
    assert(r.getLong(3) == 1, "n_triangles")
    val wedges = r.getLong(2)
    assert(wedges >= 1)
    assert(r.getLong(4) == 3L * 1L * 1000000L / wedges,
      "clustering_u = floor(3e6 * triangles / wedges)")
  }

  test("triangleStats counts every triangle exactly once on a random graph") {
    val rnd = new scala.util.Random(9)
    val pairs = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L if rnd.nextDouble() < 0.3
    } yield (a, b)).toSeq
    val edges = (pairs ++ pairs.map(_.swap)).map { case (a, b) => (a, b, 1L) }
      .toDF("src", "dst", "w")
    val got = LinkGraph.triangleStats(edges).collect().head.getLong(3)
    val es = pairs.toSet
    def has(a: Long, b: Long) = es.contains((a min b, a max b))
    val expect = (for {
      a <- 1L to 20L; b <- (a + 1) to 20L if has(a, b)
      c <- (b + 1) to 20L if has(a, c) && has(b, c)
    } yield 1).size.toLong
    assert(got == expect)
    assert(expect > 0, "fixture must contain triangles")
  }
}
