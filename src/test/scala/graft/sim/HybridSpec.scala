package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("rrfFuse: hand-computed fusion of two lists") {
    // query 1: sparse ranks (10, 20, 30); dense ranks (20, 40)
    val sparse = list((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    val dense = list((1L, 20L, 1), (1L, 40L, 2))
    val got = Hybrid.rrfFuse(Seq(sparse, dense), k = 10)
      .orderBy("rank").collect()
    def w(r: Int) = 1000000000L / (60 + r) // integer division = floor
    // doc 20: w(2)+w(1); doc 10: w(1); doc 40: w(2); doc 30: w(3)
    val expect = Seq(
      (20L, w(2) + w(1), 2), (10L, w(1), 1), (40L, w(2), 1), (30L, w(3), 1))
    assert(got.length == 4)
    got.zip(expect).zipWithIndex.foreach { case ((row, (doc, u, n)), i) =>
      assert(row.getAs[Long]("doc_id") == doc, s"rank ${i + 1}")
      assert(row.getAs[Long]("rrf_u") == u, s"rrf_u of doc $doc")
      assert(row.getAs[Int]("n_lists") == n, s"n_lists of doc $doc")
      assert(row.getAs[Int]("rank") == i + 1)
    }
  }

  test("rrfFuse: equal contributions tie-break by doc_id ascending") {
    // two docs each rank-1 in exactly one list -> identical rrf_u
    val a = list((7L, 99L, 1))
    val b = list((7L, 11L, 1))
    val got = Hybrid.rrfFuse(Seq(a, b), k = 10).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(11L, 99L))
    assert(got.map(_.getAs[Long]("rrf_u")).distinct.length == 1)
  }

  test("rrfFuse: k bounds each query's emission independently") {
    val big = list((1 to 30).map(i => (1L, i.toLong, i)) ++
      (1 to 3).map(i => (2L, i.toLong, i)): _*)
    val got = Hybrid.rrfFuse(Seq(big), k = 5)
    val byQ = got.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQ(1L).length == 5)
    assert(byQ(2L).length == 3)
    // rank-1 input stays fused-rank-1 in a single-list fuse
    assert(byQ(1L).minBy(_.getAs[Int]("rank")).getAs[Long]("doc_id") == 1L)
  }

  test("rrfFuse: fused gate inputs — a doc ranked by both lists beats " +
    "an equally-ranked single-list doc") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val sparse = graft.text.Retrieval.bm25TopK(docs,
      Seq(1L -> "dup", 1L -> "merge").toDF("query_id", "term"),
      "text", "doc_id", k = 10)
    val dense = Similarity.bruteForceKnn(emb.filter(col("vec_id") === 1L),
        emb, "vec_id", "embedding", k = 10)
      .withColumnRenamed("neighbor_id", "doc_id")
    val fused = Hybrid.rrfFuse(Seq(sparse, dense), k = 10).collect()
    assert(fused.nonEmpty)
    // every fused row's n_lists is 1 or 2, and rrf_u is consistent with it
    fused.foreach { r =>
      val n = r.getAs[Int]("n_lists")
      assert(n == 1 || n == 2)
      val u = r.getAs[Long]("rrf_u")
      assert(u >= 1000000000L / 70 && u <= 2 * (1000000000L / 61))
    }
  }
}
