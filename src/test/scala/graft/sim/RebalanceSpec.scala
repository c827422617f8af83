package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Index-drift maintenance (round-7 task #4): frozen centroids/codebooks
  * degrade as the corpus drifts; rebalance retrains + re-encodes behind
  * the generation-pointer meta swap. Everything here is deterministic
  * (hash-seeded training, arithmetic vectors), so the recall numbers are
  * fixed run-over-run. */
class RebalanceSpec extends SparkSpec {
  import spark.implicits._

  /** 16-dim geometry engineered so drift provably scatters:
    *
    * Build corpus: 4 tight clusters along dims 0..3, each member with a
    * small ±wobble on dim 7 — so the build centroids carry dim-7 signs.
    *
    * Drift corpus: 8 tight clusters along dims 8..15 — ORTHOGONAL to
    * every build direction, so a drifted vector's cosine against every
    * build centroid reduces to its dim-7 wobble alignment: members of
    * one drifted cluster alternate dim-7 SIGN by index parity and
    * therefore SPLIT across build centroids, while their true
    * near-neighbour ranking (cluster direction, dim-7 producing only a
    * tiny within-cluster cosine dip) keeps the whole cluster as the
    * top-k. A 1-probe query hence finds only its own parity's half —
    * the planted recall drop. After retraining on the union, each
    * drifted cluster owns a centroid (cos ≈ 1 dominates any wobble) and
    * co-locates again. */
  private def buildCorpus: DataFrame =
    (0 until 64).map { i =>
      val axis = i % 4
      val base = Array.fill(16)(0.0)
      base(7) = 0.04 * (if (i % 2 == 0) 1 else -1)
      base(axis) = 10.0
      (i.toLong, base.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")

  private def driftCorpus: DataFrame =
    (0 until 64).map { i =>
      val base = Array.fill(16)(0.0)
      // one tight cluster on dim 8. dim 6: the RANKING continuum (build
      // centroids are 0 there, so it never influences pre-rebalance
      // assignment) — i-adjacent members are each other's nearest
      // neighbours. dim 7: the SPLIT wobble — alternates with i, so
      // ranking-adjacent members land on opposite sides of the build
      // centroids' dim-7 signs and scatter across them.
      base(6) = 0.05 * (i - 31.5)
      // small enough that ranking stays an angle continuum on dim 6, big
      // enough that its SIGN decides assignment against the orthogonal
      // build centroids (whose only overlap with drifted vectors is dim 7)
      base(7) = 0.05 * (if (i % 2 == 0) 1 else -1)
      base(8) = 10.0
      (1000L + i, base.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")

  private def recallAt(index: String, queries: DataFrame, full: DataFrame,
      k: Int, nProbe: Int): Double = {
    val approx = Similarity.queryIvfIndex(spark, index, queries,
      "vec_id", "embedding", k = k, nProbe = nProbe)
    val exact = Similarity.bruteForceKnn(queries, full, "vec_id", "embedding", k)
    val hits = approx.join(exact.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    hits.toDouble / exact.count()
  }

  test("planted drift drops IVF recall; rebalance restores it (old gen readable until the flip)") {
    val idx = tmpDir("ivf_rebalance")
    val a = buildCorpus
    val b = driftCorpus
    val full = a.unionByName(b)
    // 8 queries spread across the drifted cluster's ranking continuum
    val queries = b.filter(col("vec_id") % 8 === 4)
    Similarity.buildIvfIndex(a, "vec_id", "embedding", idx, nCentroids = 8)
    Similarity.appendIvfIndex(b, "vec_id", "embedding", idx, "drifted")
    val before = recallAt(idx, queries, full, k = 7, nProbe = 1)
    Similarity.rebalanceIvfIndex(spark, idx, nCentroids = 4, lloydIters = 1)
    val after = recallAt(idx, queries, full, k = 7, nProbe = 1)
    // deterministic corpus → fixed numbers; the margin is the spec
    assert(after > before,
      s"rebalance must restore drifted recall: before=$before after=$after")
    assert(after >= 0.8, s"rebalanced recall floor: $after")
    assert(before <= 0.6, s"drift must actually hurt (else this spec tests nothing): $before")
    // old generation dirs are gone after the commit; the new one serves
    assert(!graft.core.Fs.exists(spark, s"$idx/assigned"))
    assert(graft.core.Fs.exists(spark, s"$idx/gen-1/assigned"))
  }

  test("rebalanced index: old-shard replay still guarded; append + compact keep working") {
    val idx = tmpDir("ivf_rebalance_append")
    val a = buildCorpus
    Similarity.buildIvfIndex(a.filter(col("vec_id") < 32), "vec_id", "embedding",
      idx, nCentroids = 4)
    Similarity.appendIvfIndex(a.filter(col("vec_id") >= 32), "vec_id", "embedding",
      idx, "s1")
    Similarity.rebalanceIvfIndex(spark, idx, nCentroids = 4)
    val q = a.filter(col("vec_id") < 4)
    val probe0 = Similarity.queryIvfIndex(spark, idx, q, "vec_id", "embedding",
      k = 5, nProbe = 2).collect().map(_.toSeq).toSet
    // replaying an already-folded shard into the NEW generation: no-op
    Similarity.appendIvfIndex(a.filter(col("vec_id") >= 32)
      .withColumn("embedding", transform(col("embedding"), x => x * 2)),
      "vec_id", "embedding", idx, "s1")
    val probe1 = Similarity.queryIvfIndex(spark, idx, q, "vec_id", "embedding",
      k = 5, nProbe = 2).collect().map(_.toSeq).toSet
    assert(probe1 == probe0, "replayed shard must not change the index")
    // a genuinely new shard folds into the current generation
    val extra = (200 until 208).map { i =>
      val base = Array.fill(16)(0.0); base(5) = 10.0
      (i.toLong, base.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    Similarity.appendIvfIndex(extra, "vec_id", "embedding", idx, "s2")
    val probeExtra = Similarity.queryIvfIndex(spark, idx,
      extra.limit(1), "vec_id", "embedding", k = 3, nProbe = 2)
    assert(probeExtra.count() == 3)
    // compaction of the rebalanced generation: probe identical
    Similarity.compactIvfIndex(spark, idx)
    val probe2 = Similarity.queryIvfIndex(spark, idx, q, "vec_id", "embedding",
      k = 5, nProbe = 2).collect().map(_.toSeq).toSet
    assert(probe2 == probe1)
  }

  test("second rebalance increments the generation and stays correct") {
    val idx = tmpDir("ivf_rebalance_twice")
    val a = buildCorpus
    Similarity.buildIvfIndex(a, "vec_id", "embedding", idx, nCentroids = 4)
    Similarity.rebalanceIvfIndex(spark, idx, nCentroids = 4)
    Similarity.rebalanceIvfIndex(spark, idx, nCentroids = 4)
    assert(graft.core.Fs.exists(spark, s"$idx/gen-2/assigned"))
    assert(!graft.core.Fs.exists(spark, s"$idx/gen-1"))
    // a rebalanced-twice index over an unchanged corpus probes like a
    // fresh build (the q113 parity argument, applied twice)
    val q = a.filter(col("vec_id") < 4)
    val viaIdx = Similarity.queryIvfIndex(spark, idx, q, "vec_id", "embedding",
      k = 5, nProbe = 2).collect().map(_.toSeq).toSet
    val direct = Similarity.ivfKnn(q, a, "vec_id", "embedding",
      k = 5, nCentroids = 4, nProbe = 2).collect().map(_.toSeq).toSet
    assert(viaIdx == direct)
  }

  test("PQ rebalance: retrained codebooks commit atomically; probe equals a fresh build") {
    val idx = tmpDir("pq_rebalance")
    val a = buildCorpus
    val b = driftCorpus
    val full = a.unionByName(b)
    Similarity.buildPqIndex(a, "vec_id", "embedding", idx,
      m = 4, kCodes = 8, lloydIters = 1)
    Similarity.appendPqIndex(b, "vec_id", "embedding", idx, "drifted")
    Similarity.rebalancePqIndex(full, "vec_id", "embedding", idx,
      m = 4, kCodes = 8, lloydIters = 1)
    assert(graft.core.Fs.exists(spark, s"$idx/gen-1/codes"))
    assert(!graft.core.Fs.exists(spark, s"$idx/codes"))
    val q = b.filter(col("vec_id") < 1004)
    val viaIdx = Similarity.queryPqIndex(spark, idx, q, "vec_id", "embedding", k = 6)
      .collect().map(_.toSeq).toSet
    // fresh one-shot build over the union = the rebalance's contract
    val idx2 = tmpDir("pq_rebalance_fresh")
    Similarity.buildPqIndex(full, "vec_id", "embedding", idx2,
      m = 4, kCodes = 8, lloydIters = 1)
    val fresh = Similarity.queryPqIndex(spark, idx2, q, "vec_id", "embedding", k = 6)
      .collect().map(_.toSeq).toSet
    assert(viaIdx == fresh)
  }
}
