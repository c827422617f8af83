package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("cosine: identical vectors -> 1, orthogonal -> 0") {
    val df = Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
  }

  test("bruteForceKnn: k rows per query, self excluded, descending") {
    val res = Similarity.bruteForceKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 5)
    val rows = res.orderBy("query_id", "rank").collect()
    assert(rows.length == 15)
    assert(rows.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("lshKnn candidates are a subset ranked identically to exact cosine") {
    val res = Similarity.lshKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 5, 2)
    // every returned neighbor's cosine matches the exact computation
    val exact = Similarity.bruteForceKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 500)
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    res.collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(math.abs(exact(key) - r.getAs[Double]("cos")) < 1e-12)
    }
  }

  test("planted near-duplicate embedding is found with top similarity") {
    val planted = emb.filter(col("vec_id") === 7)
      .withColumn("vec_id", lit(990000L))
      .withColumn("embedding", transform(col("embedding"), x => x * 1.000001f))
    val corpus = emb.unionByName(planted)
    val top = Similarity.bruteForceKnn(emb.filter(col("vec_id") === 7), corpus, "vec_id", "embedding", 1)
      .head()
    assert(top.getAs[Long]("neighbor_id") == 990000L)
    assert(top.getAs[Double]("cos") > 0.999999)
  }

  test("ivfKnn: scores match exact cosine, results come from probed clusters, dup found") {
    val res = Similarity.ivfKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding",
      k = 5, nCentroids = 8, nProbe = 3)
    val exact = Similarity.bruteForceKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 500)
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(math.abs(exact(key) - r.getAs[Double]("cos")) < 1e-12)
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) => assert(rs.length <= 5) }
    // an identical planted vector shares the query's top-1 centroid -> found
    val planted = emb.filter(col("vec_id") === 5).withColumn("vec_id", lit(880000L))
    val corpus2 = emb.unionByName(planted)
    val top = Similarity.ivfKnn(emb.filter(col("vec_id") === 5), corpus2,
      "vec_id", "embedding", k = 1, nCentroids = 8, nProbe = 1).head()
    assert(top.getAs[Long]("neighbor_id") == 880000L)
  }

  test("approximate ANN recall@10 vs brute force stays above floor") {
    val queries = emb.filter(col("vec_id") < 8)
    def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topIds(Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 10))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, ids) =>
        approx.getOrElse(q, Set.empty).intersect(ids).size.toDouble / ids.size }
      per.sum / per.size
    }
    val lsh = recall(topIds(Similarity.lshKnn(queries, emb, "vec_id", "embedding", 10, 4)))
    val lshMp = recall(topIds(Similarity.lshKnn(queries, emb, "vec_id", "embedding", 10, 4,
      probes = 3)))
    val ivf = recall(topIds(Similarity.ivfKnn(queries, emb, "vec_id", "embedding",
      k = 10, nCentroids = 8, nProbe = 4, lloydIters = 1)))
    info(f"recall@10 on random fixture: lsh=$lsh%.3f lsh3probe=$lshMp%.3f ivf=$ivf%.3f")
    // multi-probe visits a superset of the single bucket -> recall can only rise
    assert(lshMp >= lsh, s"multi-probe recall $lshMp below single-probe $lsh")
    // Collapse guards, not quality bounds: i.i.d.-random embeddings are
    // LSH/IVF's worst case (no cluster structure, top-10 cosine barely
    // above the bulk), so absolute recall is inherently low here — the
    // floors catch a plan/parameter regression zeroing the candidate sets.
    // The deterministic fixture makes these exact, not flaky.
    assert(lsh >= 0.05, s"LSH recall@10 collapsed: $lsh")
    assert(ivf >= 0.3, s"IVF recall@10 collapsed: $ivf")
  }

  test("semanticDedup: planted duplicate loses, original keeps, full corpus covered") {
    // identical vector with a LARGER id -> it is the one dropped
    val planted = emb.filter(col("vec_id") === 5).withColumn("vec_id", lit(880000L))
    val corpus = emb.unionByName(planted)
    val out = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      nCentroids = 8, threshold = 0.999999, lloydIters = 1)
    val rows = out.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    assert(rows.size == corpus.count()) // verdict for every row
    assert(!rows(880000L)) // the duplicate is dropped
    assert(rows(5L)) // its smaller-id original survives
    // near-1 threshold: nothing else in the fixture is that similar
    assert(rows.count(!_._2) == 1)
    // identical vectors land in the same cluster
    val cents = out.filter(col("vec_id").isin(5L, 880000L))
      .select("centroid_id").distinct().count()
    assert(cents == 1)
  }

  test("semanticDedup fat-cluster guard: sub-bucketing still catches exact duplicates") {
    // plant a FAT cluster: 40 identical copies of one vector, so their
    // centroid's cluster blows past maxCluster and the LSH sub-bucket
    // guard engages — identical vectors share every sign bit, so the
    // guard must not hide them from each other
    val base = emb.filter(col("vec_id") === 5)
    val copies = base.crossJoin(spark.range(40).select((col("id") + 900000L).as("nid")))
      .withColumn("vec_id", col("nid")).drop("nid")
      .select(emb.columns.map(col): _*)
    val corpus = emb.unionByName(copies)
    val out = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      nCentroids = 8, threshold = 0.999999, maxCluster = 10)
    val rows = out.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    assert(rows.size == corpus.count())
    assert(rows(5L)) // smallest id of the identical set survives
    (0 until 40).foreach(i => assert(!rows(900000L + i), s"copy $i kept"))
    // on this fixture the guard changes nothing else: guard-off parity
    val offRows = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        nCentroids = 8, threshold = 0.999999, maxCluster = 0)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    assert(rows == offRows)
  }

  test("fatClusterStats: planted dense cluster counted; healthy corpus reports zero") {
    // 60 near-identical vectors (one semantic cluster) + 30 spread ones;
    // cap 40 → exactly one fat cluster of ≥60 sub-bucketed rows
    val dense = (0 until 60).map(i =>
      (i.toLong, Seq(10f, 0.001f * i, 0f, 0f)))
    val spread = (100 until 130).map(i =>
      (i.toLong, Seq(0.1f * (i - 100), 10f - 0.1f * (i - 100), 1f * (i % 3), 0.5f * (i % 5))))
    val df = (dense ++ spread).toDF("vec_id", "embedding")
    // 60 dense rows over ≤3 clusters: pigeonhole guarantees one cluster
    // ≥ 20 rows whatever the hash seeding does
    val r = Similarity.fatClusterStats(df, "vec_id", "embedding",
      nCentroids = 3, maxCluster = 15).head()
    assert(r.getLong(1) >= 1L, s"fat cluster not counted: $r")
    assert(r.getLong(2) >= 20L, s"sub-bucketed rows undercounted: $r")
    // counters describe the SAME clustering the dedup guard runs on: with
    // a cap high enough, nothing is fat and nothing sub-buckets
    val quiet = Similarity.fatClusterStats(df, "vec_id", "embedding",
      nCentroids = 3, maxCluster = 90).head()
    assert(quiet.getLong(1) == 0L && quiet.getLong(2) == 0L, quiet)
  }

  test("semanticDedup auto cluster count: verdict for every row, duplicate still dropped") {
    // nCentroids=0 -> auto ~count/1024 clamped to >=16: on this small
    // fixture that resolves to the 16 floor; the semantics contract
    // (full coverage + exact-duplicate drop) must hold unchanged
    val planted = emb.filter(col("vec_id") === 5).withColumn("vec_id", lit(880000L))
    val corpus = emb.unionByName(planted)
    val out = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      nCentroids = 0, threshold = 0.999999, lloydIters = 1)
    val rows = out.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    assert(rows.size == corpus.count())
    assert(!rows(880000L) && rows(5L))
    // auto mode used the 16-cluster floor -> at most 16 distinct centroids
    assert(out.select("centroid_id").distinct().count() <= 16)
  }

  test("bounded top-k reproduces row_number window semantics exactly") {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(col("vec_id") < 8)
    // force several partitions so partial heaps + serialize/merge are hit
    val res = Similarity.bruteForceKnn(q, emb.repartition(7), "vec_id", "embedding", 10)
      .orderBy("query_id", "rank").collect().toSeq
    val qq = q.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = c.join(broadcast(qq), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    val ref = scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(res == ref)
  }

  test("knn plans: k-bounded partial aggregate, no window, no corpus shuffle in IVF assign") {
    val q = emb.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceKnn(q, emb, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(bf.contains("ObjectHashAggregate"), bf.take(1500))
    assert(bf.contains("partial_bounded_top_k") || bf.contains("bounded_top_k"), bf.take(1500))
    assert(!bf.contains("Window"), "window top-k reintroduced:\n" + bf.take(1500))
    val ivf = Similarity.ivfKnn(q, emb, "vec_id", "embedding", 5, 8, 3)
      .queryExecution.executedPlan.toString
    assert(!ivf.contains("Window"), ivf.take(1500))
    // exactly one data shuffle: the k-bounded top-k groupBy on query_id.
    // Centroid assignment is a BroadcastNestedLoopJoin over the one-row
    // centroid-array relation — the corpus itself never shuffles.
    val dataShuffles = "Exchange hashpartitioning".r.findAllIn(ivf).length
    assert(dataShuffles == 1, s"expected 1 hash shuffle, got $dataShuffles:\n" + ivf.take(2000))
    assert(ivf.contains("BroadcastNestedLoopJoin"), ivf.take(2000))
  }

  test("Lloyd refinement: centroid set keeps shape, ivfKnn stays exact-score and finds dups") {
    val seeds = emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(8)
      .select(col("vec_id").as("centroid_id"), col("embedding").cast("array<float>").as("centroid_vec"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val refined = Similarity.refineCentroids(emb, seeds, "vec_id", "embedding").collect()
    assert(refined.length == 8)
    refined.foreach(r => assert(r.getSeq[Float](1).length == dim))
    // refined centroids differ from the seeds (means moved) for at least one
    val seedMap = seeds.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(refined.exists(r => seedMap(r.getLong(0)) != r.getSeq[Float](1)))

    val res = Similarity.ivfKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding",
      k = 5, nCentroids = 8, nProbe = 3, lloydIters = 2, lloydSamplePct = 50)
    val exact = Similarity.bruteForceKnn(emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 500)
      .select("query_id", "neighbor_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = res.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(math.abs(exact(key) - r.getAs[Double]("cos")) < 1e-12)
    }
    // identical planted vector still shares its query's top-1 centroid
    val planted = emb.filter(col("vec_id") === 5).withColumn("vec_id", lit(880001L))
    val top = Similarity.ivfKnn(emb.filter(col("vec_id") === 5), emb.unionByName(planted),
      "vec_id", "embedding", k = 1, nCentroids = 8, nProbe = 1, lloydIters = 1).head()
    assert(top.getAs[Long]("neighbor_id") == 880001L)
  }

  test("cosineNearDupPairs respects group bound and threshold") {
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", "label", 0.25)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.collect().foreach { r =>
      assert(labels(r.getAs[Long]("id_a")) == labels(r.getAs[Long]("id_b")))
      assert(r.getAs[Double]("cos") >= 0.25)
    }
  }

  test("filteredBruteForceKnn: every neighbor shares the query's label; equals per-slice brute force") {
    val q = emb.filter(col("vec_id") < 3)
    val got = Similarity.filteredBruteForceKnn(q, emb, "vec_id", "embedding", "label", 5)
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(
      labels(r.getAs[Long]("neighbor_id")) == labels(r.getAs[Long]("query_id"))))
    // slice-equivalence: for one query, result == bruteForceKnn over the
    // pre-filtered slice
    val q0 = q.orderBy("vec_id").limit(1)
    val l0 = labels(q0.select("vec_id").head().getLong(0))
    val sliced = Similarity.bruteForceKnn(q0,
      emb.filter(col("label") === l0), "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank").collect().toSeq
    val filt = Similarity.filteredBruteForceKnn(q0, emb,
      "vec_id", "embedding", "label", 5)
      .select("query_id", "neighbor_id", "rank").collect().toSeq
    assert(filt == sliced)
  }

  test("queryIvfIndex shardFilter: probes ONLY the named shard; scan prunes other shards' directories") {
    val dir = tmpDir("graft_ivf_shardfilter")
    val a = emb.filter(col("label") === 0)
    val b = emb.filter(col("label") === 1)
    Similarity.buildIvfIndex(a, "vec_id", "embedding", dir,
      nCentroids = 2, shardId = "label_0")
    Similarity.appendIvfIndex(b, "vec_id", "embedding", dir, "label_1")
    val q = a.filter(col("vec_id") < 60).limit(1)
    val hits = Similarity.queryIvfIndex(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 2, shardFilter = Set("label_0"))
    val bIds = b.select("vec_id").as[Long].collect().toSet
    val got = hits.collect()
    assert(got.nonEmpty)
    // no cross-shard neighbor can appear
    assert(got.forall(r => !bIds.contains(r.getAs[Long]("neighbor_id"))))
    // the scan must carry the shard partition filter (directory pruning,
    // not a post-read filter of the whole tree)
    val plan = Similarity.queryIvfIndex(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 2, shardFilter = Set("label_0"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("shard"), plan.take(1500))
    // an unknown shard id scans nothing and returns no rows
    assert(Similarity.queryIvfIndex(spark, dir, q, "vec_id", "embedding",
      k = 5, nProbe = 2, shardFilter = Set("nope")).count() == 0)
  }

  test("queryIvfIndexBatched: bit-identical to the per-query probe; corpus join is equi, never nested-loop") {
    val dir = tmpDir("graft_ivf_batched")
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir, nCentroids = 8)
    def set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"))).toSet
    // parity on the gate-sized query set AND on a corpus-sized batch
    // (every vector as a query — the per-query path still handles it at
    // fixture scale, so the two paths are directly comparable)
    val q8 = emb.filter(col("vec_id") < 8)
    assert(set(Similarity.queryIvfIndexBatched(spark, dir, q8,
        "vec_id", "embedding", k = 5, nProbe = 2)) ==
      set(Similarity.queryIvfIndex(spark, dir, q8,
        "vec_id", "embedding", k = 5, nProbe = 2)))
    val batched = Similarity.queryIvfIndexBatched(spark, dir, emb,
      "vec_id", "embedding", k = 5, nProbe = 2)
    assert(set(batched) == set(Similarity.queryIvfIndex(spark, dir, emb,
      "vec_id", "embedding", k = 5, nProbe = 2)))
    // plan guard (round-8 verdict task #1): the corpus ⋈ queries join must
    // key on centroid_id as a HASH/SMJ family join — the only permitted
    // nested-loop is the 1-row centroid-array append (assignProbes), which
    // never touches the corpus relation
    val plan = batched.queryExecution.executedPlan.toString
    val joinLines = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("centroid_id")).toSeq
    assert(joinLines.nonEmpty, "no centroid_id join found:\n" + plan.take(2000))
    assert(joinLines.forall(l => !l.contains("BroadcastNestedLoopJoin")),
      "corpus join planned as nested loop:\n" + joinLines.mkString("\n"))
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val bnljs = batched.queryExecution.executedPlan.collect {
      case j: BroadcastNestedLoopJoinExec => j }
    assert(bnljs.forall(_.toString.contains("cents")),
      "a BNLJ beyond the 1-row centroid append:\n" + bnljs.mkString("\n").take(2000))
  }
}
