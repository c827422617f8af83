package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("codebooks: m blocks x kCodes codes of dim d/m, deterministic across runs") {
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 4, kCodes = 8, lloydIters = 1)
    val rows = cb.collect()
    assert(rows.length == 32)
    assert(rows.map(r => (r.getAs[Int]("block"), r.getAs[Long]("centroid_id"))).toSet ==
      (for (b <- 0 until 4; c <- 0L until 8L) yield (b, c)).toSet)
    assert(rows.forall(_.getAs[Seq[Float]]("centroid_vec").length == 16))
    val again = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 4, kCodes = 8, lloydIters = 1).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("encode: codes in range, one per block, HOF argmax parity per block") {
    val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 4, kCodes = 8).localCheckpoint(true)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", cb).collect()
    assert(codes.length == emb.count())
    assert(codes.forall(_.getAs[Seq[Long]]("codes").forall(c => c >= 0 && c < 8)))
    assert(codes.forall(_.getAs[Seq[Long]]("codes").length == 4))
    // parity: block-0 code equals the argmax-cosine centroid computed by
    // the independent HOF sort formulation
    val c0 = cb.filter(col("block") === 0)
      .agg(collect_list(struct(col("centroid_id"), col("centroid_vec"))).as("cents"))
    val hof = Similarity.assignProbesSortHof(
        emb.select(col("vec_id"), slice(col("embedding"), 1, 16)
          .cast("array<float>").as("sv")),
        c0, "sv", 1)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    codes.foreach { r =>
      assert(r.getAs[Seq[Long]]("codes").head == hof(r.getAs[Long]("id")),
        s"block-0 code mismatch for id ${r.getAs[Long]("id")}")
    }
  }

  test("pqKnn + rerank: recall@10 vs exact stays useful, full k returned") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def hitsOf(df: org.apache.spark.sql.DataFrame): Seq[Int] = {
      val approx = df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      assert(approx.values.forall(_.size == 10))
      exact.keys.toSeq.sorted.map(q => approx.getOrElse(q, Set.empty).count(exact(q)))
    }
    val adc = hitsOf(Similarity.pqKnn(queries, emb, "vec_id", "embedding",
      k = 10, m = 8, kCodes = 32, lloydIters = 2))
    val rr = hitsOf(Similarity.pqKnnRerank(queries, emb, "vec_id", "embedding",
      k = 10, shortlist = 100, m = 8, kCodes = 32, lloydIters = 2))
    info(s"ADC hits:    ${adc.mkString(",")}")
    info(s"rerank hits: ${rr.mkString(",")}")
    // rerank can only surface what ADC shortlists; with a 100-wide
    // shortlist over the 500-doc fixture the exact re-rank should keep
    // a solid majority of the true top-10
    assert(rr.forall(_ >= 5), s"PQ+rerank recall collapsed: $rr")
    assert(rr.sum >= adc.sum, "exact re-rank should not lose hits vs raw ADC")
  }

  test("persisted PQ index: probe ≡ direct rank-for-rank; append shard-decomposition invariant; orphan invisible") {
    val queries = emb.filter(col("vec_id") < 8)
    def probe(dir: String) = Similarity.queryPqIndex(spark, dir, queries,
      "vec_id", "embedding", k = 5).orderBy("query_id", "rank").collect().toSeq
    val dirA = tmpDir("pq_idx_a")
    Similarity.buildPqIndex(emb, "vec_id", "embedding", dirA,
      m = 8, kCodes = 32, lloydIters = 1)
    val direct = Similarity.pqKnn(queries, emb, "vec_id", "embedding",
        k = 5, m = 8, kCodes = 32, lloydIters = 1)
      .orderBy("query_id", "rank").collect().toSeq
    assert(probe(dirA) == direct, "index probe must equal direct ADC bit-for-bit")
    // append: build on one parity, append the other — but codebooks are
    // frozen at BUILD, so parity with dirA requires the same training
    // corpus; instead assert decomposition invariance between two
    // append layouts sharing the same build shard
    val s0 = emb.filter(col("vec_id") % 3 === 0)
    val rest = emb.filter(col("vec_id") % 3 =!= 0)
    val dirB = tmpDir("pq_idx_b")
    Similarity.buildPqIndex(s0, "vec_id", "embedding", dirB,
      m = 8, kCodes = 32, lloydIters = 1)
    Similarity.appendPqIndex(rest, "vec_id", "embedding", dirB, "rest")
    val dirC = tmpDir("pq_idx_c")
    Similarity.buildPqIndex(s0, "vec_id", "embedding", dirC,
      m = 8, kCodes = 32, lloydIters = 1)
    Similarity.appendPqIndex(emb.filter(col("vec_id") % 3 === 1),
      "vec_id", "embedding", dirC, "r1")
    Similarity.appendPqIndex(emb.filter(col("vec_id") % 3 === 2),
      "vec_id", "embedding", dirC, "r2")
    assert(probe(dirB) == probe(dirC))
    assert(spark.read.parquet(s"$dirB/codes").count() == emb.count())
    // replay no-op; orphan codes subtree invisible until meta commits
    Similarity.appendPqIndex(rest.limit(1), "vec_id", "embedding", dirB, "rest")
    assert(spark.read.parquet(s"$dirB/codes").count() == emb.count())
    val before = probe(dirB)
    emb.limit(1).select(col("vec_id").as("id"),
        org.apache.spark.sql.functions.array(lit(0L)).as("codes"))
      .withColumn("shard", lit("torn"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$dirB/codes")
    assert(probe(dirB) == before)
    // compaction: probe identical, file count shrinks or holds
    Similarity.compactPqIndex(spark, dirB)
    assert(probe(dirB) == before)
  }

  test("appendPqIndex over a TORN compact heals first — pre-compact codes survive") {
    val dir = tmpDir("pq_torn_compact")
    val s0 = emb.filter(col("vec_id") % 2 === 0)
    val s1 = emb.filter(col("vec_id") % 2 === 1)
    Similarity.buildPqIndex(s0, "vec_id", "embedding", dir,
      m = 8, kCodes = 16, lloydIters = 1)
    Similarity.compactPqIndex(spark, dir)
    // crash between the compact swap's delete and rename
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/codes"),
      new org.apache.hadoop.fs.Path(s"$dir/codes_tmp")))
    Similarity.appendPqIndex(s1, "vec_id", "embedding", dir, "s1")
    assert(spark.read.parquet(s"$dir/codes").count() == emb.count(),
      "pre-compact codes must survive the append after a torn compact")
  }

  test("ivfPqKnn: full k, recall above the composed floor, deterministic") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def run() = Similarity.ivfPqKnn(queries, emb, "vec_id", "embedding",
        k = 10, nCentroids = 16, nProbe = 8, shortlist = 100,
        m = 8, kCodes = 32, lloydIters = 1)
      .orderBy("query_id", "rank").collect().toSeq
    val rows = run()
    val approx = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(approx.values.forall(_.size == 10))
    val hits = exact.keys.toSeq.sorted.map(q => approx.getOrElse(q, Set.empty).count(exact(q)))
    info(s"ivf-pq hits: ${hits.mkString(",")}")
    assert(hits.forall(_ >= 2), s"IVF-PQ recall under composed floor: $hits")
    assert(run() == rows, "IVF-PQ must be deterministic run-over-run")
  }
}
