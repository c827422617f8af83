package graft.sim

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("quantizeInt8: codes bounded, dequantisation error <= scale/2") {
    val rows = Seq(Seq(0.5f, -1.0f, 0.25f, 0.0f), Seq(3.0f, 2.0f, -3.0f, 1.5f))
      .toDF("v")
      .select(col("v"), Similarity.quantizeInt8(col("v")).as("qz"))
      .collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](0)
      val scale = r.getStruct(1).getFloat(0)
      val codes = r.getStruct(1).getSeq[Byte](1)
      assert(codes.forall(c => c >= -127 && c <= 127))
      orig.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-6,
          s"dequant error for $x: code $c scale $scale")
      }
    }
  }

  test("quantized knn: recall@10 >= 0.9 vs exact, score error bounded") {
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs(Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 10))
    val quant = pairs(Similarity.quantizedKnn(queries, emb, "vec_id", "embedding", 10))
    val recall = exact.keySet.count(quant.keySet).toDouble / exact.size
    assert(recall >= 0.9, s"recall@10 = $recall")
    // int8 cosine of a matched pair stays within ~1% of the exact score
    quant.foreach { case (k, qcos) =>
      exact.get(k).foreach(ecos =>
        assert(math.abs(qcos - ecos) <= 0.02, s"$k: $qcos vs $ecos"))
    }
  }

  test("persisted IVF index reproduces ivfKnn and prunes probed clusters") {
    val dir = tmpDir("ivfidx")
    val queries = emb.filter(col("vec_id") < 8)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir, nCentroids = 8)
    val fromIndex = Similarity.queryIvfIndex(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 2)
    val direct = Similarity.ivfKnn(queries, emb, "vec_id", "embedding",
      k = 5, nCentroids = 8, nProbe = 2)
    assert(fromIndex.orderBy("query_id", "rank").collect().toSeq ==
      direct.orderBy("query_id", "rank").collect().toSeq)
    // partition pruning: a single-cluster probe plan reads a subset of files
    val cid = spark.read.parquet(s"$dir/centroids")
      .select("centroid_id").head().getLong(0)
    val one = spark.read.parquet(s"$dir/assigned").filter(col("centroid_id") === cid)
    val all = spark.read.parquet(s"$dir/assigned")
    def filesRead(df: org.apache.spark.sql.DataFrame) =
      df.select(input_file_name()).distinct().count()
    assert(filesRead(one) < filesRead(all),
      "centroid_id partition filter did not prune files")
  }

  test("appendIvfIndex: shard-decomposition invariant, replay no-op, orphan invisible") {
    val queries = emb.filter(col("vec_id") < 8)
    def probe(dir: String) = Similarity.queryIvfIndex(spark, dir, queries,
      "vec_id", "embedding", k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val s0 = emb.filter(col("vec_id") % 3 === 0)
    val s1 = emb.filter(col("vec_id") % 3 === 1)
    val s2 = emb.filter(col("vec_id") % 3 === 2)
    // (a) build(s0) + append(s1) + append(s2)
    val dirA = tmpDir("ivf_append_a")
    Similarity.buildIvfIndex(s0, "vec_id", "embedding", dirA, nCentroids = 8)
    Similarity.appendIvfIndex(s1, "vec_id", "embedding", dirA, "s1")
    Similarity.appendIvfIndex(s2, "vec_id", "embedding", dirA, "s2")
    // (b) build(s0) + append(s1 ∪ s2 as one shard): same frozen centroids,
    // so the two ingest decompositions must probe bit-identically
    val dirB = tmpDir("ivf_append_b")
    Similarity.buildIvfIndex(s0, "vec_id", "embedding", dirB, nCentroids = 8)
    Similarity.appendIvfIndex(s1.unionByName(s2), "vec_id", "embedding", dirB, "rest")
    assert(probe(dirA) == probe(dirB))
    assert(probe(dirA).nonEmpty)
    // assigned covers the whole corpus exactly once
    assert(spark.read.parquet(s"$dirA/assigned").count() == emb.count())
    // replaying a folded shard is a no-op
    val before = probe(dirA)
    Similarity.appendIvfIndex(s1.limit(1), "vec_id", "embedding", dirA, "s1")
    assert(probe(dirA) == before)
    assert(spark.read.parquet(s"$dirA/assigned").count() == emb.count())
    // orphan subtree (assigned written, meta not committed) stays invisible
    emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("neighbor_id"), lit(999L).as("centroid_id"),
        col("embedding").as("cv"))
      .withColumn("shard", lit("torn"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard", "centroid_id").parquet(s"$dirA/assigned")
    assert(probe(dirA) == before)
    // append before build fails loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.appendIvfIndex(s1, "vec_id", "embedding", tmpDir("ivf_nobuild"), "x")
    }
    assert(e.getMessage.contains("build before append"))
  }

  test("appendIvfIndex over a TORN compact heals first — pre-compact assignment survives") {
    // write-path half of the adopt-completed-tmp recovery: the append's
    // dynamic overwrite (re-)creates assigned/, after which read-side
    // recovery would orphan the completed tmp holding every pre-compact
    // shard — meta still references them, probes silently shrink
    val dir = tmpDir("ivf_torn_compact")
    val queries = emb.filter(col("vec_id") < 8)
    val s0 = emb.filter(col("vec_id") % 2 === 0)
    val s1 = emb.filter(col("vec_id") % 2 === 1)
    Similarity.buildIvfIndex(s0, "vec_id", "embedding", dir, nCentroids = 8)
    Similarity.compactIvfIndex(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/assigned"),
      new org.apache.hadoop.fs.Path(s"$dir/assigned_tmp")))
    Similarity.appendIvfIndex(s1, "vec_id", "embedding", dir, "s1")
    assert(spark.read.parquet(s"$dir/assigned").count() == emb.count())
    val parities = Similarity.queryIvfIndex(spark, dir, queries,
        "vec_id", "embedding", k = 10, nProbe = 8)
      .select(pmod(col("neighbor_id"), lit(2)))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(parities == Set(0L, 1L), "probe must reach both shards after the heal")
  }

  test("compactIvfIndex: probe identical before/after, assigned tree no larger") {
    val dir = tmpDir("ivfidx_compact")
    val queries = emb.filter(col("vec_id") < 8)
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", dir, nCentroids = 8)
    def probe() = Similarity.queryIvfIndex(spark, dir, queries, "vec_id", "embedding",
      k = 5, nProbe = 2).orderBy("query_id", "rank").collect().toSeq
    val before = probe()
    // inflate the assigned tree the way accumulated writes would (extra
    // files per centroid dir), then compact back to one file per centroid
    val assigned = spark.read.parquet(s"$dir/assigned").localCheckpoint(true)
    assigned.repartition(4).write.mode("overwrite")
      .partitionBy("shard", "centroid_id").parquet(s"$dir/assigned")
    val inflated = graft.core.AtomicStore.dataFileCount(spark, s"$dir/assigned")
    Similarity.compactIvfIndex(spark, dir)
    assert(graft.core.AtomicStore.dataFileCount(spark, s"$dir/assigned") < inflated)
    assert(probe() == before)
  }

  test("quantize property: codes bounded and dequant error <= scale/2 on generated vectors") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genVec = Gen.listOfN(16, Gen.chooseNum(-1e6f, 1e6f))
    val vecs = (1 to 30)
      .flatMap(i => genVec(Gen.Parameters.default, Seed(i.toLong)))
      .filter(_.nonEmpty)
    val rows = vecs.toDF("v")
      .select(col("v"), Similarity.quantizeInt8(col("v")).as("qz")).collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](0)
      val scale = r.getStruct(1).getFloat(0)
      val codes = r.getStruct(1).getSeq[Byte](1)
      assert(codes.forall(c => c >= -127 && c <= 127), s"codes out of range: $codes")
      orig.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale.toDouble) <= scale / 2 + math.abs(x) * 1e-6,
          s"dequant error: x=$x code=$c scale=$scale")
      }
    }
  }

  test("zero vector quantises without dividing by zero") {
    val r = Seq(Seq(0.0f, 0.0f)).toDF("v")
      .select(Similarity.quantizeInt8(col("v")).as("qz")).head()
    assert(r.getStruct(0).getSeq[Byte](1) == Seq(0.toByte, 0.toByte))
  }
}
