package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  /** documents plus a perturbed near-copy of each doc_id < 10 (one token
    * changed) and an exact copy of doc_id 0, offset ids. */
  private lazy val withDups = {
    val near = docs.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 100000)
      .withColumn("text", concat(col("text"), lit(" zzqx")))
    val exact = docs.filter(col("doc_id") === 0)
      .withColumn("doc_id", col("doc_id") + 200000)
    docs.unionByName(near).unionByName(exact)
  }

  test("exact dedup keeps min id per content group") {
    val groups = Dedup.exactGroups(withDups, "text", "doc_id")
    val dupGroup = groups.filter(col("n_dups") > 1).collect()
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keep_id") == 0L)
    val deduped = Dedup.dropExact(withDups, "text", "doc_id")
    assert(deduped.count() == withDups.count() - 1)
    assert(deduped.filter(col("doc_id") === 200000).count() == 0)
  }

  test("minhash LSH finds planted near-duplicates") {
    val pairs = Dedup.minhashPairs(withDups, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 10).foreach { i =>
      assert(pairs.contains((i.toLong, i + 100000L)), s"near-dup pair for doc $i not found")
    }
  }

  test("estimated jaccard approximates exact jaccard for near-dups") {
    val est = Dedup.minhashPairs(withDups, "text", "doc_id", threshold = 0.5)
      .filter(col("id_a") === 3 && col("id_b") === 100003)
      .head().getAs[Double]("est_jaccard")
    assert(est > 0.6, s"est_jaccard=$est for a 1-token-appended copy")
  }

  test("simhash: near-dups close in hamming distance, unrelated docs far") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val sigs = withDups.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDists = (0 until 10).map(i => hamming(sigs(i.toLong), sigs(i + 100000L)))
    assert(nearDists.forall(_ <= 12), s"near-dup hamming distances: $nearDists")
    assert(hamming(sigs(0L), sigs(200000L)) == 0) // exact copy -> identical
  }

  test("token jaccard pairs: exact copy scores 1.0") {
    val j = Dedup.tokenJaccardPairs(
      withDups.filter(col("doc_id").isin(0L, 200000L))
        .withColumn("doc_id", when(col("doc_id") === 200000L, 1L).otherwise(col("doc_id"))),
      "text", "doc_id", 3)
    val row = j.head()
    assert(row.getAs[Double]("jaccard") == 1.0)
  }

  test("shingles slide over tokens") {
    val sh = Seq("a b c d").toDF("text")
      .select(Dedup.wordShingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Dedup.wordShingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }
}
