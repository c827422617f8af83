package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structural invariants of the curation operators (exact-value parity is
  * the DuckDB gate's job; these pin the semantics the oracle can't see). */
class CurationQueriesSpec extends SparkSpec {

  private def run(q: String) = CurationQueries.all(q)(spark, sf001)

  test("q58 packs partition the corpus: token totals add up, pack ids dense per source") {
    val packs = run("q58_seq_packing").cache()
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val totalTokens = docs
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .first().getLong(0)
    assert(packs.agg(sum("pack_tokens")).first().getLong(0) == totalTokens)
    // pack ids per source are 0..max with no gaps (cumsum bucketing is dense
    // only if every pack gets at least one doc-start; allow gaps when a
    // single doc overflows several budgets — so check start-at-zero + order)
    val firstIds = packs.groupBy("source").agg(min("pack_id").as("m"))
      .filter(col("m") =!= 0).count()
    assert(firstIds == 0, "every source's first pack must be pack 0")
    packs.unpersist()
  }

  test("q59 split fractions: buckets deterministic, rerun-stable, ~98/1/1") {
    val a = run("q59_hash_split").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = run("q59_hash_split").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "split must be deterministic across runs")
    val total = a.values.sum.toDouble
    assert(a("train") / total > 0.9, s"train fraction ${a("train") / total}")
    assert(a.keySet == Set("train", "val", "test") || a.keySet == Set("train")
      || a.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("q60 contamination only reports corpus docs, never benchmark members") {
    val hits = run("q60_contamination")
    assert(hits.filter(col("doc_id") % 97 === 0).count() == 0)
    assert(hits.filter(col("n_hits") <= 0).count() == 0)
  }

  test("q61 stratified sample: at most 3 per stratum, members from that stratum") {
    val sample = run("q61_stratified_sample").cache()
    val over = sample.groupBy("lang", "source").count().filter(col("count") > 3)
    assert(over.count() == 0)
    // every sampled doc_id really carries the stratum's (lang, source)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), col("lang").as("l"), col("source").as("s"))
    val mismatched = sample.join(docs, "doc_id")
      .filter(col("lang") =!= col("l") || col("source") =!= col("s"))
    assert(mismatched.count() == 0)
    sample.unpersist()
  }

  test("epochUpsample invariants: exact expansion accounting, partitioning-independent, large-id safe") {
    import spark.implicits._
    val docs = (0 until 400).map(i =>
      (i.toLong, if (i % 2 == 0) "hq" else "crawl")).toDF("doc_id", "source")
    val rates = Map("hq" -> 2250000L, "crawl" -> 400000L) // 2.25 and 0.4
    val out = CurationQueries.epochUpsample(docs, rates)
    // exact accounting: every hq doc 2 or 3 copies, crawl 0 or 1, and the
    // totals equal the sum of the deterministic per-doc draws
    val perDoc = out.groupBy("doc_id").count()
      .join(docs, Seq("doc_id"))
      .collect().map(r => (r.getString(2), r.getLong(1)))
    assert(perDoc.filter(_._1 == "hq").forall(c => c._2 == 2 || c._2 == 3))
    assert(perDoc.filter(_._1 == "crawl").forall(_._2 == 1))
    val hqTotal = perDoc.filter(_._1 == "hq").map(_._2).sum
    assert(hqTotal >= 400 && hqTotal <= 600, s"hq mass $hqTotal out of [2,3]x band")
    // copy_idx is dense 1..n per doc
    assert(out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("m"), min("copy_idx").as("lo"))
      .filter(col("n") =!= col("m") || col("lo") =!= 1).count() == 0)
    // partitioning-independence: the same rows under a different layout
    // produce the identical expansion (the decision is per-row arithmetic)
    val re = CurationQueries.epochUpsample(docs.repartition(7), rates)
      .collect().map(r => (r.getLong(0), r.getLong(r.length - 1))).toSet
    assert(re == out.collect().map(r => (r.getLong(0), r.getLong(r.length - 1))).toSet)
    // ids past the raw-Knuth overflow point neither throw nor destabilise
    val big = Seq((4000000000L, "hq"), (9000000000000L, "crawl"))
      .toDF("doc_id", "source")
    val bigOut = CurationQueries.epochUpsample(big, rates).collect()
    assert(bigOut.nonEmpty)
  }

  test("q62 repetition ratios bounded and consistent") {
    val rep = run("q62_repetition").cache()
    assert(rep.filter(col("rep_ratio") > 1 || col("rep_ratio") <= 0).count() == 0)
    assert(rep.filter(col("distinct_ratio") > 1 || col("distinct_ratio") <= 0).count() == 0)
    assert(rep.filter(col("n_distinct") > col("n_tokens")).count() == 0)
    // all-same-token doc has rep_ratio 1; unique-token doc has distinct 1
    import spark.implicits._
    val edge = Seq((1L, "x x x x"), (2L, "a b c d")).toDF("doc_id", "text")
    val r = CurationQueriesSpec.repetitionOn(edge).collect()
      .map(x => x.getLong(0) -> (x.getDouble(3), x.getDouble(4))).toMap
    assert(r(1L) == ((1.0, 0.25)) && r(2L) == ((0.25, 1.0)))
    rep.unpersist()
  }
}

object CurationQueriesSpec {
  import org.apache.spark.sql.DataFrame
  /** q62's body applied to an arbitrary frame (edge-case harness). */
  def repetitionOn(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"), max("c").as("max_freq"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("max_freq") / col("n_tokens"), 6).as("rep_ratio"),
        round(col("n_distinct") / col("n_tokens"), 6).as("distinct_ratio"))
  }
}
