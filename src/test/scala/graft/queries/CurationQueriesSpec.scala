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

  test("unimaxAlloc: exact water-filling across all three regimes") {
    import spark.implicits._
    val sizes = Seq(("s_small", 10L), ("s_mid", 100L), ("s_big", 1000L))
      .toDF("source", "n_tokens")
    def alloc(budget: Long) =
      CurationQueries.unimaxAlloc(sizes, budget, epochs = 2L)
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Boolean]("is_capped"), r.getAs[Long]("alloc_tokens"))).toMap
    // mixed regime: caps (20, 200, 2000), budget 300 → small caps at 20,
    // the other two split 280 evenly
    val mixed = alloc(300L)
    assert(mixed == Map("s_small" -> ((true, 20L)), "s_mid" -> ((false, 140L)),
      "s_big" -> ((false, 140L))))
    // integer remainder goes to the FIRST uncapped source in (cap, source)
    // order — deterministic, never a fractional token
    val rem = alloc(301L)
    assert(rem("s_mid") == ((false, 141L)) && rem("s_big") == ((false, 140L)))
    // uniform regime (tight budget): nobody caps, budget splits evenly
    val uniform = alloc(30L)
    assert(uniform.values.forall(!_._1) && uniform.values.map(_._2).sum == 30L)
    // leftover regime (huge budget): everyone caps at their epoch limit
    val leftover = alloc(1000000L)
    assert(leftover.values.forall(_._1) &&
      leftover.values.map(_._2).toSeq.sorted == Seq(20L, 200L, 2000L))
  }

  test("unimaxAlloc invariants: Σalloc = min(budget, Σcap), alloc ≤ cap, partitioning-independent") {
    import spark.implicits._
    val sizes = (0 until 37).map(i => (s"src$i", (i * 131 % 977 + 1).toLong))
      .toDF("source", "n_tokens")
    for (budget <- Seq(100L, 5000L, 20000L, 1000000L)) {
      val rows = CurationQueries.unimaxAlloc(sizes, budget, epochs = 3L)
        .select("source", "cap_tokens", "alloc_tokens").collect()
      val capSum = rows.map(_.getLong(1)).sum
      assert(rows.map(_.getLong(2)).sum == math.min(budget, capSum),
        s"budget $budget must be exactly exhausted (or every cap hit)")
      assert(rows.forall(r => r.getLong(2) <= r.getLong(1)),
        "no source may ever exceed its epoch cap")
      val re = CurationQueries.unimaxAlloc(sizes.repartition(7), budget, 3L)
        .select("source", "alloc_tokens").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.map(r => r.getString(0) -> r.getLong(2)).toMap == re,
        "allocation must not depend on input partitioning")
    }
  }

  test("snapshotDiff: accounting identities, null text/source handling") {
    import spark.implicits._
    val a = Seq((1L, "x", "t1"), (2L, "x", "t2"), (3L, "y", "t3"),
      (4L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val b = Seq((11L, "x", "t1"), (12L, "x", "t9"), (13L, "x", "t9"),
      (14L, null.asInstanceOf[String], ""))
      .toDF("doc_id", "source", "text")
    val d = CurationQueries.snapshotDiff(a, b).collect()
      .map(r => Option(r.getAs[String]("source")) ->
        (r.getAs[Long]("n_texts_a"), r.getAs[Long]("n_texts_b"),
          r.getAs[Long]("n_retained"), r.getAs[Long]("n_added"),
          r.getAs[Long]("n_removed"), r.getAs[Long]("n_docs_b"))).toMap
    // x: t1 retained, t2 removed, t9 added once (distinct-text counting)
    // but contributes 2 docs on the B side
    assert(d(Some("x")) == ((2L, 2L, 1L, 1L, 1L, 3L)))
    assert(d(Some("y")) == ((1L, 0L, 0L, 0L, 1L, 0L)))
    // the NULL-source stream exists, and null text == '' by construction
    assert(d(None) == ((1L, 1L, 1L, 0L, 0L, 1L)))
    // identities: texts_a = retained + removed, texts_b = retained + added
    d.values.foreach { case (ta, tb, r, ad, rm, _) =>
      assert(ta == r + rm && tb == r + ad)
    }
  }

  test("shardManifest: checksum order/partitioning-independent, flips on one changed text, assignment append-stable") {
    import spark.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"text body $i", "src"))
      .toDF("doc_id", "text", "source")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      CurationQueries.shardManifest(df, 16).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val base = manifest(docs)
    assert(base.values.map(_._1).sum == 200L)
    // partitioning/order independence: xor + counts commute
    assert(manifest(docs.repartition(13).sortWithinPartitions(col("text"))) == base)
    // tamper detection: one edited text flips exactly its shard's checksum
    val tampered = manifest(docs.withColumn("text",
      when(col("doc_id") === 77L, lit("tampered")).otherwise(col("text"))))
    val changed = base.keys.filter(k => base(k)._2 != tampered(k)._2).toSeq
    assert(changed.size == 1 && base(changed.head)._1 == tampered(changed.head)._1)
    // append stability: adding docs never moves an existing doc's shard
    // (per-doc hash); the old manifest is recoverable by re-running on
    // the old subset
    val appended = docs.union(Seq((1000L, "new doc", "src")).toDF(
      "doc_id", "text", "source"))
    assert(manifest(appended.filter(col("doc_id") < 1000L)) == base)
    // null-id docs drop; null text checksums as '' without error
    val weird = manifest(docs.union(Seq(
      (Option.empty[Long], Option("x"), "src"),
      (Option(2000L), Option.empty[String], "src"))
      .toDF("doc_id", "text", "source")))
    assert(weird.values.map(_._1).sum == 201L)
  }

  test("lengthQuantiles: exact smallest-value-reaching-ceil(p·n) semantics") {
    import spark.implicits._
    def text(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = ((1 to 100).map(n => ("uniform", text(n))) ++
      Seq(("pair", text(5)), ("pair", text(7)), ("one", text(42))))
      .toDF("source", "text")
    val q = CurationQueries.lengthQuantiles(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // 100 docs of lengths 1..100: p50 = 50 (cum 50 ≥ ceil(0.5·100)),
    // p90 = 90, p99 = 99, max = 100
    assert(q("uniform") == ((100L, 50L, 90L, 99L, 100L)))
    // two docs (5, 7): p50 = 5 (cum 1 ≥ ceil(1.0)), p90/p99 = 7
    assert(q("pair") == ((2L, 5L, 7L, 7L, 7L)))
    // a single doc is every quantile
    assert(q("one") == ((1L, 42L, 42L, 42L, 42L)))
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
