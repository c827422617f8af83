package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.TopKAggregate

/** BM25 ranked retrieval over the documents corpus (north-star extension;
  * keyword search is the retrieval counterpart of the embedding ANN in
  * [[graft.sim.Similarity]] — a training-data pipeline uses it for targeted
  * corpus probes, contamination triage, and boolean-ish filtering where no
  * embedding model is in the loop).
  *
  * Scale shape (the inverted-index plan, expressed relationally):
  *
  *  1. one explode pass over `text` builds the postings stream
  *     (doc_id, dl, tok), with the doc length computed MAP-SIDE as the
  *     token-array size — no corpus-wide doc-length aggregate or join
  *  2. the query relation is tiny by construction (a handful of terms) and
  *     is BROADCAST into that stream BEFORE any aggregation: the only rows
  *     that ever reach an exchange are the postings of the query terms
  *     themselves — the classic inverted-index access-path cost — never
  *     the full vocabulary
  *  3. document frequencies derive from the term-restricted tf relation
  *     (distinct doc–term pairs), ≤ |query terms| rows, broadcast back
  *  4. per-(query, doc) scores sum ≤ |query terms| values; the final top-k
  *     uses the k-bounded [[TopKAggregate]] partial aggregate, so the rank
  *     shuffle carries O(tasks × k) rows, independent of corpus size
  *
  * Cross-engine determinism: the standard BM25 idf is `ln((N-df+0.5)/
  * (df+0.5))`, but `ln` is a libm call with no cross-engine rounding
  * guarantee, while `+ - * /` and comparisons on doubles are IEEE-exact —
  * bit-identical wherever evaluated in the same order. The gate-portable
  * score therefore uses the raw Robertson–Spärck-Jones odds `(N-df+0.5)/
  * (df+0.5)` (the log's argument) as the idf factor, PER-TERM-quantised to
  * `floor(1e6·s)` before the (order-free, exact) integer sum across terms.
  * The DuckDB oracle spells the identical expression tree, so scores and
  * hence ranks match bit-for-bit. The log-idf variant ranks per-term hits
  * identically (log is monotone); it is kept as [[bm25LogIdf]] for callers
  * that want textbook weights and is spec-compared for per-term rank
  * agreement.
  */
object Retrieval {

  /** Per-term quantised BM25 partial score — see the object doc for why
    * the idf is the raw odds ratio and the result is a quantised long.
    * All inputs are exact integers in double space; every op is IEEE-exact
    * and ordered left-to-right, mirroring the oracle SQL text. */
  private def scoreU(
      tf: Column, df: Column, dl: Column, nDocs: Column, avgdl: Column,
      k1: Double, b: Double): Column = {
    val idf = (nDocs - df + lit(0.5)) / (df + lit(0.5))
    val num = tf * lit(k1 + 1)
    val den = tf + lit(k1) * (lit(1 - b) + lit(b) * dl / avgdl)
    floor(lit(1e6) * idf * num / den).cast("long")
  }

  /** Textbook BM25 per-term score (log idf, double) — NOT oracle-portable
    * (libm ln); spec'd against [[scoreU]] for per-term rank agreement. */
  def bm25LogIdf(
      tf: Column, df: Column, dl: Column, nDocs: Column, avgdl: Column,
      k1: Double = 1.2, b: Double = 0.75): Column = {
    val idf = log((nDocs - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    idf * (tf * lit(k1 + 1)) / (tf + lit(k1) * (lit(1 - b) + lit(b) * dl / avgdl))
  }

  /** Persisted inverted index: build once, probe many — the retrieval
    * analogue of [[graft.sim.Similarity.buildIvfIndex]]. At 100 TB the
    * postings explode is the dominant cost; amortising it across query
    * batches is the difference between a search index and a rescan.
    *
    * Layout under `path`:
    *  - `postings/` — (tok, doc_id, dl, tf) PARTITIONED BY `bucket` =
    *    pmod(xxhash64(tok), buckets), so a probe prunes to its terms'
    *    bucket directories before reading a byte (same partition-pruning
    *    play as the IVF index's centroid directories)
    *  - `df/` — per-term document frequencies (vocabulary-sized)
    *  - `stats/` — one row: corpus size + average doc length
    */
  def buildBm25Index(
      docs: DataFrame, textCol: String, idCol: String, path: String,
      buckets: Int = 64): Unit = {
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).as("dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val postings = toks.groupBy("doc_id", "tok", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(buckets)))
    // cluster rows by bucket before the partitioned write: without this
    // every shuffle task writes a sliver into every bucket directory
    // (tasks × buckets small files — measured 2.5x the build cost at
    // sf0.1; at cluster scale it is also the metadata bomb)
    postings.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings")
    // df from the postings just WRITTEN (not the lazy plan — same
    // build-once rationale as buildIvfIndex's centroid re-read)
    val spark = docs.sparkSession
    spark.read.parquet(s"$path/postings")
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/df")
    docs.agg(count(lit(1)).as("n_docs")).crossJoin(
        docs.filter(col(textCol).isNotNull)
          .select(size(TextAnalysis.tokens(col(textCol))).as("dl"))
          .agg((sum("dl").cast("double") / count(lit(1))).as("avgdl")))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Probe a persisted BM25 index: bit-identical to [[bm25TopK]] on the
    * same corpus (spec'd, and q95 routes the q91 gate query through the
    * index against the SAME oracle SQL). The query terms are collected
    * driver-side to build LITERAL bucket/term filters — bounded by the
    * query's own size (a handful of terms, never corpus data), and the
    * literal predicate is what lets Spark prune non-probed bucket
    * directories at the scan. */
  def queryBm25Index(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: DataFrame, k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75, buckets: Int = 64,
      maxDfFrac: Double = 1.0): DataFrame = {
    // distinct: a duplicated (query_id, term) row would otherwise duplicate
    // scored rows (doubling score_u/n_hit_terms) and break the documented
    // bit-equality with bm25TopK — which dedups the same way
    val q = queryTerms.select(col("query_id"), col("term")).distinct()
    // bounded driver collect: |terms| rows by construction (the query
    // itself, never corpus data)
    val allTerms = q.select("term").distinct().collect().map(_.getString(0)).toSeq
    require(allTerms.nonEmpty, "queryTerms is empty")
    // df-ceiling (stopword guard): the persisted df/ relation makes the
    // ceiling enforceable BEFORE the postings scan — a stopword-like term
    // ("the") has postings ≈ the whole corpus, and without the guard one
    // hot term degrades the index probe to a corpus-sized read. Dropping a
    // term is only APPROXIMATELY rank-safe: its near-zero odds-idf still
    // contributes to score_u and n_hit_terms (default 1.0 = off, which is
    // what the bit-exact gate queries use). Dropped terms are named on
    // stderr. The df probe itself is footer-pruned to |terms| rows.
    val terms =
      if (maxDfFrac >= 1.0) allTerms
      else {
        val nDocs = spark.read.parquet(s"$path/stats")
          .select("n_docs").head().getLong(0)
        val dfMap = spark.read.parquet(s"$path/df")
          .filter(col("tok").isin(allTerms: _*))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val (hot, kept) = allTerms.partition(t =>
          dfMap.getOrElse(t, 0L) > maxDfFrac * nDocs)
        if (hot.nonEmpty) System.err.println(
          s"[bm25] dropping ${hot.size} term(s) over df ceiling " +
            s"($maxDfFrac of $nDocs docs): ${hot.mkString(", ")}")
        kept
      }
    if (terms.isEmpty) // keep query_id's own type; everything else is fixed
      return q.select(col("query_id")).limit(0)
        .withColumn("doc_id", lit(null).cast("long"))
        .withColumn("rank", lit(null).cast("int"))
        .withColumn("score_u", lit(null).cast("long"))
        .withColumn("n_hit_terms", lit(null).cast("long"))
    // bucket predicate from FOLDABLE expressions — pmod(xxhash64(lit(t)))
    // constant-folds to the same literal the writer computed, so Catalyst
    // prunes non-probed bucket directories at the scan (plan-guarded).
    // Partition values round-trip as STRINGS (type inference is off
    // session-wide), so the comparison is string = string — a cast on the
    // partition column would defeat pruning. The exact term filter then
    // lands on the parquet footer.
    val bucketPred = terms
      .map(t => col("bucket") === pmod(xxhash64(lit(t)), lit(buckets)).cast("string"))
      .reduce(_ || _)
    val postings = spark.read.parquet(s"$path/postings")
      .filter(bucketPred && col("tok").isin(terms: _*))
    val tf = postings.join(broadcast(q), postings("tok") === q("term"))
      .select(col("query_id"), col("doc_id"), col("tok"), col("dl"), col("tf"))
    val dfq = broadcast(spark.read.parquet(s"$path/df")
      .filter(col("tok").isin(terms: _*)))
    val stats = broadcast(spark.read.parquet(s"$path/stats"))
    val scored = tf.join(dfq, "tok").crossJoin(stats)
      .select(col("query_id"), col("doc_id"),
        scoreU(col("tf"), col("df"), col("dl"), col("n_docs"), col("avgdl"),
          k1, b).as("s"))
    val agg = scored.groupBy("query_id", "doc_id")
      .agg(sum("s").as("score_u"), count(lit(1)).as("n_hit_terms"))
    rankTopK(agg, k)
  }

  /** Top-`k` documents per query by quantised-BM25 score.
    *
    * @param docs       corpus with `idCol` and `textCol`
    * @param queryTerms (query_id, term) relation — small, broadcast
    * @return (query_id, doc_id, rank, score_u, n_hit_terms), rank 1..k by
    *         score DESC then doc_id ASC
    */
  def bm25TopK(
      docs: DataFrame, queryTerms: DataFrame, textCol: String, idCol: String,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Double = 1.0): DataFrame = {
    // distinct: a duplicated (query_id, term) row would inflate that term's
    // tf (explode-join counts each copy), a NONLINEAR score change — and
    // would break bit-equality with the index probe. Dedup at the contract
    // boundary so both paths agree for any input relation.
    val q = queryTerms.select(col("query_id"), col("term")).distinct()
    // doc length rides along MAP-SIDE (size of the token array) — never a
    // corpus-wide (doc, tok) aggregate or a doc-length join: the only rows
    // that ever shuffle are the postings of the query terms themselves
    // (the inverted-index access-path cost), everything else is broadcast
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).as("dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val matched = toks.join(broadcast(q), toks("tok") === q("term"))
    // tf per (query, doc, term); dl is functional on doc_id so grouping by
    // it adds no cardinality
    val tf = matched.groupBy("query_id", "doc_id", "tok", "dl")
      .agg(count(lit(1)).as("tf"))
    // df over ALL docs containing the term, derived from the already
    // term-restricted postings (distinct collapses multi-query terms);
    // <= |terms| rows -> broadcast
    val dfq = tf.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    // corpus stats as a 1-row broadcast relation (no driver-side action):
    // N counts every corpus row; avgdl averages over docs that tokenize —
    // one column-pruned pass, map-side partial aggregate
    val stats = docs.agg(count(lit(1)).as("n_docs")).crossJoin(
      docs.filter(col(textCol).isNotNull)
        .select(size(TextAnalysis.tokens(col(textCol))).as("dl"))
        .agg((sum("dl").cast("double") / count(lit(1))).as("avgdl")))
    // df-ceiling in the DIRECT path bounds the score aggregate, not the
    // scan (df is only known after the term-restricted postings exist —
    // the I/O-pruning form of this guard lives in [[queryBm25Index]],
    // where the persisted df/ relation is consultable BEFORE the scan).
    // Same approximate-rank-safety caveat; default 1.0 = off.
    val limited =
      if (maxDfFrac >= 1.0) tf.join(broadcast(dfq), "tok")
      else tf.join(broadcast(dfq), "tok").crossJoin(broadcast(stats.select(
          col("n_docs").as("__n"))))
        .filter(col("df") <= lit(maxDfFrac) * col("__n")).drop("__n")
    val scored = limited
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        scoreU(col("tf"), col("df"), col("dl"), col("n_docs"), col("avgdl"),
          k1, b).as("s"))
    val agg = scored.groupBy("query_id", "doc_id")
      .agg(sum("s").as("score_u"), count(lit(1)).as("n_hit_terms"))
    rankTopK(agg, k)
  }

  /** k-bounded rank over (query_id, doc_id, score_u, n_hit_terms). The
    * sort key is the quantised LONG itself — never a double: a df=1 term's
    * quantised odds-idf is ~2.2e6·N, which crosses 2^53 near N≈4e9 docs
    * (inside the 100 TB envelope), where a double key would collapse
    * distinct scores and tie-break by doc_id differently than an
    * integer-ordered oracle. [[TopKAggregate]] compares a leading long
    * score with Long.compare, so ranking stays exact at any corpus size. */
  private def rankTopK(agg: DataFrame, k: Int): DataFrame =
    agg.groupBy("query_id")
      .agg(TopKAggregate.topK(
        struct(col("score_u"), col("doc_id"), col("n_hit_terms")), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.doc_id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("hit.score_u").as("score_u"), col("hit.n_hit_terms").as("n_hit_terms"))
}
