package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Deduplication operators for training-data pipelines (north-star
  * extension). Four families:
  *
  *  - exact: hash-groupBy — one shuffle on the content key
  *  - MinHash + LSH: shingle → k minhashes → bands → bucket self-join.
  *    The candidate join is on (band, bandHash), so at 100 TB the shuffle
  *    moves only (docId, 2×8 bytes)×bands per doc, never the text.
  *  - SimHash: 64-bit near-dup signature, bucketable by prefix
  *  - n-gram/token Jaccard: exact verification for candidate pairs
  *
  * MinHash per-doc signatures are computed with aggregate/zip_with HOFs —
  * no explode, no extra shuffle: per row cost is k×|shingles| xxhash64
  * calls inside whole-stage codegen.
  */
object Dedup {

  /** Exact dedup: deterministic keeper per duplicate group (min id), with
    * group size. One hash-shuffle on the (hashed) content. */
  def exactGroups(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup keeping one row per content value (scale form: group on
    * xxhash64(content) so the shuffle key is 8 bytes, not the document). */
  def dropExact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val keepers = df
      .groupBy(xxhash64(col(contentCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__h")
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** Word n-gram shingles (default 3): slide over the token array.
    * Empty/short docs yield an empty array. */
  def wordShingles(c: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(c)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array())
  }

  /** k per-document minhashes: for seed i, min over shingles of
    * xxhash64(i, shingle). Production path is the native Catalyst
    * expression (~10x the HOF throughput, bit-identical — see
    * [[graft.functions.expressions.TextHashExpressions]]). */
  def minhashSignature(shingles: Column, k: Int = 32): Column =
    graft.functions.expressions.TextHashExpressions.minhashSignature(shingles, k)

  /** Builtin-HOF reference formulation of [[minhashSignature]] (kept as the
    * executable spec the expression is property-tested against). */
  def minhashSignatureHof(shingles: Column, k: Int = 32): Column =
    aggregate(
      shingles,
      array_repeat(lit(Long.MaxValue), k),
      (acc, s) => zip_with(acc,
        transform(sequence(lit(0), lit(k - 1)), i => xxhash64(i, s)),
        (a, h) => least(a, h)))

  /** LSH band keys: split the signature into `bands` rows-per-band groups
    * and hash each; docs sharing any band key are candidates. */
  def bandKeys(sig: Column, bands: Int = 8, k: Int = 32): Column = {
    val rows = k / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",", slice(sig, b * rows + 1, lit(rows)))))
  }

  /** Estimated Jaccard from two signatures: fraction of equal minhashes. */
  def estJaccard(sigA: Column, sigB: Column, k: Int = 32): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") / k

  /** MinHash-LSH candidate duplicate pairs with estimated Jaccard >=
    * threshold. Shuffles only (bandKey, docId, signature); the self-join is
    * on the 8-byte band hash. Output: (id_a, id_b, est_jaccard), id_a<id_b.
    *
    * Candidate pairs are deduplicated BEFORE scoring (a pair sharing b
    * bands would otherwise be scored b times). `maxBucket` > 0 drops bands
    * whose bucket exceeds it — the standard spam-cluster guard: a bucket of
    * B near-identical docs contributes B²/2 pairs, and at corpus scale one
    * boilerplate cluster can dominate the whole join (see SCALING.md §5).
    * ON BY DEFAULT (500); pass 0 to disable. The overflow-band set is found
    * with a map-side-combined groupBy (16-byte rows) and removed with an
    * anti-join — the set is tiny by construction, so AQE broadcasts it
    * (cheaper than the full-sort window shuffle this replaces).
    */
  def minhashPairs(
      df: DataFrame, contentCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 500): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"),
      minhashSignature(wordShingles(col(contentCol), shingleN), k).as("sig"))
    // candidate generation joins bare (band, id) pairs — 16 bytes/row
    // through the shuffle; signatures are attached only for the scoring
    // pass over UNIQUE pairs (AQE broadcasts the signature table when small)
    val banded0 = sigs.select(col("id"),
      explode(bandKeys(col("sig"), bands, k)).as("band"))
    val banded =
      if (maxBucket <= 0) banded0
      else {
        val overflow = banded0.groupBy("band").count()
          .filter(col("count") > maxBucket).select("band")
        banded0.join(overflow, Seq("band"), "left_anti")
      }
    val a = banded.select(col("band"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("id").as("id_b"))
    val cands = a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // dedupe pairs across bands before the scoring pass
    cands
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        estJaccard(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Bit masks 2^0..2^63 as an array literal (2^63 wraps negative — AND
    * still tests the sign bit correctly). */
  private val BitMasks = array((0 until 64).map(i => lit(1L << i)): _*)

  /** 64-bit SimHash over tokens: bit i of the result is 1 iff the majority
    * of token-hashes have bit i set. Production path is the native
    * Catalyst expression (bit-identical to [[simhashHof]]). */
  def simhash(c: Column): Column =
    graft.functions.expressions.TextHashExpressions.simhash64(c)

  /** Builtin-HOF reference formulation of [[simhash]]. */
  def simhashHof(c: Column): Column = {
    val toks = TextAnalysis.tokens(c)
    // counts[i] = number of tokens with bit i set, via aggregate over tokens
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(acc, BitMasks,
          (a, mask) => a + when(xxhash64(t).bitwiseAND(mask) =!= 0, 1).otherwise(0)))
    val n = size(toks)
    // assemble: OR of 2^i where counts[i]*2 > n
    aggregate(
      zip_with(counts, BitMasks,
        (cnt, mask) => when(cnt * 2 > n, mask).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Exact token-set Jaccard for bounded candidate pairs: join docs whose
    * ids are within `window` of each other (a stand-in candidate generator;
    * in production pairs come from [[minhashPairs]]). */
  def tokenJaccardPairs(df: DataFrame, contentCol: String, idCol: String, window: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(col(contentCol))).as("ts"))
    val a = toks.select(col("id").as("id_a"), col("ts").as("ts_a"))
    val b = toks.select(col("id").as("id_b"), col("ts").as("ts_b"))
    a.join(b, col("id_b") > col("id_a") && col("id_b") <= col("id_a") + window)
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("ts_a"), col("ts_b"))).as("n_common"),
        (size(col("ts_a")) + size(col("ts_b")) - size(array_intersect(col("ts_a"), col("ts_b")))).as("n_union"))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
  }

  /** Document fingerprint: stable 64-bit content hash (exact-dup key) plus
    * the near-dup SimHash, one pass. */
  def fingerprints(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(col(idCol), xxhash64(col(contentCol)).as("content_hash"),
      simhash(col(contentCol)).as("simhash"))
}
