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

  /** Incremental exact dedup — the batch-over-batch production shape: a
    * 100 TB pipeline never re-deduplicates the whole corpus per ingest; it
    * carries a persisted SEEN-HASH store (8 bytes per distinct document,
    * the [[graft.fp.Fingerprint]] discipline applied to dedup) and
    * anti-joins each incoming shard against it. Shuffle volume is the
    * incoming shard + the 8-byte store keys — never historic text.
    *
    * `seen` must have a single `content_hash` column (as produced by
    * [[seenHashes]]). Rows of `incoming` whose content hash appears in
    * `seen` are dropped; within-shard duplicates are NOT collapsed here
    * (compose with [[dropExact]] first when the shard itself may repeat).
    * NULL content is never "seen" (SQL equality semantics: NULL ≠ NULL —
    * without the guard, xxhash64(NULL) is a seed constant and every
    * NULL-content row would alias every other); route null-content rows
    * through a quarantine/normalize step, not dedup. After a batch
    * commits, the new store is `seen ∪ seenHashes(survivors)` —
    * [[updateSeen]]. */
  def dropSeen(incoming: DataFrame, contentCol: String, seen: DataFrame): DataFrame =
    incoming.join(seen,
      col(contentCol).isNotNull &&
        xxhash64(col(contentCol)) === seen("content_hash"), "left_anti")

  /** The persisted-store projection: distinct 8-byte content hashes
    * (null content excluded — see [[dropSeen]]). */
  def seenHashes(df: DataFrame, contentCol: String): DataFrame =
    df.filter(col(contentCol).isNotNull)
      .select(xxhash64(col(contentCol)).as("content_hash")).distinct()

  /** Fold a committed batch's survivors into the seen store. */
  def updateSeen(seen: DataFrame, survivors: DataFrame, contentCol: String): DataFrame =
    seen.unionByName(seenHashes(survivors, contentCol)).distinct()

  /** Word n-gram shingles (default 3): slide over the token array.
    * Empty/short docs yield an empty array. Production path is the native
    * one-pass expression (bit-identical to [[wordShinglesHof]], the
    * builtin-HOF reference it is property-tested against). */
  def wordShingles(c: Column, n: Int = 3): Column =
    graft.functions.expressions.TextHashExpressions.wordShingles(c, n)

  /** Builtin-HOF reference formulation of [[wordShingles]] (spec oracle). */
  def wordShinglesHof(c: Column, n: Int = 3): Column = {
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
    // Signatures are the expensive pass (k×|shingles| hashes per doc) and
    // the plan reads them THREE times (banding + both sides of the scoring
    // join) — materialise once. ~260 B/doc (~0.5% of a text corpus), the
    // same signature relation a production pipeline would persist anyway.
    // The fused expression shingles+hashes in one pass (bit-identical to
    // minhashSignature(wordShingles(…)) — see TextHashExpressions).
    val sigs = df.select(
      col(idCol).as("id"),
      graft.functions.expressions.TextHashExpressions
        .minhashShingled(col(contentCol), shingleN, k).as("sig"))
      .localCheckpoint(true)
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

  /** Guard-truncation counters for [[minhashPairs]]'s `maxBucket` — the
    * "no silent caps" rule applied to the guard itself: ONE row of
    * (n_buckets, n_overflow_buckets, n_rows_dropped) quantifying the
    * candidate mass the cap removes, shipped next to a guarded run's
    * pair output so recall loss is measured, not assumed. Same fused
    * signature + [[bandKeys]] split as the miner. xxhash-derived, so the
    * external gate is the planted-degenerate-bucket spec (DedupSpec);
    * the portable-family counters (q111, [[simhashBandOverflow]]) carry
    * the bit-for-bit oracle. */
  def minhashBandOverflow(
      df: DataFrame, contentCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      maxBucket: Int = 500): DataFrame = {
    require(maxBucket > 0, "counters are about an ENABLED guard: maxBucket > 0")
    df.select(col(idCol).as("id"),
        graft.functions.expressions.TextHashExpressions
          .minhashShingled(col(contentCol), shingleN, k).as("sig"))
      .select(col("id"), explode(bandKeys(col("sig"), bands, k)).as("band"))
      .groupBy("band").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("c") > maxBucket, 1L).otherwise(0L)).as("n_overflow_buckets"),
        sum(when(col("c") > maxBucket, col("c")).otherwise(0L)).as("n_rows_dropped"))
  }

  /** LSH-accelerated near-duplicate pairs with EXACT shingle-Jaccard
    * verification — the production two-stage shape (candidates from
    * [[minhashPairs]] banding, then the exact intersect only on
    * candidates, never all pairs). Output: (id_a, id_b, n_common,
    * n_union, est_jaccard, jaccard) with exact `jaccard >= minJaccard`,
    * id_a < id_b. Empty-shingle docs (degenerate est=1.0 collisions)
    * are excluded by the `n_union > 0` guard. */
  def verifiedNearDupPairs(df: DataFrame, contentCol: String, idCol: String,
      minJaccard: Double, k: Int = 32, bands: Int = 8, shingleN: Int = 3,
      maxBucket: Int = 500): DataFrame = {
    val cands = minhashPairs(df, contentCol, idCol, k, bands, shingleN,
      threshold = 0.0, maxBucket = maxBucket)
    val sh = df.select(col(idCol).as("id"),
      array_distinct(wordShingles(col(contentCol), shingleN)).as("ts"))
    val inter = size(array_intersect(col("ts_a"), col("ts_b")))
    val uni = size(col("ts_a")) + size(col("ts_b")) - inter
    cands
      .join(sh.select(col("id").as("id_a"), col("ts").as("ts_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("ts").as("ts_b")), "id_b")
      .select(col("id_a"), col("id_b"), inter.as("n_common"), uni.as("n_union"),
        col("est_jaccard"))
      .filter(col("n_union") > 0)
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** CONTAINMENT near-dup pairs — the asymmetric duplication detector
    * symmetric Jaccard structurally misses: a short doc embedded verbatim
    * in a long one (quote farms, wrapper pages, header/footer laundering)
    * has |A∩B|/|A| = 1 while Jaccard |A∩B|/|A∪B| stays near |A|/|B| — so
    * MinHash banding tuned for Jaccard ≥ 0.8 never even CANDIDATES the
    * pair. Candidate generation is therefore a shingle-posting self-join
    * instead of banding: pairs sharing ≥ `minShared` distinct shingles
    * whose corpus df ≤ `maxDf`, then exact containment on the shared
    * counts. The df ceiling is the same stopword-class guard as BM25's
    * (`maxDfFrac`, q91): a shingle in d docs contributes d·(d−1)/2 pair
    * rows, so unbounded hot shingles are quadratic — with the ceiling the
    * join is O(maxDf · Σdf). A doc whose EVERY shingle exceeds the
    * ceiling is not findable by this path (boilerplate-only docs — the
    * documented guard tradeoff, mirrored textually in the gate oracle so
    * the emission is still exact).
    *
    * Emission per (id_a < id_b) pair reaching `minContainmentU`
    * micro-units on EITHER side: shared/size counts (both within the
    * ceiling-surviving vocabulary — never a mixed-vocabulary quotient)
    * and both directed containments — all integer arithmetic
    * (shingle-hash equality is the same 60-bit portable hash on both
    * engines, so a collision would fold identically in the oracle). */
  def containmentPairs(df: DataFrame, contentCol: String, idCol: String,
      minContainmentU: Long = 900000L, maxDf: Int = 100,
      minShared: Int = 2, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(array_distinct(wordShingles(col(contentCol), shingleN))).as("s"))
      .select(col("id"), portableHash(col("s")).as("h"))
    // df ceiling: one aggregate over the shingle vocabulary, joined back
    // on the 8-byte hash (broadcast-ineligible in general — the vocab is
    // corpus-sized — so this is a plain shuffle join on h). EVERYTHING
    // downstream — shared counts AND set sizes — lives in the ceiling-
    // surviving vocabulary, so the containment ratio is exact over the
    // rare-shingle sets (never a mixed-vocabulary quotient).
    // materialise once: the shingle+md5 explode feeds the df aggregate,
    // BOTH posting-join sides and the size aggregate — four reads of the
    // most expensive subtree (the minhashPairs signature discipline;
    // 16 bytes/row, the posting relation a production run would persist).
    // DISK_ONLY, serialized: this relation is ~|corpus shingles| ROWS
    // (unlike minhashPairs' one-sig-per-doc checkpoint) — the default
    // MEMORY_AND_DISK level holds it deserialized and OOM'd the x30
    // trend run; disk blocks cost one extra read and nothing else here
    // (the consumers are shuffle-bound, not scan-bound)
    val rare = sh.join(
      sh.groupBy("h").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDf).select("h"), "h")
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val sizes = rare.groupBy("id").agg(count(lit(1)).as("n"))
    val pairs = rare.select(col("h"), col("id").as("id_a"))
      .join(rare.select(col("h"), col("id").as("id_b")), "h")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("cont_a_u", expr("(n_shared * 1000000) div n_a"))
      .withColumn("cont_b_u", expr("(n_shared * 1000000) div n_b"))
      .filter(col("cont_a_u") >= minContainmentU ||
        col("cont_b_u") >= minContainmentU)
      .select("id_a", "id_b", "n_shared", "n_a", "n_b", "cont_a_u", "cont_b_u")
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

  /** All document pairs within `maxHamming` bits on a SimHash signature —
    * the web-crawl near-dup classic (Manku, Jarmin, Sarma, WWW 2007,
    * "Detecting Near-Duplicates for Web Crawling"), made EXACT by the
    * paper's §3 block-combination scheme: split the signature into
    * `nBlocks` = b > maxHamming blocks; a pair differing in ≤ maxHamming
    * bits touches at most maxHamming blocks, so it agrees on SOME
    * combination of b − maxHamming whole blocks (pigeonhole — 100% recall
    * BY CONSTRUCTION, not probabilistic like MinHash banding). Each doc
    * emits one packed key per C(b, b−h) combination; candidates come from
    * the equi-join on (combination_index, packed_key) and the exact
    * popcount filter cuts them back to precisely the ≤ maxHamming set.
    *
    * WHY b > h+1 matters at scale: the minimal b = h+1 (one block per key)
    * gives keys of only bits/(h+1) bits — 12 for the 48-bit signature —
    * so bucket size grows as N/2^12 and the within-bucket self-join as
    * N²/2^12: ~3×10¹⁰ candidate pairs PER BLOCK at 10⁹ docs. Wider b
    * trades more emitted rows (C(b, h) per doc) for exponentially wider
    * keys ((b−h)·bits/b bits). Defaults (h=3): b=6 → 20 combinations of
    * 24-bit keys (48-bit sigs) / 33-bit keys (64-bit sigs):
    *
    *   candidates/table ≈ N²/2^keyBits   (uniform-signature model)
    *     48-bit sigs, N=10⁶:  b=4: 2.4×10⁸/table ×4  vs b=6: 6×10⁷/table ×20
    *     48-bit sigs, N=10⁹:  b=4: 2.4×10¹⁴/table ×4 vs b=6: 6×10¹³/table ×20
    *     64-bit sigs, N=10⁹:  b=4: 6×10¹³/table ×4   vs b=6: 1.2×10¹⁰/table ×20
    *
    * Real corpora are not uniform (duplicate cliques concentrate), which
    * is what `maxBucket` is for — but the KEY WIDTH decides the baseline
    * the guard defends. For 10⁹+ docs with 64-bit signatures, b=8..10
    * (C(8,3)=56 tables of 40-bit keys) is the published operating point
    * (Manku et al. run b=6, h=3 over 8×10⁹ 64-bit signatures).
    *
    * Scale shape: only (id, sig, 2×8-byte combination key) rows shuffle —
    * C(b, h) of them per doc — and the exact check is `bit_count(xor)`
    * on the already-joined 8-byte signatures; the text never moves.
    * `maxBucket > 0` drops signature-degenerate buckets (e.g. thousands
    * of empty docs sharing key 0) at a DOCUMENTED recall cost — 0
    * (default) keeps the output exact, which is what the gate queries
    * verify against an all-pairs DuckDB recomputation.
    *
    * @param sigs    (id, sig) relation; null signatures never pair
    * @param bits    signature width (64 for [[simhash]], 48/60 for the
    *                portable family)
    * @param nBlocks b: 0 (default) picks maxHamming + 3, floored at the
    *                minimal legal b = maxHamming + 1 when bits is small;
    *                must satisfy maxHamming < b <= bits
    * @return (id_a, id_b, hamming) with id_a < id_b, hamming <= maxHamming
    */
  /** The block-combination banding geometry shared by the pair miner, the
    * guard-counter report, AND the DuckDB oracle generator (q111 derives
    * its SQL from this same plan, so the two sides cannot drift). */
  private[graft] final case class BandPlan(
      bits: Int, nBlocks: Int, width: Int, keep: Int, combos: Seq[Seq[Int]])

  private[graft] def bandPlan(bits: Int, maxHamming: Int,
      nBlocks: Int = 0): BandPlan = {
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming must be in [0, $bits), got $maxHamming")
    val nb =
      if (nBlocks > 0) nBlocks
      else if (maxHamming == 0) 1 // exact-equality join on the whole signature
      else math.min(maxHamming + 3, bits)
    require(nb > maxHamming && nb <= bits,
      s"nBlocks must be in (maxHamming, bits] = ($maxHamming, $bits], got $nb")
    val width = (bits + nb - 1) / nb
    BandPlan(bits, nb, width, nb - maxHamming,
      (0 until nb).combinations(nb - maxHamming).toSeq)
  }

  /** The (id, sig, blk, v) banded relation for a plan — one packed key per
    * block combination per doc. Null signatures yield null keys (they
    * never pair; [[simhashBandOverflow]] filters them out up front). */
  private def bandedKeys(sigs: DataFrame, plan: BandPlan): DataFrame = {
    val width = plan.width
    // block j = bits [j*width, min((j+1)*width, bits)) of the signature.
    // ceil-division can leave trailing blocks short (never empty for the
    // widths used here); short blocks only AGREE more often, so recall is
    // unaffected either way.
    def blockVal(j: Int): Column =
      shiftright(col("sig"), j * width)
        .bitwiseAND(lit((1L << math.min(width, 62)) - 1))
    // One packed key per combination of `keep` block indices: block values
    // concatenated at fixed offsets. If keep*width exceeds 63 (possible
    // for small maxHamming with wide signatures) the top block's high bits
    // shift out — that only MERGES keys, i.e. extra candidates for the
    // popcount filter; recall is unaffected (equal combinations always
    // pack equal).
    val comboKeys = plan.combos.zipWithIndex.map { case (blkIdxs, c) =>
      val packed = blkIdxs.zipWithIndex.map { case (j, pos) =>
        shiftleft(blockVal(j), pos * width)
      }.reduce(_.bitwiseOR(_))
      struct(lit(c).as("blk"), packed.as("v"))
    }
    sigs.select(col("id"), col("sig"),
        explode(array(comboKeys: _*)).as("b"))
      .select(col("id"), col("sig"), col("b.blk").as("blk"), col("b.v").as("v"))
  }

  /** Guard-TRUNCATION counters for [[simhashPairsOf]]'s `maxBucket` (the
    * "no silent caps" rule applied to the guard itself — round-7 task
    * #5): per combination table, how many buckets exist, how many exceed
    * the cap, and how many banded rows the guard would drop. Recall loss
    * from the cap stops being invisible: a run that enables the guard
    * ships these counters next to its pair output. Derived from the SAME
    * [[bandPlan]]/[[bandedKeys]] construction the miner uses, and (over
    * the portable signature family) DuckDB-recomputable bit-for-bit —
    * q111 gates it externally. One 16-byte-row aggregate, no pair join. */
  def simhashBandOverflow(
      sigs: DataFrame, bits: Int, maxHamming: Int = 3,
      maxBucket: Int = 1, nBlocks: Int = 0): DataFrame = {
    require(maxBucket > 0, "counters are about an ENABLED guard: maxBucket > 0")
    val plan = bandPlan(bits, maxHamming, nBlocks)
    bandedKeys(sigs.filter(col("sig").isNotNull), plan)
      .groupBy("blk", "v").agg(count(lit(1)).as("c"))
      .groupBy("blk")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("c") > maxBucket, 1L).otherwise(0L)).as("n_overflow_buckets"),
        sum(when(col("c") > maxBucket, col("c")).otherwise(0L)).as("n_rows_dropped"))
  }

  def simhashPairsOf(
      sigs: DataFrame, bits: Int, maxHamming: Int = 3,
      maxBucket: Int = 0, nBlocks: Int = 0): DataFrame = {
    val banded = bandedKeys(sigs, bandPlan(bits, maxHamming, nBlocks))
    val guarded =
      if (maxBucket <= 0) banded
      else {
        val sizes = banded.groupBy("blk", "v").count()
        banded.join(sizes, Seq("blk", "v"))
          .filter(col("count") <= maxBucket).drop("count")
      }
    val a = guarded.select(col("blk"), col("v"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = guarded.select(col("blk"), col("v"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("blk", "v")).filter(col("id_b") > col("id_a"))
      // a pair can agree on several blocks -> dedup before the popcount
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** [[simhashPairsOf]] over the production 64-bit xxhash SimHash.
    * Externally unverifiable (DuckDB has no xxhash64) — gate coverage is
    * the q96 60-bit portable run of the same banding machinery plus the
    * banded-vs-brute-force property spec over this exact path. */
  def simhashPairs(
      df: DataFrame, contentCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 0, nBlocks: Int = 0): DataFrame =
    simhashPairsOf(
      df.select(col(idCol).as("id"), simhash(col(contentCol)).as("sig")),
      bits = 64, maxHamming = maxHamming, maxBucket = maxBucket,
      nBlocks = nBlocks)

  /** [[simhashPairsOf]] over the oracle-portable 48-bit SimHash — the
    * externally verifiable form (q94): DuckDB recomputes the signatures
    * from raw text and the full all-pairs ≤ maxHamming ground truth. */
  def portableSimhashPairs(
      df: DataFrame, contentCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 0, nBlocks: Int = 0): DataFrame =
    simhashPairsOf(
      df.select(col(idCol).as("id"), portableSimhash(col(contentCol)).as("sig")),
      bits = PortableSimhashBits, maxHamming = maxHamming,
      maxBucket = maxBucket, nBlocks = nBlocks)

  /** [[simhashPairsOf]] over the FULL-width 60-bit portable SimHash (all
    * 60 md5-prefix bits instead of the 48-bit truncation) — q96: exercises
    * the banding machinery at a second signature width with uneven
    * block division (b=6 over 60 bits), still fully DuckDB-recomputable. */
  def portableSimhash60Pairs(
      df: DataFrame, contentCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 0, nBlocks: Int = 0): DataFrame =
    simhashPairsOf(
      df.select(col(idCol).as("id"),
        graft.functions.expressions.TextHashExpressions
          .portableSimhash(col(contentCol), 60).as("sig")),
      bits = 60, maxHamming = maxHamming,
      maxBucket = maxBucket, nBlocks = nBlocks)

  /** Exact token-set Jaccard for bounded candidate pairs: docs whose ids
    * are within `window` of each other (a stand-in candidate generator; in
    * production pairs come from [[minhashPairs]]).
    *
    * The candidate ids are generated EXPLICITLY (each doc emits its
    * `window` successor ids) so the pairing is a hash EQUI-join, not a
    * `id_b BETWEEN …` theta-join: a BroadcastNestedLoopJoin evaluates its
    * condition — including any pushed-down similarity predicate over the
    * token arrays — for all O(n²) id pairs, which is both a 100 TB
    * impossibility and a measured 150x slowdown at sf0.1 once a
    * `jaccard >= t` filter is pushed into it. Here the shuffle carries
    * `window` candidate rows per doc and the intersection runs only on
    * real candidates. */
  def tokenJaccardPairs(df: DataFrame, contentCol: String, idCol: String, window: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("id"),
      array_distinct(TextAnalysis.tokens(col(contentCol))).as("ts"))
    val cands = toks.select(col("id").as("id_a"), col("ts").as("ts_a"),
      explode(sequence(col("id") + 1, col("id") + window)).as("id_b"))
    cands.join(toks.select(col("id").as("id_b"), col("ts").as("ts_b")), Seq("id_b"))
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

  /** Oracle-portable 60-bit content hash: first 15 md5-hex chars as a long
    * (DuckDB mirror: graft.queries.PortableSql.hex15). ~2x the cost of
    * xxhash64, so the xxhash forms above stay the production default; this
    * variant exists so hash-emitting gate queries are externally
    * verifiable bit-for-bit. Deliberately the BUILTIN pipeline, not a
    * native expression: md5/conv/substring are all codegen'd, so this
    * stays inside whole-stage codegen with the canonicalization
    * projections feeding it — a CodegenFallback scalar here measured
    * SLOWER (it forces the whole projection interpreted). */
  def portableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private[graft] val PortableSimhashBits = 48
  private val PortableMasks =
    array((0 until PortableSimhashBits).map(i => lit(1L << i)): _*)

  /** Oracle-portable 48-bit SimHash: the same per-bit majority vote as
    * [[simhash]] but over [[portableHash]] token hashes (bits 0..47 of the
    * 60-bit value), so DuckDB reproduces it exactly
    * (graft.queries.PortableSql.simhashOracle). Production path is the
    * native expression (one md5 + 48 integer ops per token; the HOF form
    * below allocates a 48-slot array per token — measured 6.5s vs ~0.5s
    * per 5000-doc sf0.1 pass). */
  def portableSimhash(c: Column): Column =
    graft.functions.expressions.TextHashExpressions.portableSimhash48(c)

  /** Builtin-HOF reference formulation of [[portableSimhash]] (the
    * executable spec the native expression is bit-parity-tested against —
    * and the direct transliteration of the DuckDB oracle SQL). */
  def portableSimhashHof(c: Column): Column = {
    val toks = TextAnalysis.tokens(c)
    val hashes = transform(toks, t => portableHash(t))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0), PortableSimhashBits),
      (acc, h) => zip_with(acc, PortableMasks,
        (a, mask) => a + when(h.bitwiseAND(mask) =!= 0, 1).otherwise(0)))
    val n = size(toks)
    aggregate(
      zip_with(counts, PortableMasks,
        (cnt, mask) => when(cnt * 2 > n, mask).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** [[fingerprints]] in the oracle-portable hash family: content hash +
    * SimHash both md5-derived, DuckDB-mirrorable. */
  def portableFingerprints(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(col(idCol), portableHash(col(contentCol)).as("content_hash"),
      portableSimhash(col(contentCol)).as("simhash_p"))

  /** Rolling-hash chunk fingerprints (content-defined chunking — see
    * [[graft.functions.expressions.TextHashExpressions.RollingChunks]]):
    * per-doc array of chunk hashes whose boundaries survive edits
    * elsewhere in the document, the unit of partial-duplicate / delta
    * detection. Exploded + self-joined on the chunk hash it yields
    * shared-substring candidates the way band keys yield MinHash
    * candidates. */
  def chunkFingerprints(c: Column, avgChunkBytes: Int = 64): Column = {
    val bits = 63 - java.lang.Long.numberOfLeadingZeros(avgChunkBytes.toLong)
    graft.functions.expressions.TextHashExpressions
      .rollingChunks(c, maskBits = bits.toInt)
  }

  /** The chunk TEXTS for the same boundaries as [[chunkFingerprints]] —
    * the audit companion: reconstruction/bounds/hash-consistency contracts
    * over it are externally checkable (q69). */
  def chunkTexts(c: Column, avgChunkBytes: Int = 64): Column = {
    val bits = 63 - java.lang.Long.numberOfLeadingZeros(avgChunkBytes.toLong)
    graft.functions.expressions.TextHashExpressions
      .rollingChunkTexts(c, maskBits = bits.toInt)
  }

  /** Per-doc CDC-chunk sharing counts — the single implementation behind
    * the q80 catalog query and the pipeline's `dedup_chunks` step:
    * (idCol, n_chunks, n_shared) where n_shared counts the doc's chunks
    * that also occur in at least one OTHER doc (distinct-doc counting, so
    * within-doc repetition can't make a chunk look shared). Two
    * 8-byte-key shuffles: chunk-hash counts, then the join-back. */
  def chunkSharedCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chunks = df.select(col(idCol),
      explode(chunkFingerprints(col(textCol))).as("ch"))
    val shared = chunks.groupBy("ch")
      .agg(countDistinct(col(idCol)).as("n_docs"))
    chunks.join(shared, "ch")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
  }

  /** Fixed-width duplicate-SPAN statistics (Lee et al. 2022,
    * arXiv:2107.06499 — "Deduplicating Training Data Makes Language Models
    * Better"): slide a `w`-token window over each document (stride 1) and
    * count, per doc, how many windows also occur elsewhere. The suffix-
    * array substring dedup of the paper re-expressed relationally: every
    * duplicated substring of >= w tokens is covered by at least one
    * duplicated window, so window counts are the (conservative) span
    * signal. Complements [[chunkSharedCounts]]: CDC chunks are
    * content-defined and coarse (avg 64 bytes, gaps at chunk boundaries);
    * stride-1 windows are exact and boundary-free, at w× the explode
    * fan-out — the classic recall/cost trade, so both are first-class.
    *
    * Counters per doc:
    *  - `n_windows`     — total w-token windows (len - w + 1, 0 if short)
    *  - `n_dup_windows` — windows whose hash occurs >= 2 times CORPUS-WIDE
    *    (within-doc repetition counts: self-repetition is exactly what the
    *    repetition-filtering path wants to see)
    *  - `n_xdoc_windows`— windows shared with at least one OTHER doc
    *    (distinct-doc counting — the cross-doc contamination signal)
    *  - `dup_frac_u`    — floor(1e6 · n_dup_windows / n_windows)
    *
    * Scale shape: one explode pass (w-token strings die inside the
    * projection that hashes them — only 8-byte hashes reach the exchange),
    * then two aggregates and a join-back, all keyed on the 8-byte window
    * hash / doc id. Hash is the oracle-portable md5 family so the DuckDB
    * gate recomputes every counter bit-for-bit (q92). */
  def duplicateSpanStats(
      df: DataFrame, idCol: String, textCol: String, w: Int = 8): DataFrame = {
    val wins = df.select(col(idCol).as("doc_id"),
      explode(wordShingles(col(textCol), w)).as("win"))
      .select(col("doc_id"), portableHash(col("win")).as("h"))
      // semantically no-ops on a key-columned corpus (md5-derived hashes
      // are never null; rows without an id are excluded from the report by
      // contract, matching the oracle's WHERE) — stated HERE so the joins
      // below don't infer per-branch isnotnull filters, which would make
      // the two perDoc consumers' subtrees differ and defeat ReuseExchange
      // (the bigramStats trick; plan-guarded in PlanSpec)
      .filter(col("h").isNotNull && col("doc_id").isNotNull)
    val perDoc = wins.groupBy("doc_id", "h").agg(count(lit(1)).as("c"))
    val hstats = perDoc.groupBy("h")
      .agg(sum("c").as("n_occ"), count(lit(1)).as("n_docs"))
    // hstats is distinct-span-hash-sized — corpus-scale, but its
    // compile-time estimate descends from the pruned scan and invites a
    // broadcast build (the x30 OOM class). Both sides carry the corpus
    // scan, so the DemoteCorpusBroadcast rule strips broadcast
    // eligibility structurally (round-7; was a per-site merge hint) —
    // plan-guarded in PlanSpec/CatalogPlanSpec.
    val agg = perDoc.join(hstats, "h")
      .groupBy("doc_id")
      .agg(sum("c").as("n_windows"),
        sum(when(col("n_occ") >= 2, col("c")).otherwise(0L)).as("n_dup_windows"),
        sum(when(col("n_docs") >= 2, col("c")).otherwise(0L)).as("n_xdoc_windows"))
    // every id-carrying corpus row appears in the output; short/NULL-text
    // docs carry zeros (NULL-id rows are outside the report's contract —
    // stats are keyed by id, and the filter keeps both aggregate branches
    // plan-identical, see above)
    // BOTH sides are corpus-sized here, but the pruned 1-column doc_id
    // scan compile-time-estimates under the broadcast threshold and the
    // static planner then builds a corpus-wide broadcast hash table — the
    // x30 trend run OOM'd exactly there (driver heap shared with the
    // explode pass). The corpus↔corpus 1:1 join-back is a shuffle join by
    // construction via the DemoteCorpusBroadcast optimizer rule.
    df.select(col(idCol).as("doc_id")).filter(col("doc_id").isNotNull)
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_xdoc_windows"), lit(0L)).as("n_xdoc_windows"),
        when(coalesce(col("n_windows"), lit(0L)) > 0,
          floor(lit(1e6) * col("n_dup_windows") / col("n_windows")).cast("long"))
          .otherwise(lit(0L)).as("dup_frac_u"))
  }

  /** Duplicate-span REMOVAL — the transform half of [[duplicateSpanStats]]
    * (Lee et al. 2022 apply this to C4/RealNews and show models memorise
    * less and train faster): every token covered by a `w`-token window
    * whose hash occurs >= 2 times corpus-wide is cut, and the survivors are
    * rejoined with single spaces. The output text is therefore
    * whitespace-NORMALISED by construction (both engines rebuild from the
    * token stream, so the oracle matches bit-for-bit).
    *
    * Relational shape, one window-explode pass:
    *
    *  1. (doc, start, hash) per window; the set of DUPLICATED hashes comes
    *     from a `groupBy(hash).count >= 2` aggregate joined back to the
    *     window stream — NOT a count-over-`hash`-partition window function.
    *     The distinction is the whole scale story: this operator's target
    *     corpus concentrates 10⁴–10⁸ occurrences on single span hashes
    *     (Lee et al. 2022 report 60k+-fold spans in C4), and `WindowExec`
    *     BUFFERS every row of a partition in one task — a straggler/spill
    *     cliff on exactly the hot keys being removed. The aggregate shape
    *     absorbs hot keys map-side (partial_count), the surviving
    *     duplicated-hash relation is bounded by DISTINCT duplicated spans
    *     (not occurrences) so it broadcasts when small, and when it does
    *     shuffle the semi join streams (AQE skew-split applies to joins;
    *     it cannot split a window partition). Plan-guarded: no WindowExec
    *     in q93's executed plan (PlanSpec).
    *  2. duplicated starts expand to covered token positions
    *     (`sequence(start, start+w-1)`, deduped on (doc, pos))
    *  3. the token stream anti-joins covered positions and reassembles per
    *     doc (sort by position inside a single-doc group — group state is
    *     bounded by the doc itself)
    *
    * Returns every id-carrying row: (doc_id, clean_text, n_tokens,
    * n_tokens_removed, span_skipped); NULL text stays NULL with zero
    * counts.
    *
    * `maxDocTokens` makes the per-doc reassembly bound ENFORCED instead of
    * assumed (round-6 advisory #2): step 3 buffers one document's
    * surviving (pos, tok) structs in a single aggregation buffer — bounded
    * by the doc itself, but a pathological 100 MB single document would
    * materialise whole in one task's memory. Docs over the ceiling are
    * SKIPPED-AND-FLAGGED: their text passes through with only the
    * whitespace normalisation every output row gets (rebuilt from the
    * token stream map-side — no aggregation buffer), `n_tokens_removed` =
    * 0 and `span_skipped` = true. Their windows still count toward the
    * corpus-wide duplicated-hash relation, so OTHER docs' removal
    * decisions are unaffected by the skip.
    *
    * A doc whose every window is duplicated collapses to the empty string —
    * pair this with a min-length filter downstream, exactly as the paper
    * does. */
  def removeDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String, w: Int = 8,
      maxDocTokens: Int = DefaultMaxDocTokens): DataFrame = {
    val base = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val wins = base
      .select(col("doc_id"),
        posexplode(wordShingles(col("__text"), w)).as(Seq("start", "win")))
      .select(col("doc_id"), col("start"), portableHash(col("win")).as("h"))
    val dupHashes = wins.groupBy("h").agg(count(lit(1)).as("__n_occ"))
      .filter(col("__n_occ") >= 2)
      .select("h")
    // dupHashes and covered grow with the duplicated mass — the exact
    // corpora this operator targets — so neither may ever be a broadcast
    // build: the DemoteCorpusBroadcast rule strips eligibility from every
    // join here (both sides carry the corpus scan), replacing the
    // per-site merge hints of round 6
    val dupStarts = wins.join(dupHashes, Seq("h"), "left_semi")
      .select(col("doc_id"), col("start"))
    val covered = dupStarts
      .select(col("doc_id"),
        explode(sequence(col("start"), col("start") + lit(w - 1))).as("pos"))
      .distinct()
    val toks = base
      // the maxDocTokens guard: over-ceiling docs never reach the
      // per-doc reassembly buffer (NULL-text rows drop here too — they
      // re-enter via the left join below, exactly as before)
      .filter(size(TextAnalysis.tokens(col("__text"))) <= maxDocTokens)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("__text"))).as(Seq("pos", "tok")))
    val clean = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s("tok"))).as("clean_text"))
    // same corpus↔corpus join-back hazard as duplicateSpanStats (the
    // 1-column side's compile-time estimate invites a corpus-wide
    // broadcast build at scale) — demoted structurally by the rule.
    // __skip_text: for over-ceiling docs only, the whitespace-normalised
    // original — a MAP-SIDE single-row rebuild (when() evaluates lazily),
    // never an aggregation buffer
    val nt = size(TextAnalysis.tokens(col("__text")))
    base.select(col("doc_id"), nt.as("__n_tokens"),
        when(nt > maxDocTokens,
          concat_ws(" ", TextAnalysis.tokens(col("__text")))).as("__skip_text"))
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__n_tokens").isNull, lit(null).cast("string"))
          .when(col("__skip_text").isNotNull, col("__skip_text"))
          .otherwise(coalesce(col("clean_text"), lit(""))).as("clean_text"),
        coalesce(col("__n_tokens"), lit(0)).cast("long").as("n_tokens"),
        when(col("__skip_text").isNotNull, lit(0L))
          .otherwise(coalesce(col("__n_tokens"), lit(0)) -
            coalesce(col("__n_kept"), lit(0L))).cast("long").as("n_tokens_removed"),
        col("__skip_text").isNotNull.as("span_skipped"))
  }

  /** Default [[removeDuplicateSpans]] reassembly ceiling: 500k tokens
    * (~3 MB of text) — far above any legitimate training document, far
    * below what strains one task's aggregation buffer. */
  val DefaultMaxDocTokens = 500000

  /** Corpus-wide duplicated-LINE removal — CCNet's paragraph
    * deduplication (Wenzek et al. 2020, arXiv:1911.00359 §3.1: hash
    * every paragraph, drop repeats corpus-wide before LM filtering; web
    * boilerplate — nav bars, cookie banners, footers — is exactly
    * line-shaped). Every line keeps its GLOBALLY FIRST occurrence (min
    * (doc_id, position)) and loses the rest; survivors rejoin with
    * newlines in original order.
    *
    * Relational shape, the [[removeDuplicateSpans]] discipline:
    *
    *  1. one split+posexplode pass; only the 8-byte portable line hash
    *     and a PACKED (doc_id·2³² + pos) position key reach the
    *     exchange (the packed long makes "first occurrence" a plain
    *     min() — map-side partial aggregate, so a boilerplate line with
    *     10⁸ occurrences is absorbed like q93's hot span hash, never
    *     buffered in one task; no WindowExec);
    *  2. the keeper set joins back on the hash (corpus↔corpus —
    *     broadcast-demoted structurally);
    *  3. per-doc reassembly sorts the surviving (pos, line) structs
    *     inside a single-doc group — bounded by the doc itself.
    *
    * Returns every id-carrying row: (doc_id, clean_text, n_lines,
    * n_lines_removed); NULL text stays NULL with zero counts. Empty
    * lines participate like any other (a run of blank lines keeps only
    * the corpus-first one — compose with a normalize step when blank
    * structure matters). Requires doc_id ≥ 0 and < 2³¹ waves… precisely:
    * the packed key needs doc_id < 2³¹ and per-doc line count < 2³²
    * (any real corpus; ids beyond that should be densely re-keyed). */
  def removeDuplicateLines(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val lines = base
      .select(col("doc_id"),
        posexplode(split(col("__text"), "\n")).as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"),
        (col("doc_id") * lit(4294967296L) + col("pos")).as("__pk"),
        portableHash(col("line")).as("h"))
    val firsts = lines.groupBy("h").agg(min("__pk").as("__first"))
    val kept = lines.join(firsts, Seq("h"))
      .filter(col("__pk") === col("__first"))
      .select("doc_id", "pos")
    // re-attach line TEXT only for survivors (the join above moved only
    // 8-byte keys); recompute the split map-side — cheaper than carrying
    // every line string through both shuffles
    val keptLines = base
      .select(col("doc_id"),
        posexplode(split(col("__text"), "\n")).as(Seq("pos", "line")))
      .join(kept, Seq("doc_id", "pos"), "left_semi")
    val clean = keptLines.groupBy("doc_id")
      .agg(count(lit(1)).as("__n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s("line"))).as("clean_text"))
    base.select(col("doc_id"),
        size(split(col("__text"), "\n")).as("__n_lines"))
      .join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__n_lines").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("clean_text"), lit(""))).as("clean_text"),
        coalesce(col("__n_lines"), lit(0)).cast("long").as("n_lines"),
        (coalesce(col("__n_lines"), lit(0)) -
          coalesce(col("__n_kept"), lit(0L))).cast("long").as("n_lines_removed"))
  }

  /** Duplicate-cluster assignment: connected components over a near-dup
    * pair list — the transitive-closure step a dedup pipeline needs after
    * candidate scoring (a~b and b~c must collapse to ONE keeper even when
    * a~c was never scored).
    *
    * Two-phase contraction, the shape that survives 100 TB:
    *
    *  1. LOCAL union-find: edges are range-partitioned on src (near-dup
    *     candidates from id-windowed/LSH generators are id-local, so most
    *     of a chain lands in one task) and each task collapses its edge set
    *     with an in-memory union-find — arbitrarily long chains inside a
    *     partition contract to a single representative in ONE map pass,
    *     no per-hop rounds.
    *  2. The BOUNDARY graph — representatives glued by nodes seen in more
    *     than one partition — is orders of magnitude smaller than the
    *     input (≤ one node per partition-crossing). Under
    *     `driverEdgeCap` it is solved by driver union-find (same bounded-
    *     driver pattern as the reconciler's partition list) and broadcast
    *     back; above the cap it falls back to [[labelPropagate]], the
    *     distributed O(log diameter) pointer-jumping loop.
    *
    * Cluster ids are stable: every component is labelled by its minimum
    * node id (the keeper), whichever path computed it.
    *
    * @param edges (id_a, id_b) near-dup pairs, any orientation
    * @return (id, cluster_id) for every node appearing in `edges`
    */
  def duplicateClusters(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 25,
      driverEdgeCap: Long = 5000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    // Phase 1: per-partition union-find; emits (node, local representative).
    val local = e.repartitionByRange(col("src")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
        }
        val nodes = parent.keysIterator.toArray
        (nodes.iterator.map(n => (n, find(n))) ++
          // roots own themselves but never appear as LongMap keys
          nodes.iterator.map(find).distinct.map(r => (r, r))).distinct
      }.toDF("id", "rep")
    // Phase 2: a node with reps from several partitions glues them — star
    // edges (rep, minRep). perNode is reused for the final join:
    // localCheckpoint materialises it ONCE (and, unlike persist, two
    // invocations never alias each other's cache — keeps benchmarks honest).
    val perNode = local.groupBy("id")
      .agg(min("rep").as("rep"), collect_set("rep").as("reps"))
      .localCheckpoint(true)
    val boundary = perNode.select(explode(col("reps")).as("a"), col("rep").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val nBoundary = boundary.count()
    val repLabel: DataFrame =
      if (nBoundary == 0) spark.emptyDataset[(Long, Long)].toDF("rep", "cluster_id")
      else if (nBoundary <= driverEdgeCap) {
        // bounded driver union-find over the contracted graph
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        boundary.as[(Long, Long)].collect().foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        parent.keysIterator.toArray.map(n => (n, find(n))).toSeq
          .toDF("rep", "cluster_id")
      } else labelPropagate(boundary, "a", "b", maxIter)
        .withColumnsRenamed(Map("id" -> "rep", "label" -> "cluster_id"))
    val result = perNode.select(col("id"), col("rep"))
      .join(broadcastIfSmall(repLabel, nBoundary, driverEdgeCap), Seq("rep"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
    result
  }

  private def broadcastIfSmall(df: DataFrame, n: Long, cap: Long): DataFrame =
    if (n <= cap) broadcast(df) else df

  /** Distributed fallback for [[duplicateClusters]] phase 2: Pregel-style
    * min-label propagation with POINTER JUMPING (label <- label(label)
    * after each neighbourhood-min round), so convergence needs
    * O(log diameter) rounds, not O(diameter). Per round: shuffles carry
    * only (node, 8-byte label) pairs; `localCheckpoint` truncates the
    * lineage (the self-referencing plan otherwise quadruples per round and
    * kills the DRIVER at analysis time). Labels only decrease and always
    * name a node of the same component, so the fixpoint labels every node
    * with its component minimum.
    *
    * @return (id, label) for every node in `edges`
    */
  def labelPropagate(edges: DataFrame, idA: String, idB: String,
      maxIter: Int): DataFrame = {
    val fwd = edges.select(col(idA).as("src"), col(idB).as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (a) min over own + neighbourhood labels; materialised once so the
      // pointer-jump self-join below reads it instead of recomputing it.
      val nbrMin = und
        .join(labels.withColumnsRenamed(Map("id" -> "src", "label" -> "src_label")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_label")).as("nbr_label"))
        .join(labels.withColumnRenamed("label", "old"), Seq("id"), "right")
        .select(col("id"), col("old"),
          least(coalesce(col("nbr_label"), col("old")), col("old")).as("label"))
        .localCheckpoint(true)
      // (b) pointer jump + convergence flag in ONE materialised pass; the
      // `chg` check then scans the checkpointed result, no extra join.
      val next = nbrMin
        .join(nbrMin.select(col("id").as("label"), col("label").as("label2")),
          Seq("label"), "left")
        .select(col("id"), col("old"),
          coalesce(col("label2"), col("label")).as("label"))
        .select(col("id"), col("label"), (col("label") =!= col("old")).as("chg"))
        .localCheckpoint(true)
      val changed = next.filter(col("chg")).limit(1).count()
      labels = next.select("id", "label")
      converged = changed == 0
      iter += 1
    }
    und.unpersist()
    labels
  }
}
