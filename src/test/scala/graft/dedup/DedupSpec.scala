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

  test("incremental dedup: seen content dropped across batches, store folds forward") {
    // batch 1 = the corpus; batch 2 = two exact copies of batch-1 docs plus
    // one genuinely new doc
    val seen = Dedup.seenHashes(docs, "text")
    val batch2 = docs.filter(col("doc_id") < 2)
      .withColumn("doc_id", col("doc_id") + 300000)
      .unionByName(docs.filter(col("doc_id") === 5)
        .withColumn("doc_id", lit(300005L))
        .withColumn("text", concat(col("text"), lit(" genuinely-new-suffix"))))
    val survivors = Dedup.dropSeen(batch2, "text", seen)
    assert(survivors.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(300005L))
    // store update: survivors' hashes join the store; replaying batch 2
    // against the UPDATED store drops everything
    val seen2 = Dedup.updateSeen(seen, survivors, "text")
    assert(seen2.count() == seen.count() + 1)
    assert(Dedup.dropSeen(batch2, "text", seen2).count() == 0)
    // NULL content is never "seen" (SQL equality semantics): a null-text
    // row survives even when the seen batch also contained a null text
    val nullRow = docs.limit(1)
      .withColumn("doc_id", lit(400000L))
      .withColumn("text", lit(null).cast("string"))
    val seenWithNull = Dedup.seenHashes(
      docs.unionByName(nullRow.withColumn("doc_id", lit(400001L))), "text")
    assert(Dedup.dropSeen(nullRow, "text", seenWithNull)
      .collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(400000L))
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

  test("verifiedNearDupPairs: exact copy verified at jaccard 1.0; short docs never pair") {
    import spark.implicits._
    val pairs = Dedup.verifiedNearDupPairs(withDups, "text", "doc_id", minJaccard = 0.9)
      .collect()
    // the planted exact copy (0, 200000) must be recovered with exact J=1
    val exactPair = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 200000L)
    assert(exactPair.isDefined, s"exact copy not recovered: ${pairs.mkString(";")}")
    assert(exactPair.get.getAs[Double]("jaccard") == 1.0)
    // every emitted pair carries a verified exact score >= the floor
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.9))

    // docs with < 3 tokens have EMPTY shingle sets → identical all-MaxValue
    // minhash signatures → est_jaccard 1.0 candidates; the n_union > 0
    // guard must keep these degenerate pairs out
    val tiny = Seq((1L, "one two"), (2L, "three four"), (3L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val tinyPairs = Dedup.verifiedNearDupPairs(tiny, "text", "doc_id", 0.0).collect()
    assert(tinyPairs.isEmpty, s"degenerate empty-shingle pair emitted: ${tinyPairs.mkString(";")}")
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

  test("duplicateClusters: transitive closure to min-id keeper, converges on chains") {
    // components: {1,2,3} via a-b,b-c; {10,11}; {20,21,22} with a cycle;
    // {30..34} a 5-node chain (forces several propagation rounds)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L),
      (31L, 30L), (31L, 32L), (32L, 33L), (33L, 34L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L))
  }

  test("cluster keeper: best quality wins, quality tie falls to min id (q106 shape)") {
    // the q106 keeper expression: max(struct(quality, -id)) per cluster
    val scored = Seq(
      (1L, 1L, 0.3), (2L, 1L, 0.9), (3L, 1L, 0.9), // tie at 0.9 -> id 2
      (10L, 10L, 0.5), (11L, 10L, 0.2))            // plain max -> id 10
      .toDF("id", "cluster_id", "quality")
    val keepers = scored.groupBy("cluster_id")
      .agg(max(struct(col("quality"), (-col("id")).as("nid"))).as("best"))
      .select(col("cluster_id"), (-col("best.nid")).as("keeper_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers == Map(1L -> 2L, 10L -> 10L))
  }

  test("duplicateClusters: cross-partition chain glues via boundary graph") {
    // a 200-node chain forced across many range partitions: phase-1 local
    // union-find sees only fragments, the boundary graph must reconnect them
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      .repartition(16)
    val got = Dedup.duplicateClusters(edges).collect()
    assert(got.length == 200)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("duplicateClusters: distributed labelPropagate fallback matches driver path") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L), (31L, 30L), (31L, 32L), (32L, 33L))
      .toDF("id_a", "id_b")
    val viaDriver = Dedup.duplicateClusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = Dedup.duplicateClusters(edges, driverEdgeCap = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(33L) == 30L && viaDriver(3L) == 1L && viaDriver(11L) == 10L)
  }

  test("duplicateClusters property: ER/path/star graphs match driver union-find, cap forced to the distributed path") {
    // reference labelling: min node id per component, computed by a plain
    // driver union-find the test owns (independent of the production code)
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    def check(edges: Seq[(Long, Long)], name: String): Unit = {
      val want = unionFind(edges.filter(e => e._1 != e._2))
      val df = edges.toDF("id_a", "id_b")
      // driverEdgeCap=0 forces the labelPropagate (pointer-jumping) path
      // for phase 2 — the VERDICT-prescribed cap-exceeded exercise
      for (cap <- Seq(0L, 5000000L)) {
        val got = Dedup.duplicateClusters(df, driverEdgeCap = cap).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"$name (cap=$cap): clusters diverge from union-find")
      }
    }
    val rnd = new scala.util.Random(7)
    // Erdős–Rényi G(150, 0.015): many small components, some mid-sized,
    // plus reversed duplicates and self-loops to exercise normalisation
    val er = (for {
      a <- 0L until 150L; b <- (a + 1) until 150L
      if rnd.nextDouble() < 0.015
    } yield (a, b)) ++ Seq((3L, 3L), (10L, 5L), (5L, 10L))
    check(er, "erdos-renyi")
    // 120-node path: worst diameter; pointer jumping must converge in
    // O(log d) rounds within the default maxIter
    check((0L until 119L).map(i => (i, i + 1)), "path")
    // star: max-degree hub labelled by the min leaf's component min (0)
    check((1L to 80L).map(i => (0L, i)), "star")
    // two cliques bridged by one edge
    val cliques = (for { a <- 0L to 9L; b <- (a + 1) to 9L } yield (a, b)) ++
      (for { a <- 100L to 109L; b <- (a + 1) to 109L } yield (a, b)) :+ ((9L, 100L))
    check(cliques, "bridged-cliques")
  }

  test("chunk overlap: planted shared paragraph raises shared_ratio, unique docs stay 0") {
    // two long synthetic docs sharing one long paragraph, one unrelated doc
    val para = (1 to 60).map(i => s"shared$i").mkString(" ")
    val d = Seq(
      (1L, s"${(1 to 60).map(i => s"alpha$i").mkString(" ")} $para"),
      (2L, s"$para ${(1 to 60).map(i => s"beta$i").mkString(" ")}"),
      (3L, (1 to 120).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "text")
    val ratios = Dedup.chunkSharedCounts(d, "doc_id", "text")
      .select(col("doc_id"), (col("n_shared") / col("n_chunks")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ratios(1L) > 0.2, s"doc 1 shared_ratio ${ratios(1L)}")
    assert(ratios(2L) > 0.2, s"doc 2 shared_ratio ${ratios(2L)}")
    assert(ratios(3L) == 0.0, s"doc 3 shared_ratio ${ratios(3L)}")
  }

  test("duplicate spans: cross-doc shared span vs within-doc repetition vs short docs") {
    val span = (1 to 12).map(i => s"s$i").mkString(" ") // 12 tokens -> 5 dup windows at w=8
    val d = Seq(
      (1L, s"${(1 to 20).map(i => s"a$i").mkString(" ")} $span"),
      (2L, s"$span ${(1 to 20).map(i => s"b$i").mkString(" ")}"),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")), // all unique
      (4L, ("rep rep rep rep " * 5).trim), // within-doc repetition only
      (5L, "too few tokens") // < w -> zero windows
    ).toDF("doc_id", "text")
    val rows = Dedup.duplicateSpanStats(d, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // docs 1 and 2: the 12-token planted span yields exactly 5 shared windows
    assert(rows(1L)._3 == 5, s"doc1 xdoc ${rows(1L)}")
    assert(rows(2L)._3 == 5, s"doc2 xdoc ${rows(2L)}")
    assert(rows(1L)._1 == 25) // 32 tokens -> 25 windows
    // unique doc: nothing duplicated anywhere
    assert(rows(3L) == ((23L, 0L, 0L, 0L)))
    // within-doc repetition: all 13 windows ("rep"×8) collide with each
    // other (n_dup) but appear in no other doc (n_xdoc = 0)
    assert(rows(4L)._1 == 13 && rows(4L)._2 == 13 && rows(4L)._3 == 0, s"doc4 ${rows(4L)}")
    assert(rows(4L)._4 == 1000000L) // dup_frac_u saturates at 1e6
    // short doc present with zeros
    assert(rows(5L) == ((0L, 0L, 0L, 0L)))
  }

  test("duplicate spans: sf0.001 planted near-dups light up n_xdoc_windows") {
    val stats = Dedup.duplicateSpanStats(docs, "doc_id", "text", w = 8)
    assert(stats.count() == docs.count()) // every corpus row present
    val contaminated = stats.filter(col("n_xdoc_windows") > 0).count()
    assert(contaminated >= 2, s"expected planted near-dup docs to share spans, got $contaminated")
    // counters are consistent: dups >= xdocs, windows >= dups
    assert(stats.filter(col("n_dup_windows") < col("n_xdoc_windows")).count() == 0)
    assert(stats.filter(col("n_windows") < col("n_dup_windows")).count() == 0)
  }

  test("simhashPairs: banded output equals brute-force hamming <= k (pigeonhole exactness)") {
    // signatures engineered so flipped bits spread across DIFFERENT blocks
    // (worst case for banding): pairs differing in <= 3 bits MUST be found
    // even when the flips hit 3 distinct blocks; a 4-spread-bit pair must
    // not survive the popcount filter
    val s0 = 0x0000FFFFFFFFL
    val sigs = Seq(
      1L -> s0,
      2L -> (s0 ^ (1L << 0)),                                // 1 bit, block 0
      3L -> (s0 ^ (1L << 0) ^ (1L << 12) ^ (1L << 24)),      // 3 bits, 3 blocks
      4L -> (s0 ^ (1L << 0) ^ (1L << 12) ^ (1L << 24) ^ (1L << 36)), // 4 bits, 4 blocks
      5L -> 0x123456789ABCL                                  // far away
    ).toDF("id", "sig")
    val got = Dedup.simhashPairsOf(sigs, bits = 48, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same signatures
    val all = Seq(1L -> s0, 2L -> (s0 ^ 1L), 3L -> (s0 ^ 1L ^ (1L << 12) ^ (1L << 24)),
      4L -> (s0 ^ 1L ^ (1L << 12) ^ (1L << 24) ^ (1L << 36)), 5L -> 0x123456789ABCL)
    val expect = (for {
      (ia, sa) <- all; (ib, sb) <- all if ib > ia
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == expect, s"got $got expect $expect")
    // the 4-spread-bit pair is excluded even though it shares... no block:
    // sanity that (1,4) and (3,4) are absent, (1,3) present at hamming 3
    assert(got.contains((1L, 3L, 3)) && !got.exists(p => p._1 == 1L && p._2 == 4L))
  }

  test("simhashPairs property: every width/block-count banding equals brute force on random signatures") {
    // the Manku C(b, b-h) combination scheme must be EXACT for any legal
    // (bits, h, b) — including the production 64-bit width DuckDB cannot
    // gate, uneven block divisions (60/6, 64/6), the minimal b = h+1
    // (single-block keys, the legacy layout), and h = 0. Signatures are
    // seeded-random with planted near-dup clusters so the <= h set is
    // non-trivial at every width.
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for ((bits, h, b) <- Seq((48, 3, 0), (48, 3, 4), (48, 3, 6), (60, 3, 0),
        (64, 3, 0), (64, 3, 6), (64, 2, 5), (64, 1, 4), (48, 0, 0), (64, 4, 6))) {
      val mask = if (bits == 64) -1L else (1L << bits) - 1
      val base = Array.fill(40)(rnd.nextLong() & mask)
      // plant: for each base sig, a copy with 0..h+2 random bit flips —
      // some inside, some just outside the threshold
      val planted = base.zipWithIndex.flatMap { case (s, i) =>
        val flips = rnd.nextInt(h + 3)
        val flipped = (0 until flips).foldLeft(s)((acc, _) =>
          acc ^ (1L << rnd.nextInt(bits)))
        Seq((i.toLong, s), (i.toLong + 1000L, flipped))
      }
      val got = Dedup.simhashPairsOf(planted.toSeq.toDF("id", "sig"),
          bits = bits, maxHamming = h, nBlocks = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = (for {
        (ia, sa) <- planted; (ib, sb) <- planted if ib > ia
        d = java.lang.Long.bitCount(sa ^ sb) if d <= h
      } yield (ia, ib, d)).toSet
      assert(got == expect,
        s"(bits=$bits h=$h b=$b): missing=${expect.diff(got).take(5)} extra=${got.diff(expect).take(5)}")
      assert(expect.nonEmpty, s"(bits=$bits h=$h b=$b): degenerate fixture")
    }
  }

  test("simhashPairs: corpus near-dups pair, maxBucket guard only prunes, null text never pairs") {
    val pairs = Dedup.portableSimhashPairs(withDups, "text", "doc_id", maxHamming = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact copy (0, 200000) is at hamming 0; the one-token perturbed
    // near-copies (i, i+100000) flip few majority votes
    assert(got.contains((0L, 200000L)), s"exact copy missing: $got")
    assert(got.exists(p => p._2 >= 100000L && p._2 < 200000L), s"no near-copy pair: $got")
    // guard is prune-only: guarded output is a subset of exact output
    val guarded = Dedup.portableSimhashPairs(withDups, "text", "doc_id",
        maxHamming = 3, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.subsetOf(got), s"guard invented pairs: ${guarded.diff(got)}")
  }

  test("removeDuplicateSpans: shared spans cut from both docs, unique text intact, full-dup doc empties") {
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val uniq1 = (1 to 20).map(i => s"a$i").mkString(" ")
    val uniq2 = (1 to 20).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (1L, s"$uniq1 $span"),
      (2L, s"$span $uniq2"),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")),
      (4L, s"$uniq1 $span"), // exact copy of doc 1 -> all windows dup'd -> empties
      (5L, "too few tokens"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 3 untouched (already single-spaced, so rebuild is identity)
    assert(rows(3L)._1 == (1 to 30).map(i => s"u$i").mkString(" "))
    assert(rows(3L)._3 == 0)
    // docs 1/4 are exact copies: every window dup'd, all text removed
    assert(rows(1L)._1 == "" && rows(1L)._3 == 32, s"doc1 ${rows(1L)}")
    assert(rows(4L)._1 == "" && rows(4L)._3 == 32)
    // doc 2 shares only the 12-token span with 1/4: dup windows are the 5
    // fully-inside-span starts, covering span positions 0..11 -> the 12
    // span tokens go, the 20 unique tokens stay
    assert(rows(2L)._1 == uniq2, s"doc2 ${rows(2L)}")
    assert(rows(2L)._3 == 12)
    // short doc: no windows, nothing removed
    assert(rows(5L) == (("too few tokens", 3L, 0L)))
    // null text: stays null, zero counts
    assert(rows(6L)._1 == null && rows(6L)._2 == 0 && rows(6L)._3 == 0)
  }

  test("removeDuplicateSpans: maxDocTokens skips-and-flags the mega-doc, others unaffected") {
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val uniq = (1 to 20).map(i => s"a$i").mkString(" ")
    val mega = (1 to 40).map(i => s"m$i").mkString("  ") + s"  $span" // double spaces
    val d = Seq(
      (1L, s"$uniq $span"), // shares the span with the mega-doc
      (2L, mega),           // 52 tokens > ceiling -> skipped
      (3L, (1 to 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 8, maxDocTokens = 45)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // the mega-doc passes through whitespace-normalised, nothing removed
    val megaNorm = mega.split("\\s+").mkString(" ")
    assert(rows(2L) == ((megaNorm, 52L, 0L, true)), rows(2L))
    // its windows STILL count corpus-wide: doc 1 loses the shared span
    assert(rows(1L)._1 == uniq && rows(1L)._3 == 12 && !rows(1L)._4, rows(1L))
    assert(!rows(3L)._4 && rows(3L)._3 == 0)
    // default ceiling: nothing skipped, flag uniformly false
    val noSkip = Dedup.removeDuplicateSpans(d, "doc_id", "text", w = 8)
    assert(noSkip.filter(col("span_skipped")).count() == 0)
  }

  test("guard counters: a planted degenerate bucket is counted exactly, and matches what the guard drops") {
    // 60-doc boilerplate clique + 20 unique docs; cap 50 → exactly the
    // clique's 8 shared band keys overflow, 60 banded rows each
    val clique = (1 to 60).map(i =>
      (i.toLong, "the same boilerplate spam text repeated across every clique member"))
    val uniq = (61 to 80).map(i =>
      (i.toLong, (1 to 12).map(j => s"u${i}t$j").mkString(" ")))
    val d = (clique ++ uniq).toDF("doc_id", "text")
    val r = Dedup.minhashBandOverflow(d, "text", "doc_id", maxBucket = 50).head()
    assert(r.getLong(1) == 8, s"overflow buckets: $r")
    assert(r.getLong(2) == 480, s"rows dropped: $r")
    // the counters describe REAL truncation: with the guard on, the
    // clique mines zero pairs; off, it mines the full clique
    val guarded = Dedup.minhashPairs(d, "text", "doc_id", maxBucket = 50)
      .filter(col("id_a") <= 60 && col("id_b") <= 60).count()
    val open = Dedup.minhashPairs(d, "text", "doc_id", maxBucket = 0)
      .filter(col("id_a") <= 60 && col("id_b") <= 60).count()
    assert(guarded == 0 && open == 60L * 59 / 2, s"guarded=$guarded open=$open")
    // simhash family: identical docs share every combination key — all 20
    // tables report the clique bucket at cap 1
    val sigs = d.select(col("doc_id").as("id"), Dedup.portableSimhash(col("text")).as("sig"))
    val sh = Dedup.simhashBandOverflow(sigs, bits = 48, maxHamming = 3, maxBucket = 1)
    assert(sh.count() == 20)
    assert(sh.filter(col("n_overflow_buckets") < 1).count() == 0)
    assert(sh.filter(col("n_rows_dropped") < 60).count() == 0)
  }

  test("removeDuplicateLines: corpus-first line survives, repeats vanish, order and blanks preserved") {
    val d = Seq(
      (1L, "unique alpha\nshared boilerplate line\nunique beta"),
      (2L, "shared boilerplate line\nunique gamma\n\nunique delta"),
      (3L, "unique epsilon\n\nshared boilerplate line"),
      (4L, "unique zeta"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val rows = Dedup.removeDuplicateLines(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 holds the FIRST occurrence of the boilerplate: untouched
    assert(rows(1L) == (("unique alpha\nshared boilerplate line\nunique beta", 3L, 0L)), rows(1L))
    // doc 2 loses the boilerplate repeat; its blank line is the corpus-
    // FIRST blank, so it stays; order preserved
    assert(rows(2L) == (("unique gamma\n\nunique delta", 4L, 1L)), rows(2L))
    // doc 3 loses the boilerplate AND the now-duplicated blank line
    assert(rows(3L) == (("unique epsilon", 3L, 2L)), rows(3L))
    assert(rows(4L) == (("unique zeta", 1L, 0L)))
    assert(rows(5L)._1 == null && rows(5L)._2 == 0 && rows(5L)._3 == 0)
    // a doc that is ALL repeats empties out (the min-length-filter
    // pairing, as with span removal)
    val d2 = d.unionByName(Seq(
      (6L, "shared boilerplate line\nunique alpha")).toDF("doc_id", "text"))
    val r6 = Dedup.removeDuplicateLines(d2, "doc_id", "text")
      .filter(col("doc_id") === 6L).head()
    assert(r6.getString(1) == "" && r6.getLong(3) == 2, r6)
  }

  test("span stats and span removal agree on the fixture corpus") {
    val stats = Dedup.duplicateSpanStats(docs, "doc_id", "text", w = 8)
      .select(col("doc_id"), col("n_dup_windows"))
    val removed = Dedup.removeDuplicateSpans(docs, "doc_id", "text", w = 8)
    val joined = stats.join(removed, "doc_id").cache()
    try {
      // a doc has removed tokens iff it has duplicated windows, and any
      // dup window covers at least its own w tokens
      assert(joined.filter(col("n_dup_windows") === 0 &&
        col("n_tokens_removed") =!= 0).count() == 0)
      assert(joined.filter(col("n_dup_windows") > 0 &&
        col("n_tokens_removed") < 8).count() == 0)
      assert(joined.filter(col("n_tokens_removed") > col("n_tokens")).count() == 0)
      // untouched docs round-trip as their single-spaced token join
      val untouched = joined.filter(col("n_dup_windows") === 0 && col("clean_text").isNotNull)
        .join(docs, "doc_id")
        .filter(col("clean_text") =!=
          concat_ws(" ", graft.text.TextAnalysis.tokens(col("text"))))
      assert(untouched.count() == 0)
    } finally joined.unpersist()
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

  test("containmentPairs catches verbatim embedding that Jaccard banding misses") {
    val small = (1 to 10).map(i => s"quote$i").mkString(" ")
    val filler = (1 to 200).map(i => s"body$i").mkString(" ")
    val docs = Seq(
      (1L, small),                  // the embedded original
      (2L, s"$filler $small"),      // wrapper page embedding it verbatim
      (3L, (1 to 100).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    // symmetric Jaccard ≈ 8/208 — the q31 detector must NOT pair them...
    assert(Dedup.verifiedNearDupPairs(docs, "text", "doc_id", 0.8).count() == 0)
    // ...while containment of the small doc is exactly 1.0
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id").collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getAs[Long]("id_a") == 1L && p.getAs[Long]("id_b") == 2L)
    assert(p.getAs[Long]("cont_a_u") == 1000000L)
    assert(p.getAs[Long]("cont_b_u") < 900000L)
  }

  test("containmentPairs df ceiling: boilerplate shingles generate no pairs") {
    // 150 docs sharing ONE hot boilerplate line (df 150 > maxDf 100) and
    // otherwise fresh text: the hot shingles must not produce any
    // candidate pair (quadratic blowup guard), so no pairs at all
    val boiler = "all rights reserved by the site"
    val docs = (1 to 150).map(i =>
      (i.toLong, s"$boiler fresh$i content$i words$i here$i"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(docs, "text", "doc_id").count() == 0)
    // with the ceiling lifted (and the bar below the 4-of-9 boiler
    // containment) the same corpus pairs freely — proving the silence
    // above came from the ceiling, not from the threshold
    assert(Dedup.containmentPairs(docs, "text", "doc_id",
      minContainmentU = 400000L, maxDf = 1000).count() > 0)
  }
}
