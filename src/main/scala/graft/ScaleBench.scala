package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend harness (round-4 verdict #5): no sf1 fixture exists in this
  * environment, so this main BUILDS a `factor`-times corpus from the sf0.1
  * fixture under `tmp/scale_x{factor}/` and times the most expensive
  * catalog queries at base vs scaled, recording the ratio per query. A
  * near-linear engine shows ratio ≲ factor × 1.2; a super-linear query is
  * a scale bug the trend exposes before a real cluster would.
  *
  * The scaled corpus is NOT naive row duplication — that would plant
  * 10-cliques of exact/near duplicates and quadratically explode every
  * dedup/ANN pair relation (the opposite of how a real corpus grows):
  *  - fact tables (lineitem/orders/events) replicate with KEY OFFSETS so
  *    join integrity holds and key cardinality scales; dimension tables
  *    stay fixed (how real warehouses grow);
  *  - documents suffix every token with the copy index (`_k`) — token
  *    sets, shingles, minhashes and CDC chunks are all disjoint across
  *    copies, so dedup work scales linearly like real fresh text;
  *  - embeddings add deterministic per-component noise at the corpus's
  *    own RMS (cos(original, copy) ≈ 0.7 < every near-dup threshold), so
  *    ANN clusters grow without becoming duplicate cliques.
  * Copy 0 is bit-identical to the base fixture, so all base-corpus
  * relationships survive inside the scaled corpus.
  */
object ScaleBench {

  /** The most expensive catalog queries by BENCH_r04 median, plus the
    * round-5 duplicate-span pair (top-4 by r5 median — corpus-wide window
    * hashing is exactly the kind of pass whose trend matters). */
  val Heavy: Seq[String] = Seq(
    "q79_stream_join", "q83_ivf_index", "q70_range_join_rule",
    "q82_asof_broadcast", "q66_semantic_dedup", "q50_range_join",
    "q22_fingerprint_by_partition", "q80_chunk_overlap", "q54_knn_ivf",
    "q16_join_agg", "q92_dup_spans", "q93_strip_dup_spans",
    // round 6: the incremental near-dup store round trip (history fold +
    // banded probe + exact verification) — the full-corpus signature pass
    // plus a 16-byte band-key shuffle; the trend certifies the probe
    // never degenerates toward all-pairs as the corpus grows
    "q100_neardup_seen",
    // round 6: PQ ANN (train + encode + ADC scan + rerank) — map-only
    // encode and a broadcast-LUT fold scan; the trend certifies linear
    // growth of the compression leg
    "q102_pq_knn",
    // round 8: DSIR importance weighting — a full-corpus bigram explode
    // scored against broadcast 256-row models; the trend certifies the
    // per-doc combine stays the only corpus-sized exchange
    "q119_dsir_weights",
    // round 8: cross-source near-dup overlap matrix — the q31 banded pair
    // mining plus a per-pair source join-back; the trend certifies the
    // candidate bound (never all-pairs) carries to the report form
    "q120_source_overlap",
    // round 8 (cont.): Bloom decontamination — two full-corpus shingle
    // passes against a FIXED 64 KiB bitmap; the trend certifies the
    // broadcast stays constant-size while the probe grows linearly
    "q124_bloom_contamination",
    // round 8 (cont.): snapshot diff — two distinct-(source, text-hash)
    // reductions + one full-outer join on the 8-byte key; the trend
    // certifies the turnover report never exceeds two linear passes
    "q125_snapshot_diff",
    // round 8 (cont.): containment pair mining — a posting self-join
    // whose volume is Σ df² over the ceiling-surviving vocabulary; the
    // trend certifies the df ceiling keeps the join near-linear as the
    // corpus (and so every df) grows
    "q128_containment_pairs",
    // round 8 (cont. 2): co-visitation PageRank — the K-iteration edge
    // shuffle; the scaled corpus grows event VOLUME at fixed user/item
    // populations, so the trend certifies the incidence distinct + the
    // capped projection absorb the raw-log growth (the graph itself is
    // population-bounded — the part that would grow on a real corpus is
    // users, which scale OUT by partition)
    "q130_covisit_pagerank",
    // round 8 (cont. 2): fuzzy prefix join — deletion-neighborhood
    // posting self-join over DISTINCT prefixes; suffixed scaled copies
    // have disjoint prefixes, so the trend certifies the variant join
    // grows with the distinct-key count, never pairwise
    "q131_fuzzy_pairs",
    // round 8 (cont. 2): image dHash mining — per-doc PNG encode+decode
    // (map-only) + the 56-bit banding join; the trend certifies the
    // codec pass is embarrassingly parallel and the banding stays
    // candidate-bounded as planted pairs grow linearly
    "q133_image_dhash",
    // round 8 (cont. 2): Misra-Gries heavy hitters — two map-dominant
    // passes with a bounded candidate shuffle; the trend certifies the
    // candidate relation stays ≤ partitions·k while the token stream
    // grows (the entire point of the sketch design)
    "q134_heavy_hitters",
    // round 8 (cont. 2): SCD2 history — per-user gaps-and-islands; the
    // scaled corpus grows each user's history by the factor (fixed user
    // population), the WORST case for per-entity windows — the trend
    // certifies the per-entity sort absorbs it near-linearly
    "q135_scd2_history",
    // round 8 (cont. 2): audio fingerprint mining — per-doc WAV
    // encode+decode (map-only, the q133 codec class) + the 56-bit
    // banding join; certifies the third modality's codec pass stays
    // linear (no disk-backed stream cache — WAV writes to a ByteBuffer)
    "q141_audio_fingerprint",
    // round 8 (cont. 3): window funnel — the scaled corpus grows each
    // user's event history by the factor (fixed user population), the
    // worst case for the per-user sorted fold (the q135 class); the
    // trend certifies the greedy fold absorbs 30x-longer per-user
    // sequences linearly with no self-join blowup
    "q142_window_funnel",
    // round 9: BATCHED index retrieval — build + 1000-query distributed
    // probe; the trend certifies the (bucket, term) equi-join path grows
    // with postings volume, never with |queries| × corpus
    "q152_bm25_batch",
    // round 9: incremental rollup store — three shard folds (each a
    // map-side-combined groupBy of its slice) + the states-only merge
    // read; the trend certifies the merge cost tracks the DISTINCT-KEY
    // count (the scaled corpus extends the timeline, so (type, day) keys
    // grow ~linearly while raw rows grow by the factor × density — the
    // merge read must stay a dimension-sized job, never a corpus rescan)
    "q156_agg_rollup",
    // round 9 (cont.): sumMap rollup state — the q156 shape plus a
    // map-typed state per group; the trend certifies the map payload
    // stays O(key domain) per group (event types are fixed, so state
    // size must NOT grow with raw rows — only the fold pass does)
    "q167_rollup_summap",
    // round 9 (cont.): gap fill + interpolation — the series aggregate
    // is the only corpus-sized pass; the grid and the binary-search
    // picks are bounded by the TIME RANGE over the step, so the trend
    // certifies the fill leg stays ~flat while the corpus densifies the
    // same timeline by the factor
    "q165_fill_interpolate")

  /** Operator-level stand-ins for gate queries whose CATALOG form embeds a
    * deliberately quadratic verification pass. q66's gate recomputes exact
    * all-pairs cosine ground truth so the DuckDB oracle can certify
    * drop-soundness — that apparatus is O(N²) BY DESIGN and would swamp the
    * operator's own trend (x10 shakeout: 29x). Here the trend times
    * [[graft.sim.Similarity.semanticDedup]] itself, with auto cluster count
    * (constant cluster size) — the shape a 100 TB run would use. */
  private val opOverrides: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_semantic_dedup" -> ((s, dir) => {
      val emb = graft.core.Tables.load(s, dir, "embeddings")
      graft.sim.Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCentroids = 0, threshold = 0.25, lloydIters = 1)
    }),
    // q102's gate embeds the O(N·Q) exact brute-force comparator (the
    // recall oracle's apparatus); the trend times the OPERATOR — train +
    // encode + ADC scan + shortlist rerank
    "q102_pq_knn" -> ((s, dir) => {
      val emb = graft.core.Tables.load(s, dir, "embeddings")
      val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      graft.sim.Similarity.pqKnnRerank(q, emb, "vec_id", "embedding",
        k = 10, shortlist = 1000, m = 8, kCodes = 32, lloydIters = 1)
    }))

  /** Queries the PLANTED-SKEW corpus stresses (round-5 verdict #5): the
    * duplicate-span pair hit the 1e5x-duplicated span, the join pair hit
    * the hot key. The clean x-factor corpus is deliberately clique-free
    * (fresh text per copy), which means it structurally CANNOT expose a
    * hot-key cliff — this variant exists to close that blind spot. */
  val SkewQueries: Seq[String] = Seq(
    "q92_dup_spans", "q93_strip_dup_spans", "q16_join_agg", "q28_salted_join")

  /** One 8-token span duplicated [[SpanDupCopies]] times across otherwise
    * fresh docs — the Lee et al. 2022 pathology (C4's worst span: 60k+
    * copies; this plants ~2x worse than that). */
  private val PlantedSpan =
    "skewspan1 skewspan2 skewspan3 skewspan4 skewspan5 skewspan6 skewspan7 skewspan8"
  private val SpanDupCopies = 100000
  /** Fraction (percent) of fact rows re-keyed onto ONE hot join key. */
  private val HotKeyPct = 1

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val skew = args.contains("--skew")
    // optional extra args: query-name substrings to run (isolation aid)
    val wanted = args.drop(1).filterNot(_ == "--skew")
    val heavy = Heavy.filter(q => wanted.isEmpty || wanted.exists(q.contains))
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scaledDir = s"tmp/scale_x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    if (!Files.exists(Paths.get(s"$scaledDir/_BUILT")))
      build(spark, baseDir, scaledDir, factor)
    if (skew) { runSkew(spark, scaledDir, factor, wanted); spark.stop(); return }

    val catalog = SparkEntry.queries
    def run(name: String, dir: String, tag: String): Double = {
      System.err.println(s"[scale] START $tag $name @ $dir")
      val t0 = System.nanoTime()
      opOverrides.getOrElse(name, catalog(name))(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[scale] DONE  $tag $name: $t%.2f s")
      t
    }
    // warm pass at base (codegen/JIT), untimed; then one timed pass per tier
    heavy.foreach(q => run(q, baseDir, "warm"))
    val results = heavy.map { q =>
      val base = run(q, baseDir, "base")
      val scaled = run(q, scaledDir, "scaled")
      (q, base, scaled, scaled / math.max(base, 1e-9))
    }
    // MEDIA FEATURE-STORE legs cell (round-8 verdict task #4's "Done"
    // criterion): the q133/q141 x30 ratios are pure per-byte codec cost,
    // re-paid on every mining run. With the persisted feature store the
    // codec leg is paid ONCE per ingest (decode + O(shard) append) and the
    // MINING leg reads 16-byte (doc_id, sig) rows — this cell times the
    // two legs apart at base vs scaled so the record shows the mining leg
    // at sub-codec cost with a flat-to-linear ratio of its own.
    val mediaResult =
      if (wanted.nonEmpty && !wanted.exists("q153_media_features".contains)) None
      else {
        def legs(dir: String, tag: String): (Double, Double) = {
          val store = graft.core.Fs.scratchDir("graft_scale_media")
          try {
            System.err.println(s"[scale] START $tag media codec leg @ $dir")
            val t0 = System.nanoTime()
            graft.multimodal.MediaFeatureStore.append(spark, store.toString,
              graft.queries.GraphQueries.dhashSigs(spark, dir)
                .withColumnRenamed("id", "doc_id"), "dhash56", "s0")
            val codec = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[scale] DONE  $tag media codec leg: $codec%.2f s")
            val t1 = System.nanoTime()
            graft.dedup.Dedup.simhashPairsOf(
                graft.multimodal.MediaFeatureStore.read(spark, store.toString, "dhash56")
                  .withColumnRenamed("doc_id", "id"),
                bits = 56, maxHamming = 4)
              .write.format("noop").mode("overwrite").save()
            val mine = (System.nanoTime() - t1) / 1e9
            System.err.println(f"[scale] DONE  $tag media mining leg: $mine%.2f s")
            (codec, mine)
          } finally graft.core.Fs.deleteRecursively(store)
        }
        legs(baseDir, "warm") // codegen/JIT outside the timed cells
        val (bCodec, bMine) = legs(baseDir, "base")
        val (sCodec, sMine) = legs(scaledDir, "scaled")
        Some(f""""q153_media_codec_leg":{"base":$bCodec%.3f,"scaled":$sCodec%.3f,"ratio":${sCodec / math.max(bCodec, 1e-9)}%.2f},""" +
          f""""q153_media_mining_leg":{"base":$bMine%.3f,"scaled":$sMine%.3f,"ratio":${sMine / math.max(bMine, 1e-9)}%.2f}""")
      }
    // BUCKETED JOIN-FAMILY legs cell (round-10 verdict #2's "Done"
    // criterion): q16's x30 ratio ~23 is the plain-layout fact⋈fact
    // shuffle — BOTH fact tables re-partitioned on every join. With the
    // bucketed layout that shuffle is paid ONCE (the layout leg, amortised
    // across every subsequent join); the JOIN leg reads pre-placed buckets
    // with zero Exchange on either fact side. This cell times the two legs
    // apart at base vs scaled so the record shows the per-query join cost
    // dropping to ~at-factor once layout is off the query path.
    val bucketResult =
      if (wanted.nonEmpty && !wanted.exists("q172_join_agg_bucketed".contains)) None
      else {
        def legs(dir: String, tag: String): (Double, Double) = {
          val scratch = graft.core.Fs.scratchDir("graft_scale_bucket")
          val t = java.lang.Long.toHexString(System.nanoTime())
          val (tLi, tOrd) = (s"graft_sb16_li_$t", s"graft_sb16_ord_$t")
          try {
            System.err.println(s"[scale] START $tag bucketed layout leg @ $dir")
            val t0 = System.nanoTime()
            graft.queries.ScaleQueries.bucketFacts(spark, dir, scratch.toString, tLi, tOrd)
            val layout = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[scale] DONE  $tag bucketed layout leg: $layout%.2f s")
            val t1 = System.nanoTime()
            val (joined, free) = graft.queries.ScaleQueries.bucketedFactJoin(spark, tLi, tOrd)
            require(free, "bucketed fact join planned an Exchange — layout not honoured")
            joined
              .join(broadcast(graft.core.Tables.load(spark, dir, "customer")),
                col("o_custkey") === col("c_custkey"))
              .join(broadcast(graft.core.Tables.load(spark, dir, "nation")),
                col("c_nationkey") === col("n_nationkey"))
              .groupBy("n_name")
              .agg(expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
                "(1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)").as("revenue"),
                count(lit(1)).as("n_rows"))
              .write.format("noop").mode("overwrite").save()
            val join = (System.nanoTime() - t1) / 1e9
            System.err.println(f"[scale] DONE  $tag bucketed join leg: $join%.2f s")
            (layout, join)
          } finally {
            spark.sql(s"DROP TABLE IF EXISTS $tLi")
            spark.sql(s"DROP TABLE IF EXISTS $tOrd")
            graft.core.Fs.deleteRecursively(scratch)
          }
        }
        legs(baseDir, "warm") // codegen/JIT outside the timed cells
        val (bLayout, bJoin) = legs(baseDir, "base")
        val (sLayout, sJoin) = legs(scaledDir, "scaled")
        Some(f""""q172_bucketed_layout_leg":{"base":$bLayout%.3f,"scaled":$sLayout%.3f,"ratio":${sLayout / math.max(bLayout, 1e-9)}%.2f},""" +
          f""""q172_bucketed_join_leg":{"base":$bJoin%.3f,"scaled":$sJoin%.3f,"ratio":${sJoin / math.max(bJoin, 1e-9)}%.2f}""")
      }
    val qs = (results.map { case (q, b, s, r) =>
      f""""$q":{"base":$b%.3f,"scaled":$s%.3f,"ratio":$r%.2f}"""
    } ++ mediaResult ++ bucketResult).mkString("{", ",", "}")
    val sumBase = results.map(_._2).sum
    val sumScaled = results.map(_._3).sum
    val sumRatio = if (sumBase > 0) sumScaled / sumBase else 0.0 // NaN is not JSON
    val line =
      f"""{"metric":"scale_trend","factor":$factor,"sum_base":$sumBase%.2f,"sum_scaled":$sumScaled%.2f,"sum_ratio":$sumRatio%.2f,"queries":$qs,"base_sf":"$baseDir"}"""
    // full runs only: an isolation run must not overwrite the round's record.
    // bench_sf1.json is the prescribed x10 artifact; every factor also gets
    // its own file so multi-point trends (x10 + x30) coexist.
    if (wanted.isEmpty) try {
      Files.createDirectories(Paths.get("tmp"))
      Files.writeString(Paths.get(s"tmp/bench_scale_x$factor.json"), line + "\n")
      if (factor == 10)
        Files.writeString(Paths.get("tmp/bench_sf1.json"), line + "\n")
    } catch { case e: Throwable => System.err.println(s"[scale] file write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }

  /** Raw parquet read: no Tables.load conversions (the scaled files must
    * keep the fixture's physical shape, e.g. events.ts as int64 nanos). */
  private def raw(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC") // NTZ↔micros conversions below
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Write as ONE parquet FILE named `<name>.parquet`, exactly the fixture
    * layout. Single parquet files are still row-group-splittable, so scan
    * parallelism survives. */
  private def writeSingle(df: DataFrame, outDir: String, name: String): Unit =
    writeFileAs(df, s"$outDir/$name.parquet")

  /** Write `df` as exactly one parquet file at the full path `target`. */
  private def writeFileAs(df: DataFrame, target: String): Unit = {
    val tmp = target + ".__tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator()
    var moved = false
    while (part.hasNext && !moved) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        Files.move(p, Paths.get(target),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        moved = true
      }
    }
    require(moved, s"no parquet part written for $target")
    graft.core.Fs.deleteRecursively(Paths.get(tmp))
  }

  def build(spark: SparkSession, baseDir: String, outDir: String, factor: Int): Unit = {
    System.err.println(s"[scale] building ${factor}x corpus at $outDir")
    graft.core.Fs.deleteRecursively(Paths.get(outDir)) // no stale dir-shaped tables
    Files.createDirectories(Paths.get(outDir))
    // dimensions: fixed (copy verbatim)
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      writeSingle(raw(spark, baseDir, t), outDir, t)

    def copies(df: DataFrame): DataFrame = {
      val ks = spark.range(factor).select(col("id").cast("int").as("__k"))
      df.crossJoin(broadcast(ks))
    }
    // fact tables: id offsets preserve join integrity and scale cardinality
    val orders = raw(spark, baseDir, "orders")
    val orderOff = orders.agg(max("o_orderkey")).head().getLong(0) + 1
    writeSingle(copies(orders)
      .withColumn("o_orderkey", col("o_orderkey") + col("__k") * orderOff)
      .drop("__k"), outDir, "orders")
    writeSingle(copies(raw(spark, baseDir, "lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__k") * orderOff)
      .drop("__k"), outDir, "lineitem")
    // events: copy k is shifted FORWARD IN TIME by k*(span+1h), not stacked
    // onto the same clock range — real event data grows by extending the
    // timeline at roughly constant density. Stacking 10 copies onto one
    // span makes every time-window join quadratic in the factor (x10
    // shakeout: q70's point-in-interval output grew 100x and its runtime
    // 400x), which is a corpus artifact, not a real workload shape.
    // ts arrives either as raw INT64 epoch-nanos (legacy fixture shape,
    // nanosAsLong read) or as parquet timestamp[us] (current fixture);
    // shift in the column's own type so the written file keeps the
    // fixture's physical shape bit-for-bit.
    val events = raw(spark, baseDir, "events")
    val eventOff = events.agg(max("event_id")).head().getLong(0) + 1
    val tsIsLongNanos = events.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val tsMicros =
      if (tsIsLongNanos) expr("ts div 1000")
      else unix_micros(col("ts").cast("timestamp")) // NTZ→LTZ exact under UTC session
    val tsRow = events.agg(min(tsMicros), max(tsMicros)).head()
    val spanMicros = tsRow.getLong(1) - tsRow.getLong(0) + 3600L * 1000000L
    val shiftedTs =
      if (tsIsLongNanos) col("ts") + col("__k").cast("long") * (spanMicros * 1000L)
      else expr(s"timestampadd(MICROSECOND, __k * ${spanMicros}L, ts)")
    val scaledEvents = copies(events)
      .withColumn("event_id", col("event_id") + col("__k") * eventOff)
      .withColumn("ts", shiftedTs)
    // events.parquet becomes a DIRECTORY: one part file per time-shifted
    // copy, written sequentially in copy (= time) order. The streaming
    // source admits files oldest-modification-first with
    // maxFilesPerTrigger=1, so each copy is its own micro-batch and
    // event time rises monotonically across batches — stream-stream join
    // state stays bounded at one copy (+watermark overlap) instead of the
    // whole corpus, and the watermark never late-drops a row. Batch
    // readers (Spark, DuckDB glob) see the same relation either way.
    Files.createDirectories(Paths.get(s"$outDir/events.parquet"))
    (0 until factor).foreach { k =>
      writeFileAs(scaledEvents.filter(col("__k") === k).drop("__k"),
        f"$outDir/events.parquet/copy-$k%03d.parquet")
    }

    // documents: per-copy token suffix -> disjoint token/shingle/chunk space
    val docs = raw(spark, baseDir, "documents")
    val docOff = docs.agg(max("doc_id")).head().getLong(0) + 1
    writeSingle(copies(docs)
      .withColumn("text", when(col("__k") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          x => concat(x, lit("_"), col("__k"))), " ")))
      .withColumn("doc_id", col("doc_id") + col("__k") * docOff)
      .withColumn("n_chars", length(col("text")))
      .drop("__k"), outDir, "documents")

    // embeddings: deterministic noise at corpus RMS so copies are NOT
    // near-duplicates (cos(v, v+noise_at_rms) ~ 0.7) but keep the
    // distribution's shape
    val emb = raw(spark, baseDir, "embeddings")
    val rms = math.sqrt(
      emb.select(explode(col("embedding")).as("x"))
        .agg(avg(col("x") * col("x"))).head().getDouble(0))
    val s = rms * math.sqrt(3.0) // uniform[-s,s] has RMS s/sqrt(3)
    val vecOff = emb.agg(max("vec_id")).head().getLong(0) + 1
    writeSingle(copies(emb)
      .withColumn("embedding", when(col("__k") === 0, col("embedding")).otherwise(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x + lit(s) *
            (xxhash64(col("vec_id"), col("__k"), i).cast("double") /
              lit(Long.MaxValue.toDouble))).cast("float"))))
      .withColumn("vec_id", col("vec_id") + col("__k") * vecOff)
      .drop("__k"), outDir, "embeddings")

    Files.writeString(Paths.get(s"$outDir/_BUILT"), s"factor=$factor from=$baseDir\n")
    System.err.println(s"[scale] build done")
  }

  /** Skew point: same scaled corpus, but with the two pathologies the
    * clean construction deliberately avoids PLANTED back in —
    *  (a) documents gain [[SpanDupCopies]] fresh docs all containing the
    *      SAME 8-token span ([[PlantedSpan]]): one window hash now holds
    *      1e5 occurrences, the exact shape that made the pre-fix
    *      count-over-Window q93 a one-task straggler/spill cliff (the
    *      two-level-aggregate form absorbs it map-side);
    *  (b) [[HotKeyPct]]% of lineitem rows are re-keyed onto ONE existing
    *      l_orderkey and ONE l_suppkey: q16's shuffle join sees a hot key
    *      (AQE skew-join territory), q28's salted join exists for exactly
    *      this and must hold its ratio.
    * Reported ratio = skewed / clean runtime ON THE SAME ROW COUNTS
    * (the skew corpus adds ~1e5 doc rows to ~6e5 — noted in the JSON);
    * a skew-safe plan stays near 1, a skew cliff shows up as a multiple. */
  def runSkew(spark: SparkSession, scaledDir: String, factor: Int,
      wanted: Seq[String]): Unit = {
    val skewDir = s"tmp/scale_skew_x$factor"
    if (!Files.exists(Paths.get(s"$skewDir/_BUILT")))
      buildSkew(spark, scaledDir, skewDir)
    val qs = SkewQueries.filter(q => wanted.isEmpty || wanted.exists(q.contains))
    val catalog = SparkEntry.queries
    def run(name: String, dir: String, tag: String): Double = {
      System.err.println(s"[skew] START $tag $name @ $dir")
      val t0 = System.nanoTime()
      catalog(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[skew] DONE  $tag $name: $t%.2f s")
      t
    }
    qs.foreach(q => run(q, scaledDir, "warm"))
    val results = qs.map { q =>
      val clean = run(q, scaledDir, "clean")
      val skewed = run(q, skewDir, "skew")
      (q, clean, skewed, skewed / math.max(clean, 1e-9))
    }
    // (c) GIANT-SOURCE cell (round-6 verdict weak #1): ~90% of docs
    // collapse onto ONE source — the real-corpus shape where a single
    // crawl dominates the mix. The pre-fix per-source pack window made
    // this a one-task sort of most of the corpus; the two-level
    // (source, shard) offsets must hold the skewed/clean ratio near 1.
    val giantResult =
      if (wanted.nonEmpty && !wanted.exists("q58_seq_packing".contains)) None
      else {
        val giantDir = s"tmp/scale_giant_x$factor"
        if (!Files.exists(Paths.get(s"$giantDir/_BUILT"))) {
          System.err.println(s"[skew] building giant-source corpus at $giantDir")
          graft.core.Fs.deleteRecursively(Paths.get(giantDir))
          Files.createDirectories(Paths.get(giantDir))
          writeSingle(raw(spark, scaledDir, "documents")
            .withColumn("source",
              when(pmod(xxhash64(col("doc_id"), lit("giant")), lit(10)) < 9,
                lit("giantsrc")).otherwise(col("source"))),
            giantDir, "documents")
          Files.writeString(Paths.get(s"$giantDir/_BUILT"),
            s"giant-source from=$scaledDir pct=90\n")
        }
        run("q58_seq_packing", scaledDir, "warm")
        val clean = run("q58_seq_packing", scaledDir, "clean")
        val giant = run("q58_seq_packing", giantDir, "giant")
        Some((clean, giant, giant / math.max(clean, 1e-9)))
      }
    // (d) BOT-USER cell: ~half of all events re-keyed onto ONE user — the
    // behavioral-analytics worst case (one funnel group holds half the
    // corpus). Measured twice: the catalog form (guard OFF — degrades to
    // one fat linear fold task, never quadratic) and the maxUserEvents
    // skip-and-flag guard (the bot costs one counter row; ratio ~1).
    val botResult =
      if (wanted.nonEmpty && !wanted.exists("q142_window_funnel".contains)) None
      else {
        val botDir = s"tmp/scale_bot_x$factor"
        if (!Files.exists(Paths.get(s"$botDir/_BUILT"))) {
          System.err.println(s"[skew] building bot-user corpus at $botDir")
          graft.core.Fs.deleteRecursively(Paths.get(botDir))
          Files.createDirectories(Paths.get(botDir))
          val ev = raw(spark, scaledDir, "events")
          val botUser = ev.agg(min("user_id")).head().getLong(0)
          writeSingle(ev.withColumn("user_id",
            when(pmod(xxhash64(col("event_id"), lit("bot")), lit(100)) < 50,
              lit(botUser)).otherwise(col("user_id"))), botDir, "events")
          Files.writeString(Paths.get(s"$botDir/_BUILT"),
            s"bot-user from=$scaledDir pct=50\n")
        }
        run("q142_window_funnel", scaledDir, "warm")
        val clean = run("q142_window_funnel", scaledDir, "clean")
        val bot = run("q142_window_funnel", botDir, "bot-unguarded")
        // guarded form: cap well above any organic user, far below the bot
        def guarded(dir: String, tag: String): Double = {
          System.err.println(s"[skew] START $tag q142_guarded @ $dir")
          val t0 = System.nanoTime()
          graft.operators.Behavior.funnelLevels(
            graft.core.Tables.load(spark, dir, "events"), "user_id", "ts",
            when(col("event_type") === "view", 1)
              .when(col("event_type") === "click", 2)
              .when(col("event_type") === "purchase", 3),
            nSteps = 3, windowMs = 21600000L, maxUserEvents = 100000)
            .write.format("noop").mode("overwrite").save()
          val t = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[skew] DONE  $tag q142_guarded: $t%.2f s")
          t
        }
        val gClean = guarded(scaledDir, "clean")
        val gBot = guarded(botDir, "bot-guarded")
        Some((clean, bot, bot / math.max(clean, 1e-9),
          gClean, gBot, gBot / math.max(gClean, 1e-9)))
      }
    val qJson = (results.map { case (q, c, s, r) =>
      f""""$q":{"clean":$c%.3f,"skewed":$s%.3f,"ratio":$r%.2f}"""
    } ++ giantResult.map { case (c, g, r) =>
      f""""q58_seq_packing_giant_source":{"clean":$c%.3f,"skewed":$g%.3f,"ratio":$r%.2f}"""
    } ++ botResult.map { case (c, s, r, gc, gs, gr) =>
      f""""q142_window_funnel_bot_user":{"clean":$c%.3f,"skewed":$s%.3f,"ratio":$r%.2f,"guarded_clean":$gc%.3f,"guarded_skewed":$gs%.3f,"guarded_ratio":$gr%.2f}"""
    }).mkString("{", ",", "}")
    val line =
      f"""{"metric":"skew_trend","factor":$factor,"span_copies":$SpanDupCopies,"hot_key_pct":$HotKeyPct,"giant_source_pct":90,"queries":$qJson,"clean_dir":"$scaledDir"}"""
    if (wanted.isEmpty) try {
      Files.createDirectories(Paths.get("tmp"))
      Files.writeString(Paths.get(s"tmp/bench_skew_x$factor.json"), line + "\n")
    } catch { case e: Throwable => System.err.println(s"[skew] file write failed: ${e.getMessage}") }
    println(line)
  }

  def buildSkew(spark: SparkSession, scaledDir: String, outDir: String): Unit = {
    System.err.println(s"[skew] building planted-skew corpus at $outDir from $scaledDir")
    graft.core.Fs.deleteRecursively(Paths.get(outDir))
    Files.createDirectories(Paths.get(outDir))
    // untouched tables: copy the scaled files verbatim (events.parquet may
    // be a directory of per-copy part files — copy the tree)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "events", "embeddings"))
      copyTree(Paths.get(s"$scaledDir/$t.parquet"), Paths.get(s"$outDir/$t.parquet"))

    // (a) the 1e5x-duplicated span: fresh docs, two unique lead tokens
    // each (so every OTHER window stays unique), then the planted span
    val docs = raw(spark, scaledDir, "documents")
    val docOff = docs.agg(max("doc_id")).head().getLong(0) + 1
    val planted = spark.range(SpanDupCopies).select(
      (col("id") + docOff).as("doc_id"),
      concat(lit("skewuq"), col("id"), lit("a skewuq"), col("id"), lit("b "),
        lit(PlantedSpan)).as("text"),
      lit("en").as("lang"),
      lit("skewplant").as("source"))
    writeSingle(docs.unionByName(planted
      .withColumn("n_chars",
        length(col("text")).cast(docs.schema("n_chars").dataType))
      .select(docs.columns.map(col): _*)), outDir, "documents")

    // (b) one hot join key at HotKeyPct% of lineitem rows: re-key onto an
    // EXISTING order/supplier so inner joins fan the hot rows in, not out
    val li = raw(spark, scaledDir, "lineitem")
    val hotOrder = raw(spark, scaledDir, "orders").agg(min("o_orderkey")).head().getLong(0)
    val hotSupp = raw(spark, scaledDir, "supplier").agg(min("s_suppkey")).head().getLong(0)
    val pick = pmod(xxhash64(col("l_orderkey"), col("l_linenumber"), lit("skew")),
      lit(100)) < HotKeyPct
    writeSingle(li
      .withColumn("l_orderkey", when(pick, lit(hotOrder)).otherwise(col("l_orderkey")))
      .withColumn("l_suppkey", when(pick, lit(hotSupp)).otherwise(col("l_suppkey"))),
      outDir, "lineitem")

    Files.writeString(Paths.get(s"$outDir/_BUILT"),
      s"skew from=$scaledDir span_copies=$SpanDupCopies hot_key_pct=$HotKeyPct\n")
    System.err.println(s"[skew] build done")
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    if (Files.isDirectory(src)) {
      Files.createDirectories(dst)
      val it = Files.list(src).iterator()
      while (it.hasNext) { val p = it.next(); copyTree(p, dst.resolve(p.getFileName)) }
    } else Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
