package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.queries.CurationQueries
import graft.text.TextAnalysis

/** Config-driven corpus-curation pipeline: the end-to-end form of the
  * operators the query catalog exercises one at a time. A YAML file (same
  * minimal two-level parser the reconciler CLI uses — [[YamlConfig.parse]])
  * names an input documents table, an ordered step list, and an output
  * root; the runner composes ONE lazy DataFrame chain and writes
  * split-partitioned parquet shards — Catalyst sees the whole pipeline as
  * a single plan, so column pruning / filter ordering apply across steps
  * and nothing materialises between them.
  *
  * ```yaml
  * input:
  *   path: /data/corpus        # parquet root containing <table>.parquet
  *   table: documents
  * output:
  *   path: /data/shards
  *   bucket_by: doc_id          # optional: bucketed (CLUSTERED BY) layout
  *   buckets: 8                 #   — downstream joins on the key plan
  *   table: my_corpus           #   with zero Exchange on the corpus side
  * steps: normalize,redact,dedup_exact,dedup_minhash,quality_filter,split,pack
  * quality_min: 0.3            # quality_filter threshold
  * minhash_threshold: 0.7      # dedup_minhash estimated-Jaccard cutoff
  * pack_budget: 512            # pack: tokens per context window
  * test_pct: 1                 # split: % to test (and to val)
  * ```
  *
  * Steps (any order, any subset):
  *  - `strip_html` — crude tag/script removal for web-crawl input
  *  - `normalize` / `redact` — map-only text canonicalisation / PII masking
  *  - `dedup_exact` — keep the smallest id per exact content (8-byte hash
  *    shuffle key)
  *  - `dedup_seen` — incremental exact dedup against the persisted
  *    seen-hash store at `seen_store.path` (q88 primitive); survivors are
  *    folded into the store after the output commits
  *  - `dedup_neardup` — incremental NEAR-dup dedup against the persisted
  *    MinHash store at `neardup_store.path` (q100 primitive): drop docs
  *    with a verified shingle-Jaccard >= `neardup_min_jaccard` match in
  *    any prior shard; survivors fold in after the output commits. Same
  *    text-mutating ordering guard and replay protocol as `dedup_seen`
  *  - `fingerprint_store` — post-write maintenance of a per-source
  *    (rows, fp) store at `fingerprint_store.path` (mergeDelta — O(delta)
  *    reconcile inventory of everything shipped)
  *  - `dedup_minhash` — MinHash-LSH near-dup candidates above the
  *    threshold; every pair's larger id is dropped (anti-join)
  *  - `dedup_cluster_keeper` — connected components of the VERIFIED
  *    near-dup graph at `minhash_threshold`; keep the best-quality member
  *    per component (ties to min id), drop the rest (q106's shape)
  *  - `dedup_containment` — drop docs ≥90%-contained in another doc
  *    (q128's asymmetric miner: verbatim embedding that Jaccard banding
  *    misses); mutual containment keeps the smaller id
  *  - `dedup_fuzzy` — drop docs whose lowercased `fuzzy_prefix_len`-char
  *    prefix is within edit distance 1 of an earlier doc's (q131's
  *    deletion-neighborhood join; the one-keystroke variants shingle
  *    similarity misses); keeps the smallest id per fuzzy clique
  *  - `quality_filter` — drop docs under `quality_min`
  *  - `gopher_filter` — drop docs failing the Gopher rule battery
  *    (Rae et al. 2021 A1.1, q99's `keep` conjunction)
  *  - `bigram_filter` — statistical-LM coherence: drop docs whose mean
  *    corpus-bigram probability (q90's score) falls under `bigram_min`;
  *    unscorable docs (< 2 tokens) also drop
  *  - `dedup_chunks` — drop docs whose CDC-chunk shared fraction exceeds
  *    `chunk_overlap_max` (boilerplate dominance)
  *  - `dedup_spans` — drop docs whose cross-doc duplicate-SPAN fraction
  *    (stride-1 8-token windows shared with another doc, q92's counters)
  *    exceeds `span_overlap_max`; exact and boundary-free where CDC
  *    chunks are coarse — same dominance caveat as `dedup_chunks`
  *  - `strip_dup_spans` — REMOVE corpus-duplicated 8-token spans from the
  *    text instead of dropping whole docs (Lee et al. 2022 applied; q93).
  *    Text-MUTATING: ordering guard vs `dedup_seen` applies; output text
  *    is whitespace-normalised by construction
  *  - `strip_dup_lines` — CCNet paragraph dedup (Wenzek et al. 2020;
  *    q117): every line keeps its corpus-first occurrence, boilerplate
  *    repeats vanish in place. Text-MUTATING like `strip_dup_spans`
  *  - `c4_clean` — the C4 battery (Raffel et al. 2020 §2.2; q118) as a
  *    step: lines failing the line rules (terminal punctuation, >= 5
  *    words, no javascript boilerplate) are removed IN PLACE, and pages
  *    failing the page rules (>= 3 sentences, lorem ipsum, curly brace)
  *    drop. Text-MUTATING: ordering guard vs the dedup stores applies
  *  - `dsir_filter` — DSIR importance selection (Xie et al. 2023; q119):
  *    keep docs at least as likely under the `dsir.target_path` corpus's
  *    hashed-bigram model as under this shard's own (quantised-log score
  *    >= `dsir.min_u`, default 0). Unscorable docs (< 2 tokens) drop,
  *    the bigram_filter discipline
  *  - `contamination_filter` — drop docs sharing a 3-gram shingle with the
  *    `benchmark.path`/`benchmark.table` held-out set
  *  - `bloom_decontaminate` — contamination_filter's fixed-broadcast form:
  *    the benchmark membership side is a 64 KiB Bloom bitmap
  *    ([[graft.dedup.Bloom]]), so the broadcast never grows with the
  *    suite; Bloom false positives drop a few extra docs — the
  *    conservative failure direction for decontamination
  *  - `mix` — deterministic per-source downsampling at `mix_rates`
  *    (`web:0.25,news:1.0`) for training-mixture reweighting
  *  - `mix_temperature` — α=0.5 temperature sampling: each source keeps
  *    rate √(n_ref/n_s) (smallest source keeps all), no config needed
  *  - `upsample` — epoch replication at `upsample_rates` (`books:2.5`,
  *    any rate >= 0 — the rate-above-1 half mix cannot express): each
  *    doc emits floor(r) copies plus one more on a deterministic
  *    fractional-hash draw, each tagged `copy_idx`. Must be the last
  *    step (or followed only by `split` — copies share their doc's
  *    split by construction): a dedup step after it would collapse the
  *    replicas straight back, and null-id docs drop (no stable key)
  *  - `unimax` — UniMax budget allocation (q123) applied end-to-end:
  *    computes each source's epoch-capped uniform share of
  *    `unimax.budget_tokens` (cap = `unimax.epochs` passes, default 1)
  *    and replicates/downsamples at the resulting epochs_u rate through
  *    the upsample machinery. Same ordering rule as upsample
  *  - `split` — deterministic Knuth-hash train/val/test labels
  *  - `pack` — cumulative-token pack_id per source stream
  *  - `ann_index` — post-write build of a persisted IVF ANN index at
  *    `ann_index.path` over the written relation's `ann.vec_column`;
  *    `ann_index.mode: append` folds the shipped shard in at O(shard)
  *    against the frozen centroids (first shard auto-builds);
  *    `ann_index.mode: rebalance` additionally retrains the centroids on
  *    the index's own vectors and re-assigns, committed through the
  *    generation-pointer meta swap (drift maintenance — old index
  *    readable until the flip)
  *  - `ann_query` — probe a persisted IVF index: the input relation is the
  *    query set, the output is (query_id, neighbor_id, cos, rank); must be
  *    the final step
  *  - `bm25_index` — post-write build of a persisted term-bucket inverted
  *    index at `bm25_index.path` over the written (doc_id, text);
  *    `bm25_index.mode: append` folds the shipped shard into an existing
  *    index at O(shard) instead of rebuilding (first shard auto-builds)
  *  - `pq_index` — post-write build of a persisted PQ (product
  *    quantisation) index at `pq_index.path` over the written relation's
  *    `ann.vec_column`; `pq_index.mode: append` folds the shipped shard's
  *    codes in against the FROZEN codebooks (first shard auto-builds);
  *    `pq_index.mode: rebalance` additionally retrains the codebooks and
  *    re-encodes — the index stores only CODES, so the retrain corpus
  *    (the accumulated indexed vectors) comes from
  *    `pq.rebalance_corpus.path`/`pq.rebalance_corpus.table`, committed
  *    through the generation-pointer meta swap like the IVF form
  *  - `pq_query` — ADC-probe it: input relation is the query set, output
  *    (query_id, neighbor_id, cos, rank); must be the final step
  *  - `bm25_query` — probe it: input is the (query_id, term) relation,
  *    output (query_id, doc_id, rank, score_u, n_hit_terms); must be last
  *  - `data_card` — post-write per-source corpus report (q107's shape:
  *    docs/chars/tokens, language spread, quality mass, Gopher keep-rate)
  *    written to `data_card.path` (default `<output.path>_card`) — the
  *    documentation artifact shipped beside the shards
  *  - `sample` — deterministic hash sample (ClickHouse SAMPLE clause,
  *    q157's operator): keep rows whose `sample.key_column` (default
  *    doc_id) hashes into the `sample.fraction`-wide bucket window at
  *    `sample.offset`; map-only, replay-stable (the same rows survive on
  *    every run), and consistent with any other table sampled by the
  *    same key
  *  - `rollup` — post-write incremental-aggregate maintenance (q156's
  *    AggStore): fold the shipped shard's partial states — count / exact
  *    micro-unit sum / min / max of `rollup.value_column` (default
  *    n_chars) grouped by `rollup.keys` (default source) — into the
  *    store at `rollup_store.path` at O(shard); readers merge states
  *    instead of rescanning shipped shards (AggregatingMergeTree shape).
  *    `rollup.measures: name:sql-expr,…` switches to MULTI-MEASURE
  *    states (q161's form — derived expressions like
  *    `price:n_chars*0.5` are first-class measures), overriding
  *    `rollup.value_column`. Optional sketch/map states ride along in
  *    either form: `rollup.distinct_column` (q160's uniqState HLL),
  *    `rollup.quantile_column` (q164's quantileState GK summary),
  *    `rollup.sum_map: name:key_col:value_col,…` (q167's sumMapState),
  *    `rollup.uniq_upto: col:N` (q169's capped exact-distinct state)
  *  - `compact` — post-write small-file maintenance of every configured
  *    persisted store (seen / neardup / fingerprint / IVF / PQ / BM25 /
  *    rollup):
  *    read-coalesce-
  *    atomic-swap, probe results unchanged, file count bounded again
  *
  * At 100 TB each step keeps the scale shape its catalog query proved
  * (map-only, hash-grouped, or bounded-candidate); the final write is
  * `partitionBy(split)` so downstream training jobs partition-prune their
  * own split.
  */
object GraftPipeline {
  val Name = "graft-pipeline"

  final case class PipelineConfig(
      inputDir: String, table: String, outputDir: String,
      steps: Seq[String],
      qualityMin: Double, minhashThreshold: Double,
      packBudget: Int, testPct: Int,
      bigramMin: Double = 0.0,
      chunkOverlapMax: Double = 0.5,
      spanOverlapMax: Double = 0.5,
      benchmarkDir: String = "", benchmarkTable: String = "documents",
      mixRates: Map[String, Double] = Map.empty,
      seenStorePath: String = "",
      nearDupStorePath: String = "",
      nearDupMinJaccard: Double = 0.8,
      fingerprintStorePath: String = "",
      shardIdOverride: String = "",
      annIndexPath: String = "",
      annIdCol: String = "vec_id", annVecCol: String = "embedding",
      annCentroids: Int = 16, annK: Int = 10, annProbe: Int = 4,
      annMode: String = "overwrite",
      pqIndexPath: String = "", pqMode: String = "overwrite",
      pqM: Int = 8, pqKCodes: Int = 32,
      bm25IndexPath: String = "", bm25K: Int = 5,
      bm25Mode: String = "overwrite",
      dataCardPath: String = "",
      dsirTargetDir: String = "", dsirTargetTable: String = "documents",
      dsirMinU: Long = 0L,
      pqRebalanceCorpusDir: String = "",
      pqRebalanceCorpusTable: String = "embeddings",
      upsampleRatesU: Map[String, Long] = Map.empty,
      unimaxBudget: Long = 0L, unimaxEpochs: Long = 1L,
      fuzzyPrefixLen: Int = 30,
      bucketBy: String = "", buckets: Int = 8, outputTable: String = "",
      sampleKeyCol: String = "doc_id",
      sampleFraction: Double = 0.0, sampleOffset: Double = 0.0,
      rollupStorePath: String = "",
      rollupKeys: Seq[String] = Seq("source"),
      rollupValueCol: String = "n_chars",
      rollupMeasures: Seq[(String, String)] = Nil,
      rollupDistinctCol: String = "",
      rollupQuantileCol: String = "",
      rollupSumMap: Seq[(String, String, String)] = Nil,
      rollupUniqUpTo: (String, Int) = null) {
    /** Where the `data_card` step writes; sibling of the shard root by
      * default so `spark.read.parquet(output)` never picks the card up. */
    def cardPath: String =
      if (dataCardPath.nonEmpty) dataCardPath else s"${outputDir}_card"
    /** Replay-guard key for the fingerprint store: one fold per shard. */
    def shardId: String = if (shardIdOverride.nonEmpty) shardIdOverride else inputDir
    /** Session-catalog name for the bucketed output table — deterministic
      * per output path, so a replay resolves the same table. */
    def tableName: String =
      if (outputTable.nonEmpty) outputTable
      else "graft_out_" + Integer.toHexString(outputDir.hashCode) + "_" +
        outputDir.replaceAll("[^A-Za-z0-9]+", "_").takeRight(40)
  }

  /** Steps that rewrite the `text` column. The seen store hashes the FINAL
    * written text ([[run]] updates it from the output relation), while the
    * `dedup_seen` filter hashes text as of its position in the chain — so a
    * text-mutating step AFTER dedup_seen would make stored hashes never
    * match any future shard's filter-time hashes, silently disabling
    * incremental dedup. Rejected at config time. */
  private val TextMutatingSteps =
    Set("strip_html", "normalize", "redact", "strip_dup_spans",
      "strip_dup_lines", "c4_clean")

  def fromKv(kv: Map[String, String]): Either[String, PipelineConfig] = {
    val steps = kv.getOrElse("steps", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = steps.filterNot(Steps.contains)
    def mutatorsAfter(step: String): Seq[String] =
      if (!steps.contains(step)) Seq.empty
      else steps.drop(steps.indexOf(step) + 1).filter(TextMutatingSteps)
    val mutatorsAfterSeen = mutatorsAfter("dedup_seen")
    val mutatorsAfterNear = mutatorsAfter("dedup_neardup")
    // rollup config parsed ONCE; every malformed shape — unparseable
    // entries/SQL, duplicate measure names, keys colliding with the state
    // names the measures will generate — must fail HERE, before the shard
    // output commits, not in the post-write fold where each replay
    // re-fails and wedges the run mid-protocol. (Expressions are parsed
    // with CatalystSqlParser explicitly: Spark 4's functions.expr defers
    // parsing to analysis, so Try(expr(...)) alone accepts any garbage.)
    val rollupKeysV = kv.getOrElse("rollup.keys", "source")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val rollupSumMapV = parseSumMap(kv.getOrElse("rollup.sum_map", ""))
    val rollupUniqUpToV = parseUniqUpTo(kv.getOrElse("rollup.uniq_upto", ""))
    val rollupMeasureError: Option[String] =
      parseMeasures(kv.getOrElse("rollup.measures", "")) match {
        case Left(err) => Some(err)
        case _ if rollupSumMapV.isLeft => rollupSumMapV.swap.toOption
        case _ if rollupUniqUpToV.isLeft => rollupUniqUpToV.swap.toOption
        case Right(ms) =>
          val dups = ms.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }
          val unparseable = ms.filter(m => !measureSqlParses(m._2))
          // reserved names mirror partialStates' construction: only the
          // states THIS config actually generates (a store keyed on a
          // column literally named q_sketch is fine when no
          // rollup.quantile_column is set — over-reserving rejected it)
          val stateNames =
            (if (ms.isEmpty) Seq("sum_micros", "min_v", "max_v")
             else ms.flatMap(m =>
               Seq(s"${m._1}_sum_u", s"${m._1}_min", s"${m._1}_max"))) ++
              rollupSumMapV.getOrElse(Nil).map(sm => s"${sm._1}_summap") ++
              rollupUniqUpToV.toOption.flatten.map(u => s"uniq_upto_${u._2}_sk").toSeq ++
              (if (kv.getOrElse("rollup.distinct_column", "").nonEmpty)
                Seq("n_distinct_sk") else Nil) ++
              (if (kv.getOrElse("rollup.quantile_column", "").nonEmpty)
                Seq("q_sketch") else Nil) ++
              Seq("n")
          val collide = rollupKeysV.intersect(stateNames)
          if (dups.nonEmpty)
            Some(s"rollup.measures: duplicate measure name(s): ${dups.mkString(", ")}")
          else if (unparseable.nonEmpty)
            Some("rollup.measures: unparseable expression in " +
              unparseable.map(m => s"'${m._1}:${m._2}'").mkString(", "))
          else if (collide.nonEmpty)
            Some("rollup.keys collide with rollup state names: " +
              collide.mkString(", "))
          else None
      }
    if (kv.getOrElse("input.path", "").isEmpty) Left("input.path is required")
    else if (kv.getOrElse("output.path", "").isEmpty) Left("output.path is required")
    else if (steps.isEmpty) Left("steps is required (comma-separated)")
    else if (unknown.nonEmpty)
      Left(s"unknown steps: ${unknown.mkString(", ")} (known: ${Steps.keys.toSeq.sorted.mkString(", ")})")
    else if (mutatorsAfterSeen.nonEmpty)
      Left(s"text-mutating steps after dedup_seen (${mutatorsAfterSeen.mkString(", ")}) " +
        "would store hashes of rewritten text that can never match a future " +
        "shard's filter-time hashes — move them before dedup_seen")
    else if (steps.exists(Set("contamination_filter", "bloom_decontaminate")) &&
        kv.getOrElse("benchmark.path", "").isEmpty)
      Left("contamination_filter / bloom_decontaminate require benchmark.path")
    else if (steps.contains("dsir_filter") && kv.getOrElse("dsir.target_path", "").isEmpty)
      Left("dsir_filter requires dsir.target_path")
    else if (mutatorsAfterNear.nonEmpty)
      Left(s"text-mutating steps after dedup_neardup (${mutatorsAfterNear.mkString(", ")}) " +
        "would store shingles of rewritten text that can never match a future " +
        "shard's filter-time shingles — move them before dedup_neardup")
    else if (steps.contains("dedup_seen") && kv.getOrElse("seen_store.path", "").isEmpty)
      Left("dedup_seen requires seen_store.path")
    else if (steps.contains("dedup_neardup") && kv.getOrElse("neardup_store.path", "").isEmpty)
      Left("dedup_neardup requires neardup_store.path")
    else if (steps.contains("fingerprint_store") && kv.getOrElse("fingerprint_store.path", "").isEmpty)
      Left("fingerprint_store requires fingerprint_store.path")
    else if ((steps.contains("ann_index") || steps.contains("ann_query")) &&
        kv.getOrElse("ann_index.path", "").isEmpty)
      Left("ann_index / ann_query require ann_index.path")
    else if ((steps.contains("bm25_index") || steps.contains("bm25_query")) &&
        kv.getOrElse("bm25_index.path", "").isEmpty)
      Left("bm25_index / bm25_query require bm25_index.path")
    else if ((steps.contains("pq_index") || steps.contains("pq_query")) &&
        kv.getOrElse("pq_index.path", "").isEmpty)
      Left("pq_index / pq_query require pq_index.path")
    else if (!Seq("overwrite", "append", "rebalance").contains(
        kv.getOrElse("pq_index.mode", "overwrite")))
      Left(s"pq_index.mode must be overwrite, append or rebalance, " +
        s"got '${kv("pq_index.mode")}'")
    else if (kv.getOrElse("pq_index.mode", "") == "rebalance" &&
        kv.getOrElse("pq.rebalance_corpus.path", "").isEmpty)
      Left("pq_index.mode: rebalance requires pq.rebalance_corpus.path " +
        "(the index stores only codes — retraining needs the indexed vectors)")
    else if (!Seq("overwrite", "append").contains(
        kv.getOrElse("bm25_index.mode", "overwrite")))
      Left(s"bm25_index.mode must be overwrite or append, " +
        s"got '${kv("bm25_index.mode")}'")
    else if (!Seq("overwrite", "append", "rebalance").contains(
        kv.getOrElse("ann_index.mode", "overwrite")))
      Left(s"ann_index.mode must be overwrite, append or rebalance, " +
        s"got '${kv("ann_index.mode")}'")
    else if (steps.contains("compact") && Seq("seen_store.path",
        "neardup_store.path", "fingerprint_store.path", "ann_index.path",
        "bm25_index.path", "pq_index.path", "rollup_store.path")
        .forall(k => kv.getOrElse(k, "").isEmpty))
      Left("compact requires at least one store path to compact " +
        "(seen_store.path / neardup_store.path / fingerprint_store.path / " +
        "ann_index.path / bm25_index.path / pq_index.path / rollup_store.path)")
    else if (steps.contains("rollup") && kv.getOrElse("rollup_store.path", "").isEmpty)
      Left("rollup requires rollup_store.path")
    else if (steps.contains("rollup") && rollupMeasureError.nonEmpty)
      Left(rollupMeasureError.get)
    else if (steps.contains("rollup") && rollupKeysV.isEmpty)
      Left("rollup.keys must name at least one grouping column")
    else if (steps.contains("sample") && !kv.get("sample.fraction")
        .flatMap(_.toDoubleOption).exists(f => f > 0.0 && f <= 1.0))
      Left("sample requires sample.fraction in (0, 1]")
    else if (steps.contains("sample") && !kv.getOrElse("sample.offset", "0")
        .toDoubleOption.exists(o => o >= 0.0 &&
          o + kv.get("sample.fraction").flatMap(_.toDoubleOption).getOrElse(0.0) <= 1.0))
      Left("sample.offset must be >= 0 with offset + fraction <= 1")
    // an index build is POST-write while its probe executes in-plan
    // (pre-write): one run holding both would probe a missing/stale index,
    // and the post-write build would then run on the PROBE's output — which
    // has no text/vector column — and throw after the shard committed.
    // Two runs (build, then probe) is the supported shape.
    else if (steps.contains("bm25_index") && steps.contains("bm25_query"))
      Left("bm25_index (post-write build) and bm25_query (pre-write probe) " +
        "cannot share a run — build in one pipeline run, probe in the next")
    else if (steps.contains("ann_index") && steps.contains("ann_query"))
      Left("ann_index (post-write build) and ann_query (pre-write probe) " +
        "cannot share a run — build in one pipeline run, probe in the next")
    else if (steps.contains("pq_index") && steps.contains("pq_query"))
      Left("pq_index (post-write build) and pq_query (pre-write probe) " +
        "cannot share a run — build in one pipeline run, probe in the next")
    else if (steps.contains("bm25_query") && steps.last != "bm25_query")
      Left("bm25_query replaces the relation with (query_id, doc_id, rank, " +
        "score_u, n_hit_terms) — it must be the final step")
    else if (steps.contains("pq_query") && steps.last != "pq_query")
      Left("pq_query replaces the relation with (query_id, neighbor_id, cos, rank) " +
        "— it must be the final step")
    else if (steps.contains("ann_query") && steps.last != "ann_query")
      Left("ann_query replaces the relation with (query_id, neighbor_id, cos, rank) " +
        "and must be the final step")
    // copies must not feed a dedup/pack/text step: a dedup would collapse
    // them straight back, and pack's per-source running sum is only
    // deterministic over unique ids — only `split` (map-side on doc_id,
    // copies share their doc's label) may follow
    else if (steps.contains("upsample") &&
        steps.drop(steps.indexOf("upsample") + 1).exists(_ != "split"))
      Left("only split may follow upsample (replicated ids break dedup " +
        "and pack determinism) — move upsample to the end")
    // unimax replicates ids exactly like upsample — same ordering rule
    else if (steps.contains("unimax") &&
        steps.drop(steps.indexOf("unimax") + 1).exists(_ != "split"))
      Left("only split may follow unimax (replicated ids break dedup " +
        "and pack determinism) — move unimax to the end")
    else if (steps.contains("unimax") &&
        !kv.get("unimax.budget_tokens").flatMap(_.toLongOption).exists(_ > 0))
      Left("unimax requires unimax.budget_tokens (a positive long)")
    else if (steps.contains("unimax") &&
        !kv.get("unimax.epochs").flatMap(_.toLongOption).forall(_ >= 1))
      Left("unimax.epochs must be a positive integer (whole epochs cap)")
    else if (!kv.get("output.buckets").flatMap(_.toIntOption).forall(_ > 0))
      Left("output.buckets must be a positive integer")
    else if (kv.getOrElse("output.bucket_by", "").isEmpty &&
        kv.contains("output.buckets"))
      Left("output.buckets without output.bucket_by does nothing — set " +
        "output.bucket_by (the join key, e.g. doc_id) or drop output.buckets")
    else parseRates(kv.getOrElse("mix_rates", "")) match {
      case Left(err) => Left(err)
      case Right(rates) if steps.contains("mix") && rates.isEmpty =>
        Left("mix requires mix_rates (source:rate, comma-separated)")
      case Right(rates) =>
        parseUpsampleRates(kv.getOrElse("upsample_rates", "")) match {
          case Left(err) => Left(err)
          case Right(uRates) if steps.contains("upsample") && uRates.isEmpty =>
            Left("upsample requires upsample_rates (source:rate, comma-separated)")
          case Right(uRates) => Right(buildConfig(kv, steps, rates, uRates))
        }
    }
  }

  private def buildConfig(kv: Map[String, String], steps: Seq[String],
      rates: Map[String, Double],
      uRates: Map[String, Long] = Map.empty): PipelineConfig =
    PipelineConfig(
      inputDir = kv("input.path"),
      table = kv.getOrElse("input.table", "documents"),
      outputDir = kv("output.path"),
      steps = steps,
      qualityMin = kv.get("quality_min").flatMap(_.toDoubleOption).getOrElse(0.3),
      bigramMin = kv.get("bigram_min").flatMap(_.toDoubleOption).getOrElse(0.0),
      minhashThreshold = kv.get("minhash_threshold").flatMap(_.toDoubleOption).getOrElse(0.7),
      fuzzyPrefixLen = kv.get("fuzzy_prefix_len").flatMap(_.toIntOption).getOrElse(30),
      packBudget = kv.get("pack_budget").flatMap(_.toIntOption).getOrElse(512),
      testPct = kv.get("test_pct").flatMap(_.toIntOption).getOrElse(1),
      chunkOverlapMax = kv.get("chunk_overlap_max").flatMap(_.toDoubleOption).getOrElse(0.5),
      spanOverlapMax = kv.get("span_overlap_max").flatMap(_.toDoubleOption).getOrElse(0.5),
      benchmarkDir = kv.getOrElse("benchmark.path", ""),
      benchmarkTable = kv.getOrElse("benchmark.table", "documents"),
      mixRates = rates,
      seenStorePath = kv.getOrElse("seen_store.path", ""),
      nearDupStorePath = kv.getOrElse("neardup_store.path", ""),
      nearDupMinJaccard = kv.get("neardup_min_jaccard")
        .flatMap(_.toDoubleOption).getOrElse(0.8),
      fingerprintStorePath = kv.getOrElse("fingerprint_store.path", ""),
      shardIdOverride = kv.getOrElse("shard_id", ""),
      annIndexPath = kv.getOrElse("ann_index.path", ""),
      annIdCol = kv.getOrElse("ann.id_column", "vec_id"),
      annVecCol = kv.getOrElse("ann.vec_column", "embedding"),
      annCentroids = kv.get("ann.centroids").flatMap(_.toIntOption).getOrElse(16),
      annMode = kv.getOrElse("ann_index.mode", "overwrite"),
      pqIndexPath = kv.getOrElse("pq_index.path", ""),
      pqMode = kv.getOrElse("pq_index.mode", "overwrite"),
      pqM = kv.get("pq.m").flatMap(_.toIntOption).getOrElse(8),
      pqKCodes = kv.get("pq.k_codes").flatMap(_.toIntOption).getOrElse(32),
      annK = kv.get("ann.k").flatMap(_.toIntOption).getOrElse(10),
      annProbe = kv.get("ann.n_probe").flatMap(_.toIntOption).getOrElse(4),
      bm25IndexPath = kv.getOrElse("bm25_index.path", ""),
      bm25K = kv.get("bm25.k").flatMap(_.toIntOption).getOrElse(5),
      bm25Mode = kv.getOrElse("bm25_index.mode", "overwrite"),
      dataCardPath = kv.getOrElse("data_card.path", ""),
      dsirTargetDir = kv.getOrElse("dsir.target_path", ""),
      dsirTargetTable = kv.getOrElse("dsir.target_table", "documents"),
      dsirMinU = kv.get("dsir.min_u").flatMap(_.toLongOption).getOrElse(0L),
      pqRebalanceCorpusDir = kv.getOrElse("pq.rebalance_corpus.path", ""),
      pqRebalanceCorpusTable = kv.getOrElse("pq.rebalance_corpus.table", "embeddings"),
      upsampleRatesU = uRates,
      unimaxBudget = kv.get("unimax.budget_tokens").flatMap(_.toLongOption).getOrElse(0L),
      unimaxEpochs = kv.get("unimax.epochs").flatMap(_.toLongOption).getOrElse(1L),
      bucketBy = kv.getOrElse("output.bucket_by", ""),
      buckets = kv.get("output.buckets").flatMap(_.toIntOption).getOrElse(8),
      outputTable = kv.getOrElse("output.table", ""),
      sampleKeyCol = kv.getOrElse("sample.key_column", "doc_id"),
      sampleFraction = kv.get("sample.fraction").flatMap(_.toDoubleOption).getOrElse(0.0),
      sampleOffset = kv.get("sample.offset").flatMap(_.toDoubleOption).getOrElse(0.0),
      rollupStorePath = kv.getOrElse("rollup_store.path", ""),
      rollupKeys = kv.getOrElse("rollup.keys", "source")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      rollupValueCol = kv.getOrElse("rollup.value_column", "n_chars"),
      rollupMeasures = parseMeasures(kv.getOrElse("rollup.measures", ""))
        .getOrElse(Nil),
      rollupDistinctCol = kv.getOrElse("rollup.distinct_column", ""),
      rollupQuantileCol = kv.getOrElse("rollup.quantile_column", ""),
      rollupSumMap = parseSumMap(kv.getOrElse("rollup.sum_map", ""))
        .getOrElse(Nil),
      rollupUniqUpTo = parseUniqUpTo(kv.getOrElse("rollup.uniq_upto", ""))
        .toOption.flatten.orNull)

  /** `user_id:1000` → Right(Some((user_id, 1000))): the
    * `rollup.uniq_upto` entry — distinct column and cap. Strict. */
  private[cli] def parseUniqUpTo(s: String): Either[String, Option[(String, Int)]] = {
    if (s.trim.isEmpty) return Right(None)
    s.split(":").map(_.trim).toSeq match {
      case Seq(c, n) if c.nonEmpty && n.toIntOption.exists(_ >= 1) =>
        Right(Some((c, n.toInt)))
      case _ => Left(s"rollup.uniq_upto: entry '$s' must be column:N (N >= 1)")
    }
  }

  /** `by_lang:lang:n_chars,…` → Right(Seq((by_lang, lang, n_chars), …)):
    * the `rollup.sum_map` entries — map-state name, map key column, and
    * summed value column. Strict: a malformed entry fails the config. */
  private[cli] def parseSumMap(s: String): Either[String, Seq[(String, String, String)]] = {
    if (s.trim.isEmpty) return Right(Nil)
    val entries = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val parsed = entries.map { e => (e, e.split(":").map(_.trim).toSeq) }
    parsed.collectFirst {
      case (e, parts) if parts.length != 3 || parts.exists(_.isEmpty) =>
        s"rollup.sum_map: entry '$e' must be name:key_column:value_column"
    } match {
      case Some(err) => Left(err)
      case None =>
        val names = parsed.map(_._2.head)
        val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
        if (dups.nonEmpty)
          Left(s"rollup.sum_map: duplicate map name(s): ${dups.mkString(", ")}")
        else Right(parsed.map(p => (p._2(0), p._2(1), p._2(2))))
    }
  }

  private def measureSqlParses(e: String): Boolean =
    scala.util.Try(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(e)
    ).isSuccess

  /** `qty:n_tokens,score:n_chars*0.5` → Right(Seq(qty -> "n_tokens", …)):
    * the `rollup.measures` entries, TOP-LEVEL-comma separated (a comma
    * inside parentheses belongs to the measure's SQL expression) and
    * name:sql-expression split on the first colon. Strict like
    * [[parseRates]] — a malformed entry fails the whole config. */
  private[cli] def parseMeasures(s: String): Either[String, Seq[(String, String)]] = {
    if (s.trim.isEmpty) return Right(Nil)
    val entries = scala.collection.mutable.Buffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => entries += sb.toString; sb.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        sb += c
    }
    entries += sb.toString
    val parsed = entries.map(_.trim).filter(_.nonEmpty).map { e =>
      e.split(":", 2) match {
        case Array(k, v) if k.trim.nonEmpty && v.trim.nonEmpty =>
          Right(k.trim -> v.trim)
        case _ => Left(s"rollup.measures: expected name:expression, got '$e'")
      }
    }
    parsed.collectFirst { case Left(err) => err }
      .toLeft(parsed.collect { case Right(kv) => kv }.toSeq)
  }

  /** `web:0.25,news:1.0` → Right(Map(web -> 0.25, …)). Strict: a malformed
    * entry or a rate outside [0, 1] fails the whole config — silently
    * dropping `web:0.2five` would leave the dominant source unsampled. */
  private[cli] def parseRates(s: String): Either[String, Map[String, Double]] = {
    val entries = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val parsed = entries.map { e =>
      e.split(":", 2) match {
        case Array(k, v) => v.trim.toDoubleOption match {
          case Some(r) if r >= 0.0 && r <= 1.0 => Right(k.trim -> r)
          case Some(r) => Left(s"mix_rates: rate out of [0,1] for '$k': $r")
          case None => Left(s"mix_rates: unparseable rate in '$e'")
        }
        case _ => Left(s"mix_rates: expected source:rate, got '$e'")
      }
    }
    parsed.collectFirst { case Left(err) => err }
      .toLeft(parsed.collect { case Right(kv) => kv }.toMap)
  }

  /** `books:2.5,crawl:0.8` → Right(Map(books -> 2500000, …)) in exact
    * MICRO-UNITS (the [[graft.queries.CurationQueries.epochUpsample]]
    * contract). Unlike [[parseRates]], any rate >= 0 is legal — epoch
    * replication is the whole point — but a rate that would round to a
    * different micro-value than the user wrote (more than 6 decimals)
    * fails loudly rather than silently mis-replicating. */
  private[cli] def parseUpsampleRates(s: String): Either[String, Map[String, Long]] = {
    val entries = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val parsed = entries.map { e =>
      e.split(":", 2) match {
        case Array(k, v) => v.trim.toDoubleOption match {
          case Some(r) if r >= 0.0 =>
            val u = math.round(r * 1e6)
            if (math.abs(u - r * 1e6) > 1e-3)
              Left(s"upsample_rates: '$k' rate $r has sub-micro precision " +
                "(max 6 decimals)")
            else Right(k.trim -> u)
          case Some(r) => Left(s"upsample_rates: negative rate for '$k': $r")
          case None => Left(s"upsample_rates: unparseable rate in '$e'")
        }
        case _ => Left(s"upsample_rates: expected source:rate, got '$e'")
      }
    }
    parsed.collectFirst { case Left(err) => err }
      .toLeft(parsed.collect { case Right(kv) => kv }.toMap)
  }

  /** Step registry: name → (config, frame) → frame. */
  val Steps: Map[String, (PipelineConfig, DataFrame) => DataFrame] = Map(
    "strip_html" -> ((_, df) =>
      df.withColumn("text", TextAnalysis.stripHtml(col("text")))),
    "normalize" -> ((_, df) =>
      df.withColumn("text", TextAnalysis.normalize(col("text")))),
    "redact" -> ((_, df) =>
      df.withColumn("text", TextAnalysis.redactPii(col("text")))),
    "dedup_exact" -> ((_, df) =>
      Dedup.dropExact(df, "text", "doc_id")),
    // incremental exact dedup (the q88 primitive): drop docs whose content
    // hash is in the persisted seen-hash store at seen_store.path. The
    // store UPDATE (fold this run's survivors in) happens in run() AFTER
    // the output write commits — crash in between = the shard replays and
    // the already-seen rows fall out again (at-least-once safe).
    "dedup_seen" -> ((c, df) =>
      graft.dedup.SeenStore.filter(df.sparkSession, c.seenStorePath, df, "text")),
    // incremental NEAR-dup dedup (the q100 primitive): drop docs with a
    // verified shingle-Jaccard >= neardup_min_jaccard near-dup among the
    // docs of prior shards. Store update is post-write in run(), same
    // at-least-once protocol as dedup_seen.
    "dedup_neardup" -> ((c, df) =>
      graft.dedup.NearDupStore.filterNew(df.sparkSession, c.nearDupStorePath,
        df, "text", "doc_id", c.nearDupMinJaccard)),
    // per-source fingerprint-store maintenance: no transform at plan time —
    // run() folds byPartition(output) into fingerprint_store.path after the
    // write, giving downstream reconciles an O(delta) per-source (rows, fp)
    // inventory of everything this pipeline has shipped.
    "fingerprint_store" -> ((_, df) => df),
    // IVF ANN index build: post-write maintenance like fingerprint_store
    // (no transform at plan time) — run() builds the persisted index at
    // ann_index.path over the WRITTEN relation's ann.vec_column, so the
    // index always describes exactly what the pipeline shipped.
    "ann_index" -> ((_, df) => df),
    // persisted inverted index over the WRITTEN relation's (doc_id, text)
    // — post-write build like ann_index/fingerprint_store; no-op here.
    // bm25_index.mode: overwrite (default, full rebuild) or append (fold
    // the shipped shard in at O(shard) — replay-guarded by shard_id,
    // probe-identical to a rebuild; see Retrieval.appendBm25Index)
    "bm25_index" -> ((_, df) => df),
    // small-file maintenance for every CONFIGURED persisted store (seen,
    // fingerprint, IVF, BM25 postings): read-coalesce-atomic-swap after
    // the run's own store updates, so repeated appends don't accumulate
    // files indefinitely. No plan-time transform.
    "compact" -> ((_, df) => df),
    // deterministic hash sample (q157's operator, production xxhash64
    // family): a pure key-hash interval predicate — map-only, stable
    // under replay (a re-run of the shard keeps exactly the same rows,
    // so the shard-replay protocol's "re-run recomputes the identical
    // output" invariant holds through this step too)
    "sample" -> ((c, df) =>
      graft.operators.Sample(df, c.sampleKeyCol, c.sampleFraction, c.sampleOffset)),
    // incremental rollup maintenance (q156's AggStore): post-write like
    // fingerprint_store — no plan-time transform; run() folds the
    // written shard's partial aggregate states into rollup_store.path
    "rollup" -> ((_, df) => df),
    // BM25 probe: the input relation IS the (query_id, term) set; the step
    // replaces it with the top-k result — config requires it to be last
    "bm25_query" -> ((c, df) =>
      graft.text.Retrieval.queryBm25Index(df.sparkSession, c.bm25IndexPath,
        df, c.bm25K)),
    // IVF ANN probe: the input relation IS the query set (ann.id_column +
    // ann.vec_column); the step replaces it with the top-k result
    // (query_id, neighbor_id, cos, rank) — config requires it to be last.
    "ann_query" -> ((c, df) =>
      graft.sim.Similarity.queryIvfIndex(df.sparkSession, c.annIndexPath,
        df, c.annIdCol, c.annVecCol, c.annK, c.annProbe)),
    // persisted PQ index over the WRITTEN relation's vectors — post-write
    // build like ann_index (no-op at plan time); pq_query ADC-probes it
    "pq_index" -> ((_, df) => df),
    "pq_query" -> ((c, df) =>
      graft.sim.Similarity.queryPqIndex(df.sparkSession, c.pqIndexPath,
        df, c.annIdCol, c.annVecCol, c.annK)),
    "dedup_minhash" -> ((c, df) => {
      val losers = Dedup.minhashPairs(df, "text", "doc_id", threshold = c.minhashThreshold)
        .select(col("id_b").as("doc_id")).distinct()
      df.join(losers, Seq("doc_id"), "left_anti")
    }),
    // containment dedup (q128's miner as a step): when a doc's shingle
    // set is ≥90% contained in another's, the CONTAINED doc is redundant
    // (its content ships inside the container) and drops; mutual
    // containment (near-exact pair) keeps the smaller id. Catches the
    // verbatim-embedding duplication Jaccard-banded dedup_minhash
    // structurally misses — run BOTH: they prune different graphs.
    // typo-level fuzzy dedup (q131's blocked edit-distance join as a
    // step): docs whose lowercased fuzzy_prefix_len-char prefix is within
    // levenshtein distance 1 of an earlier doc's drop — id_b > id_a in
    // every emitted pair, so "keep the smallest id of each fuzzy clique"
    // is one anti-join. Catches the one-keystroke title/boilerplate
    // variants whose SHINGLE similarity collapses (FuzzyJoin scaladoc) —
    // a different graph from dedup_minhash and dedup_containment.
    "dedup_fuzzy" -> ((c, df) => {
      val losers = graft.dedup.FuzzyJoin
        .fuzzyPrefixPairs(df, c.fuzzyPrefixLen)
        .select(col("id_b").as("doc_id")).distinct()
      df.join(losers, Seq("doc_id"), "left_anti")
    }),
    "dedup_containment" -> ((_, df) => {
      val pairs = Dedup.containmentPairs(df, "text", "doc_id")
      val losers = pairs.select(
          // a contained (cont ≥ bar) side loses; if both are contained
          // (mutual ≈ exact dup) the LARGER id loses, the dedup_exact tie
          when(col("cont_a_u") >= 900000L && col("cont_b_u") >= 900000L,
            greatest(col("id_a"), col("id_b")))
            .when(col("cont_a_u") >= 900000L, col("id_a"))
            .otherwise(col("id_b")).as("doc_id"))
        .distinct()
      df.join(losers, Seq("doc_id"), "left_anti")
    }),
    // quality-keeper near-dedup (the q106 shape as a step): connected
    // components of the verified near-dup graph at minhash_threshold,
    // keep the BEST-QUALITY member of each component (ties to min id),
    // drop the rest — dedup_minhash's "larger id loses" replaced by the
    // choice production pipelines actually make. Docs in no component
    // pass through untouched.
    "dedup_cluster_keeper" -> ((c, df) => {
      val edges = Dedup.verifiedNearDupPairs(df, "text", "doc_id",
          minJaccard = c.minhashThreshold)
        .select("id_a", "id_b")
      val scored = Dedup.duplicateClusters(edges)
        .join(df.select(col("doc_id").as("id"),
          TextAnalysis.qualityScore(col("text")).as("__q")), "id")
      val keepers = scored.groupBy("cluster_id")
        .agg(max(struct(col("__q"), (-col("id")).as("nid"))).as("best"))
        .select((-col("best.nid")).as("keeper_id"))
      val losers = scored.select(col("id").as("doc_id"))
        .join(keepers, col("doc_id") === col("keeper_id"), "left_anti")
      df.join(losers.select("doc_id"), Seq("doc_id"), "left_anti")
    }),
    "quality_filter" -> ((c, df) =>
      df.filter(TextAnalysis.qualityScore(col("text")) >= c.qualityMin)),
    "gopher_filter" -> ((_, df) =>
      df.filter(TextAnalysis.gopherRules(col("text")).getField("keep"))),
    // C4 battery applied (q118): line rules rewrite text in place, page
    // rules drop the doc. One struct evaluation per row (computed once
    // into a column, not once per consumer).
    "c4_clean" -> ((_, df) =>
      df.withColumn("__c4", TextAnalysis.c4Rules(col("text")))
        .filter(col("__c4.keep"))
        .withColumn("text", col("__c4.clean_text"))
        .drop("__c4")),
    // DSIR importance selection (q119): keep docs scoring >= dsir.min_u
    // against the target corpus's hashed-bigram model. Both models are
    // 256-row broadcasts; the semi-join moves only doc ids. Unscorable
    // docs (< 2 tokens, no bigrams) drop — the bigram_filter discipline
    // (run a length filter first if they should survive).
    "dsir_filter" -> ((c, df) => {
      val target = graft.core.Tables.load(df.sparkSession,
        c.dsirTargetDir, c.dsirTargetTable)
      val keep = graft.text.Dsir.dsirWeights(df, target, "text", "doc_id")
        .filter(col("dsir_u") >= c.dsirMinU)
        .select("doc_id")
      df.join(keep, Seq("doc_id"), "left_semi")
    }),
    // post-write corpus report (q107 shape) — no transform at plan time
    "data_card" -> ((_, df) => df),
    // statistical-LM coherence filter (q90's score as a step): keep docs
    // whose mean corpus-bigram probability reaches bigram_min — the
    // integer-sum comparison sum_cab >= min*sum_ca avoids the quantised
    // ratio. Unscorable docs (< 2 tokens, no bigrams) DROP: a sequence
    // filter has nothing to vouch for them (run an explicit length filter
    // first if empty/one-token docs should survive).
    "bigram_filter" -> ((c, df) => {
      val keep = TextAnalysis.bigramStats(df, "text", "doc_id")
        .filter(col("sum_cab") >= lit(c.bigramMin) * col("sum_ca"))
        .select("doc_id")
      df.join(keep, Seq("doc_id"), "left_semi")
    }),
    // boilerplate-dominance filter (q80's score as a step): drop every doc
    // whose CDC-chunk shared fraction exceeds chunk_overlap_max. NOTE this
    // is a dominance filter (both members of a full-copy pair score ~1 and
    // both drop) — use dedup_exact/dedup_minhash first for pair dedup.
    "dedup_chunks" -> ((c, df) => {
      val dominated = Dedup.chunkSharedCounts(df, "doc_id", "text")
        .filter(col("n_shared") > lit(c.chunkOverlapMax) * col("n_chunks"))
        .select("doc_id")
      df.join(dominated, Seq("doc_id"), "left_anti")
    }),
    // duplicate-span REMOVAL (q93's transform as a step): replace text
    // with its span-stripped form; docs whose text empties out entirely
    // survive (a later quality/length filter is the right dropper — the
    // paper's own recipe). Precondition: doc_id unique where non-null
    // (a duplicated id would fan out through the join — run dedup_exact
    // first). NULL-id rows keep their ORIGINAL text: removeDuplicateSpans
    // excludes them by contract, so the join misses and the coalesce
    // passes them through unchanged — matching the filter-shaped steps
    // (dedup_spans/dedup_chunks), which also leave such rows alone.
    "strip_dup_spans" -> ((c, df) => {
      val cleaned = Dedup.removeDuplicateSpans(df, "doc_id", "text")
        .select(col("doc_id"), col("clean_text"))
      df.join(cleaned, Seq("doc_id"), "left")
        .withColumn("text",
          when(col("doc_id").isNotNull, col("clean_text")).otherwise(col("text")))
        .drop("clean_text")
    }),

    // CCNet paragraph dedup (q117's transform as a step): every line
    // keeps its corpus-first occurrence; later boilerplate copies vanish
    // in place. Text-MUTATING (the dedup_seen/neardup ordering guard
    // applies); same NULL-id passthrough contract as strip_dup_spans.
    "strip_dup_lines" -> ((c, df) => {
      val cleaned = Dedup.removeDuplicateLines(df, "doc_id", "text")
        .select(col("doc_id"), col("clean_text"))
      df.join(cleaned, Seq("doc_id"), "left")
        .withColumn("text",
          when(col("doc_id").isNotNull, col("clean_text")).otherwise(col("text")))
        .drop("clean_text")
    }),

    // duplicate-SPAN dominance filter (q92's counters as a step): drop
    // every doc whose cross-doc shared-window fraction exceeds
    // span_overlap_max. Same dominance caveat as dedup_chunks (both
    // members of a full-copy pair drop) — pair dedup first if needed.
    "dedup_spans" -> ((c, df) => {
      val dominated = Dedup.duplicateSpanStats(df, "doc_id", "text")
        .filter(col("n_xdoc_windows") > lit(c.spanOverlapMax) * col("n_windows"))
        .select("doc_id")
      df.join(dominated, Seq("doc_id"), "left_anti")
    }),

    // drop docs sharing any 3-gram shingle with the held-out benchmark set
    // (q60's check as a filter; the benchmark side is tiny -> broadcast)
    "contamination_filter" -> ((c, df) => {
      val bench = graft.core.Tables.load(df.sparkSession, c.benchmarkDir, c.benchmarkTable)
        .select(explode(array_distinct(Dedup.wordShingles(col("text"), 3))).as("s"))
        .distinct()
      val hit = df.select(col("doc_id"),
          explode(array_distinct(Dedup.wordShingles(col("text"), 3))).as("s"))
        .join(broadcast(bench), "s")
        .select("doc_id").distinct()
      df.join(hit, Seq("doc_id"), "left_anti")
    }),

    // contamination_filter at fixed broadcast cost: the benchmark side
    // collapses to a 64 KiB Bloom bitmap (no distinct needed — bit_or is
    // idempotent, so the bitmap build is one aggregate over raw shingle
    // hashes), and the probe side needs no per-doc distinct either (any
    // hit flags the doc). False positives (~(1-e^(-2n/m))^2) drop a few
    // extra docs — conservative for decontamination; q124 gates the
    // bit-level math against DuckDB.
    "bloom_decontaminate" -> ((c, df) => {
      val bench = graft.core.Tables.load(df.sparkSession, c.benchmarkDir, c.benchmarkTable)
        .select(explode(Dedup.wordShingles(col("text"), 3)).as("s"))
        .select(Dedup.portableHash(col("s")).as("h"))
      val hit = graft.dedup.Bloom.probe(
          df.select(col("doc_id"),
              explode(Dedup.wordShingles(col("text"), 3)).as("s"))
            .select(col("doc_id"), Dedup.portableHash(col("s")).as("h")),
          "h", graft.dedup.Bloom.bitmap(bench, "h"))
        .filter(col("bloom_hit")).select("doc_id").distinct()
      df.join(hit, Seq("doc_id"), "left_anti")
    }),
    // deterministic source mixing: keep each source at its configured rate
    // (training-mixture reweighting). Sources not named keep rate 1.0.
    // The acceptance hash is SALTED ("mix") so it is independent of the
    // split/sample Knuth hash — reusing split's hash would make every
    // mix-survivor land in the low buckets that `split` labels test/val
    // (a 2% mix rate would leave the source with ZERO train docs).
    // Deterministic under reruns and appends. Map-only.
    "mix" -> ((c, df) => {
      val rate = c.mixRates.foldLeft(lit(1.0)) {
        case (acc, (src, r)) => when(col("source") === src, lit(r)).otherwise(acc)
      }
      df.filter(pmod(xxhash64(col("doc_id"), lit("mix")), lit(1000)) < rate * 1000)
    }),
    // epoch replication (q121's operator as a step): floor(r) copies per
    // doc + a deterministic fractional-hash extra, each tagged copy_idx.
    // Null-id docs drop (no stable replication key); config-time ordering
    // guard keeps dedup/pack from ever seeing replicated ids.
    "upsample" -> ((c, df) =>
      graft.queries.CurationQueries.epochUpsample(
          df.filter(col("doc_id").isNotNull), c.upsampleRatesU)
        .drop("n_copies")),
    // UniMax (q123's planner as a step): compute the epoch-capped uniform
    // allocation over `unimax.budget_tokens`, then apply each source's
    // epochs_u rate through the same exact-arithmetic replicator upsample
    // uses (rates under 1e6 downsample, over 1e6 replicate — unimax
    // subsumes both halves from one budget number). The per-source rate
    // table is a |sources|-bounded driver action at plan-composition time
    // (the mix_temperature precedent); a NULL source's rate rides the
    // default slot (an equality fold cannot match NULL).
    "unimax" -> ((c, df) => {
      import graft.queries.CurationQueries
      val ids = df.filter(col("doc_id").isNotNull)
      val alloc = CurationQueries.unimaxAlloc(
          ids.groupBy("source").agg(coalesce(sum(when(col("text").isNotNull,
            graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))), lit(0L))
            .as("n_tokens")),
          c.unimaxBudget, c.unimaxEpochs)
        .select(col("source"), col("epochs_u")).collect() // |sources| rows
      val rates = alloc.filter(!_.isNullAt(0))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nullRate = alloc.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse(1000000L)
      CurationQueries.epochUpsample(ids, rates, defaultRateU = nullRate)
        .drop("n_copies")
    }),
    // temperature-based source mixing (q115's recipe as a step, XLM-R
    // α = 0.5): each source keeps rate √(n_ref/n_s) with n_ref the
    // smallest source — the tempered-mass profile multilingual corpora
    // sample with. α pinned at 0.5 (sqrt is IEEE-exact; a general pow is
    // not engine-portable). The per-source size aggregate is a bounded
    // driver action at plan-composition time (|sources| rows — the
    // dedup_seen store read precedent); the keep decision is map-side
    // Knuth-hash arithmetic salted independently of split/mix.
    "mix_temperature" -> ((_, df) => {
      val sizes = df.groupBy("source").agg(count(lit(1)).as("__n"))
      val nRef = sizes.agg(min("__n")).head().getLong(0)
      val rated = sizes.withColumn("__rate_u",
          floor(lit(1e6) * sqrt(lit(nRef.toDouble) / col("__n").cast("double")))
            .cast("long"))
        .select(col("source").as("__m_source"), col("__rate_u"))
      df.join(broadcast(rated), col("source") <=> col("__m_source"))
        .filter(pmod(pmod(col("doc_id"), lit(999983L)) * lit(2654435761L)
            + lit(7L), lit(1000000L))
          < col("__rate_u"))
        .drop("__m_source", "__rate_u")
    }),
    "split" -> ((c, df) =>
      df.withColumn("split", {
        val b = CurationQueries.knuthBucket(col("doc_id"), 1000)
        when(b < c.testPct * 10, "test")
          .when(b < c.testPct * 20, "val")
          .otherwise("train")
      })),
    // two-level (source, shard) offsets — one giant source cannot become
    // a single-task sort (CurationQueries.packIds, q58's shape)
    "pack" -> ((c, df) =>
      CurationQueries.packIds(
        df.withColumn("__n_tokens", TextAnalysis.tokenCount(col("text")).cast("long")),
        "source", "doc_id", "__n_tokens", c.packBudget)
        .drop("__n_tokens")))

  /** Compose the configured steps over the input table (lazy — one plan). */
  def plan(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    cfg.steps.foldLeft(graft.core.Tables.load(spark, cfg.inputDir, cfg.table)) {
      (df, s) => Steps(s)(cfg, df)
    }

  /** Run the pipeline and write split-partitioned shards. Returns
    * (rows in, rows out).
    *
    * Shard-replay protocol (every store step is guarded by `cfg.shardId`,
    * default the input path):
    *  1. A shard already recorded in the SEEN store short-circuits the
    *     WHOLE run — its hashes are all "seen", so re-filtering would emit
    *     an empty relation and clobber the shard's committed output.
    *  2. Otherwise: write output, THEN fold fingerprints (in-store
    *     shard-id guard makes it idempotent), THEN update the seen store
    *     (which also records the shard id). A crash before the seen
    *     update replays with the seen store unchanged, so the re-run
    *     recomputes the identical output and the fingerprint fold skips;
    *     a crash after it short-circuits at step 1. Either way the stores
    *     never record rows the output does not hold, and no committed
    *     output is ever destroyed. */
  def run(spark: SparkSession, cfg: PipelineConfig): (Long, Long) = {
    val in = graft.core.Tables.load(spark, cfg.inputDir, cfg.table).count()
    // a shard recorded in ANY incremental store must not re-filter: its
    // own hashes/shingles are now "seen", so the re-run would emit an
    // empty relation and clobber the committed output. With BOTH stores
    // configured, a crash between their two post-write updates leaves the
    // shard recorded in one only — the short-circuit path heals the other
    // from the committed output (update() is a no-op where recorded).
    val seenRecorded = cfg.steps.contains("dedup_seen") &&
      graft.dedup.SeenStore.processedShards(spark, cfg.seenStorePath)
        .contains(cfg.shardId)
    val nearRecorded = cfg.steps.contains("dedup_neardup") &&
      graft.dedup.NearDupStore.processedShards(spark, cfg.nearDupStorePath)
        .contains(cfg.shardId)
    if (seenRecorded || nearRecorded) {
      // the short-circuit reports the COMMITTED output's row count; if the
      // output was relocated/cleaned (or the caller pointed a replay at a
      // fresh outputDir), reading it would throw a bare AnalysisException —
      // fail with a diagnosable message instead
      if (!graft.core.Fs.exists(spark, cfg.outputDir))
        throw new IllegalStateException(
          s"[$Name] shard ${cfg.shardId} is recorded in an incremental " +
            s"dedup store, but its output ${cfg.outputDir} is missing. " +
            "Restore the output, point output.path at the committed shard, or " +
            "pass a new shard_id to reprocess as a fresh shard.")
      System.err.println(s"[$Name] shard ${cfg.shardId} already processed — skipping")
      val committed = readCommitted(spark, cfg)
      // the short-circuit must still run EVERY idempotent post-write
      // maintenance step against the committed output (round-6 advice #1):
      // a crash after the dedup-store update but before the later folds
      // would otherwise leave the shard permanently missing from the
      // indexes/fingerprints/card — the appends' own shard-id guards make
      // healed-already cases a no-op, so replaying them here is free.
      postWrite(spark, cfg, committed)
      return (in, committed.count())
    }
    val out = plan(spark, cfg)
    if (cfg.bucketBy.isEmpty) {
      val writer = out.write.mode("overwrite")
      (if (cfg.steps.contains("split")) writer.partitionBy("split") else writer)
        .parquet(cfg.outputDir)
    } else {
      // BUCKETED shard layout (round-8 verdict task #2): the output lands
      // as a session-catalog table CLUSTERED BY the join key, so every
      // downstream join-back on that key — snapshot diffs, store-probe
      // joins, q16-class fact⋈fact aggregates — reads the corpus
      // PRE-PLACED and plans with zero Exchange on this side (q147
      // demonstrates the join; GraftPipelineSpec asserts it on a real
      // pipeline output). At 100 TB this removes the single largest
      // recurring shuffle in the x10/x30 trend's non-codec rows: the
      // corpus re-partition that every post-ingest join used to pay.
      // The explicit repartition pins one file per (split ×) bucket —
      // without it every writer task emits its own file per bucket
      // (tasks × buckets slivers, the BM25 postings lesson).
      val writer = out.repartition(cfg.buckets, col(cfg.bucketBy))
        .write.mode("overwrite")
        .format("parquet").option("path", cfg.outputDir)
        .bucketBy(cfg.buckets, cfg.bucketBy).sortBy(cfg.bucketBy)
      (if (cfg.steps.contains("split")) writer.partitionBy("split") else writer)
        .saveAsTable(cfg.tableName)
    }
    val written = readCommitted(spark, cfg)
    postWrite(spark, cfg, written)
    (in, written.count())
  }

  /** The committed output relation. Bucketed outputs read through the
    * session catalog so consumers inherit the bucketing metadata (a plain
    * `spark.read.parquet` of the same files would silently drop it and
    * re-shuffle on the next join); a fresh session replaying a bucketed
    * shard whose table registration is gone falls back to the files —
    * correct rows, bucketing ignored (re-register or re-run to restore). */
  private def readCommitted(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    if (cfg.bucketBy.nonEmpty && spark.catalog.tableExists(cfg.tableName))
      spark.table(cfg.tableName)
    else spark.read.parquet(cfg.outputDir)

  /** Every post-write maintenance step, each idempotent per shard id (or
    * a pure function of the committed output), so [[run]] can execute the
    * same sequence on the first pass AND on a replay short-circuit — a
    * crash between any two of these heals on the next run. */
  private def postWrite(spark: SparkSession, cfg: PipelineConfig,
      written: DataFrame): Unit = {
    if (cfg.steps.contains("fingerprint_store")) {
      graft.fp.FingerprintStore.fold(spark, cfg.fingerprintStorePath,
        cfg.shardId, written, Seq("source" -> col("source")),
        Seq(col("doc_id"), col("text"), col("source")))
    }
    if (cfg.steps.contains("rollup")) {
      // partial states of the COMMITTED output (pure function of it, like
      // the card) — shard-id-guarded in-store, so the replay
      // short-circuit heals a crash between the write and this fold
      val dc = if (cfg.rollupDistinctCol.nonEmpty) cfg.rollupDistinctCol else null
      val qc = if (cfg.rollupQuantileCol.nonEmpty) cfg.rollupQuantileCol else null
      val sm = cfg.rollupSumMap.map { case (nm, k, v) => (nm, col(k), col(v)) }
      if (cfg.rollupMeasures.nonEmpty)
        graft.agg.AggStore.appendMeasures(spark, cfg.rollupStorePath, written,
          cfg.rollupKeys,
          cfg.rollupMeasures.map { case (nm, e) => nm -> expr(e) },
          cfg.shardId, distinctCol = dc, quantileCol = qc, sumMap = sm,
          uniqUpTo = cfg.rollupUniqUpTo)
      else
        graft.agg.AggStore.append(spark, cfg.rollupStorePath, written,
          cfg.rollupKeys, cfg.rollupValueCol, cfg.shardId,
          distinctCol = dc, quantileCol = qc, sumMap = sm,
          uniqUpTo = cfg.rollupUniqUpTo)
    }
    if (cfg.steps.contains("dedup_seen"))
      graft.dedup.SeenStore.update(spark, cfg.seenStorePath, written, "text", cfg.shardId)
    if (cfg.steps.contains("dedup_neardup"))
      graft.dedup.NearDupStore.update(spark, cfg.nearDupStorePath,
        written, "text", "doc_id", cfg.shardId)
    if (cfg.steps.contains("ann_index")) {
      val hasIndex = graft.core.Fs.exists(spark, s"${cfg.annIndexPath}/meta")
      if (cfg.annMode != "overwrite" && hasIndex) {
        graft.sim.Similarity.appendIvfIndex(written, cfg.annIdCol,
          cfg.annVecCol, cfg.annIndexPath, cfg.shardId)
        // rebalance: fold the shard in (replay-guarded), then retrain on
        // the index's own vectors and flip generations — the drift
        // maintenance a frozen-centroid deployment schedules periodically
        if (cfg.annMode == "rebalance")
          graft.sim.Similarity.rebalanceIvfIndex(spark, cfg.annIndexPath,
            cfg.annCentroids)
      } else // overwrite, or the very first shard (nothing to fold into)
        graft.sim.Similarity.buildIvfIndex(written, cfg.annIdCol, cfg.annVecCol,
          cfg.annIndexPath, cfg.annCentroids, shardId = cfg.shardId)
    }
    if (cfg.steps.contains("pq_index")) {
      val hasPq = graft.core.Fs.exists(spark, s"${cfg.pqIndexPath}/meta")
      if (cfg.pqMode != "overwrite" && hasPq) {
        graft.sim.Similarity.appendPqIndex(written, cfg.annIdCol,
          cfg.annVecCol, cfg.pqIndexPath, cfg.shardId)
        // rebalance: fold the shard in (replay-guarded), then retrain the
        // codebooks on the ACCUMULATED corpus (the index stores only
        // codes, so the vectors come from pq.rebalance_corpus.path) and
        // flip generations — the drift maintenance of the IVF form
        if (cfg.pqMode == "rebalance")
          graft.sim.Similarity.rebalancePqIndex(
            graft.core.Tables.load(spark, cfg.pqRebalanceCorpusDir,
              cfg.pqRebalanceCorpusTable),
            cfg.annIdCol, cfg.annVecCol, cfg.pqIndexPath,
            cfg.pqM, cfg.pqKCodes)
      } else // overwrite, or the very first shard (nothing to fold into)
        graft.sim.Similarity.buildPqIndex(written, cfg.annIdCol,
          cfg.annVecCol, cfg.pqIndexPath, cfg.pqM, cfg.pqKCodes,
          lloydIters = 1, shardId = cfg.shardId)
    }
    if (cfg.steps.contains("bm25_index")) {
      if (cfg.bm25Mode == "append" &&
          graft.core.Fs.exists(spark, s"${cfg.bm25IndexPath}/meta"))
        graft.text.Retrieval.appendBm25Index(written, "text", "doc_id",
          cfg.bm25IndexPath, cfg.shardId)
      else // overwrite, or append's very first shard (nothing to fold into)
        graft.text.Retrieval.buildBm25Index(written, "text", "doc_id",
          cfg.bm25IndexPath, shardId = cfg.shardId)
    }
    if (cfg.steps.contains("data_card")) {
      val card = written
        .select(col("source"), col("lang"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nt"),
          round(TextAnalysis.qualityScore(col("text")) * 10).cast("long").as("q10"),
          TextAnalysis.gopherRules(col("text")).getField("keep").as("gk"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_chars_total"),
          sum("nt").as("n_tokens_total"),
          countDistinct("lang").as("n_langs"),
          sum("q10").as("quality_decisum"),
          sum(when(col("gk"), 1L).otherwise(0L)).as("n_gopher_keep"))
        .coalesce(1) // per-source rows: tiny by construction
      // atomic replace (round-6 advice #5): a crash mid-write must never
      // leave a torn card, and — the card being a pure function of the
      // committed output — the replay short-circuit re-derives it here
      graft.core.AtomicStore.replace(spark, cfg.cardPath, card)
    }
    if (cfg.steps.contains("compact")) {
      if (cfg.seenStorePath.nonEmpty)
        graft.dedup.SeenStore.compact(spark, cfg.seenStorePath)
      if (cfg.nearDupStorePath.nonEmpty)
        graft.dedup.NearDupStore.compact(spark, cfg.nearDupStorePath)
      if (cfg.fingerprintStorePath.nonEmpty)
        graft.core.AtomicStore.compact(spark, cfg.fingerprintStorePath)
      if (cfg.annIndexPath.nonEmpty && graft.core.Fs.exists(spark, cfg.annIndexPath))
        graft.sim.Similarity.compactIvfIndex(spark, cfg.annIndexPath)
      if (cfg.pqIndexPath.nonEmpty &&
          graft.core.Fs.exists(spark, s"${cfg.pqIndexPath}/meta"))
        graft.sim.Similarity.compactPqIndex(spark, cfg.pqIndexPath)
      if (cfg.bm25IndexPath.nonEmpty &&
          graft.core.Fs.exists(spark, s"${cfg.bm25IndexPath}/meta"))
        graft.text.Retrieval.compactBm25Index(spark, cfg.bm25IndexPath)
      if (cfg.rollupStorePath.nonEmpty)
        graft.agg.AggStore.compact(spark, cfg.rollupStorePath)
    }
  }

  def main(args: Array[String]): Unit = {
    val cfgIdx = args.indexOf("--config")
    if (cfgIdx < 0 || cfgIdx + 1 >= args.length) {
      System.err.println(s"$Name: usage: --config <pipeline.yaml>")
      sys.exit(2)
    }
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(cfgIdx + 1))),
      java.nio.charset.StandardCharsets.UTF_8)
    fromKv(YamlConfig.parse(text)) match {
      case Left(err) =>
        System.err.println(s"$Name: $err"); sys.exit(2)
      case Right(cfg) =>
        val spark = graft.core.GraftSession.local()
        val (nIn, nOut) = run(spark, cfg)
        println(s"[$Name] ${cfg.steps.mkString(" -> ")}: $nIn rows in, $nOut out -> ${cfg.outputDir}")
    }
  }
}
