package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full materialisation through the noop sink
  * (unlike count(), noop cannot let Catalyst prune the computed columns),
  * and prints the one-line JSON the driver records as BENCH_r{N}.json.
  *
  * Robustness (round-1 post-mortem): the JSON line is ALSO written to
  * tmp/bench_latest.json so the artifact survives even if stdout capture
  * fails again. Each query runs three times, but the repetitions are
  * interleaved round-robin across the WHOLE catalog (pass 1 of every query,
  * then pass 2, then pass 3) rather than back-to-back: this VM shows
  * multi-minute host memory-compaction stall windows, and three consecutive
  * runs of one query all land inside such a window (round-3 post-mortem:
  * q79 recorded 25.3 s vs a quiet-window 2.31 s). Spread over ~50 s passes,
  * a stall inflates each query at most once, which min-of-3 then discards.
  * Both min and median are reported so a reader can tell residual noise
  * (median >> min on one query) from a real regression (min itself moved).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    // measurement knob: SPARK_GRAFT_AQE=0 disables adaptive execution for
    // the session (runtime-settable), to quantify AQE's per-exchange
    // stage-job dispatch against gate-scale inputs
    if (sys.env.get("SPARK_GRAFT_AQE").contains("0"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen + file listing, outside the timed region
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def once(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name // a broken query must not masquerade as a fast one
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // optional args: query-name substrings to run (iteration aid)
    val wanted = args.toSeq
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
    // pass 0 (round-4 verdict #4): one UNTIMED full-catalog pass, so the
    // three timed passes all run against warm per-query codegen/JIT — the
    // entry-query warm-up above covers session setup but not each query's
    // own generated code (r4: q74 pass-1 9.5 s vs 1.1 s warm). Discarded.
    catalog.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () } // timed passes record the failure
    }
    // Three interleaved passes over the whole catalog (see scaladoc): a
    // sustained VM stall poisons at most one pass of each query, never all
    // three repetitions of the same query.
    val passes: Seq[Map[String, Double]] = (1 to 3).map { _ =>
      catalog.map { case (name, fn) => name -> once(name, fn) }.toMap
    }
    val results = catalog.map { case (name, _) =>
      val runs = passes.map(_(name))
      val spread = runs.max / math.max(runs.min, 1e-9)
      if (spread > 2.0)
        System.err.println(f"[bench] $name spread ${spread}%.1fx: ${runs.map(r => f"$r%.2f").mkString(",")}s")
      name -> runs
    }
    def median(rs: Seq[Double]): Double = rs.sorted.apply(rs.size / 2)
    val qs = results.map { case (k, rs) => "\"" + k + "\":" + rs.min }
      .mkString("{", ",", "}")
    val medians = results.map { case (k, rs) => "\"" + k + "\":" + median(rs) }
      .mkString("{", ",", "}")
    // all three per-query runs, so a reader can tell VM noise (wide spread)
    // from a real regression (all three runs slower) without a re-run
    val runsJson = results.map { case (k, rs) =>
      // Locale.ROOT: a comma-decimal default locale would emit broken JSON
      "\"" + k + "\":[" + rs.map(r =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(r))).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    val totalMedian = results.map { case (_, rs) => median(rs) }.sum
    // Fixed-workload trend line: the 51 queries the ROUND-1 bench recorded
    // (BENCH_r01.json, 299.3 s). The headline `value` grows with every
    // catalog addition by construction; this subset is the same work
    // measured every round, so engine speed and catalog growth are
    // separable in the artifact itself.
    val r1Names = Set(
      "q01_scan_project", "q02_filter_eq", "q03_filter_range",
      "q04_filter_conj", "q05_count", "q06_count_filtered",
      "q07_cast_project", "q08_partition_inventory", "q09_uuid_or_zero",
      "q10_ipv4", "q11_format_size", "q12_describe",
      "q13_delete_partition", "q14_recon_verdict", "q15_groupby_agg",
      "q16_join_agg", "q17_topk", "q18_window",
      "q19_events_window", "q20_json_extract", "q21_fingerprint",
      "q22_fingerprint_by_partition", "q23_distinct_agg", "q24_setops",
      "q25_rollup", "q26_percentiles", "q27_approx_sketches",
      "q28_salted_join", "q29_asof_join", "q30_dedup_exact",
      "q31_minhash_pairs", "q32_simhash", "q33_jaccard_pairs",
      "q34_knn_bruteforce", "q35_knn_lsh", "q36_embedding_neardup",
      "q40_langid", "q41_quality", "q42_token_stats",
      "q43_text_stats", "q44_doc_fingerprint", "q45_multimodal_features",
      "q46_sessionize", "q47_window_frames", "q48_string_funcs",
      "q49_explode", "q50_range_join", "q51_pivot",
      "q52_grouping_sets", "q53_map_funcs", "q54_knn_ivf")
    val r1Present = results.filter { case (k, _) => r1Names.contains(k) }
    val r1Sum = r1Present.map(_._2.min).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // phase split (round-5 verdict #8): the persisted-index queries' gate
    // totals time build+probe together; the user-facing number is the
    // probe alone, and a regression is only diagnosable if the phases are
    // visible separately. Two passes, min of each phase (same VM-stall
    // rationale as the interleaved catalog passes). Untimed region — does
    // not change any query's gate total.
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val phases = SparkEntry.phased.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
      .flatMap { case (name, fn) =>
        try {
          val runs = (1 to 2).map(_ => fn(spark, sfDir))
          val byPhase = runs.flatMap(_.keys).distinct.sorted
            .map(p => "\"" + p + "\":" + fmt(runs.map(_(p)).min))
          Some("\"" + name + "\":{" + byPhase.mkString(",") + "}")
        } catch { case e: Throwable =>
          System.err.println(s"[bench] phase split $name failed: ${e.getMessage}")
          None
        }
      }
    val phasesJson = phases.mkString("{", ",", "}")
    // Per-query regression gate (round-8 verdict #3): bench/thresholds.json
    // holds 1.5 × the best median-of-3 of the last two rounds per query;
    // a median above its threshold lands in the `regressions` array so the
    // round artifact adjudicates the VM's 133–146 s bounce band itself
    // instead of by eye. New queries have no threshold yet (not flagged).
    val thresholds: Map[String, Double] =
      try {
        val txt = Files.readString(Paths.get("bench/thresholds.json"))
        // flat {"name": seconds} map we generate ourselves — a regex scan
        // is enough and keeps the bench free of JSON dependencies
        "\"([^\"]+)\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    def overs(pick: Seq[Double] => Double) = results.flatMap { case (name, rs) =>
      thresholds.get(name).filter(t => pick(rs) > t).map(t => (name, pick(rs), t))
    }.sortBy { case (_, m, t) => -(m / t) } // worst overshoot first
    val regressed = overs(median)
    // a VM-stall window inflates EVERY median together (the 133–146 s
    // bounce band) and floods the median gate with uniform ~1.1–1.3×
    // trips; min-of-3 discards one stalled pass per query, so a REAL
    // regression (all three runs slower) trips BOTH arrays while ambient
    // noise trips only the median one — the reader separates them without
    // a re-run
    val regressedMin = overs(_.min)
    def regJson(rs: Seq[(String, Double, Double)]) = rs.map { case (n, m, t) =>
      s"""{"query":"$n","median":${fmt(m)},"threshold":${fmt(t)}}"""
    }.mkString("[", ",", "]")
    val regressionsJson = regJson(regressed)
    val regressionsMinJson = regJson(regressedMin)
    // the compact stdout line must stay inside the harness's ~2 KB tail:
    // cap its array at the 12 worst, with the true count alongside
    val regressionsCompact = regJson(regressedMin.take(12))
    val line = s"""{"metric":"total","value":$total,"unit":"sec","total_median":$totalMedian,"n_queries":${results.size},"r1_subset_n":${r1Present.size},"r1_subset_sum":${fmt(r1Sum)},"r1_subset_recorded_r01":299.292,"regressions":$regressionsJson,"regressions_min":$regressionsMinJson,"queries":$qs,"medians":$medians,"runs":$runsJson,"phases":$phasesJson,"failed":$failedJson,"sf":"$sfDir"}"""
    // Stable-file copy of the artifact (driver stdout capture failed in
    // r1) — FULL runs only: a filtered iteration run must not overwrite
    // the round's record with a subset. Written BOTH to tmp/ (scratch)
    // and to bench/ (tracked — the round-9 verdict wants the compact
    // line's full_record pointer to resolve to a file that survives in
    // git, not a tmp path).
    val trackedRecord = "bench/full_record_latest.json"
    if (wanted.isEmpty) try {
      Files.createDirectories(Paths.get("tmp"))
      Files.writeString(Paths.get("tmp/bench_latest.json"), line + "\n")
      Files.writeString(Paths.get(trackedRecord), line + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    println(line)
    // COMPACT summary as the LAST stdout line (round-8 verdict #5): the
    // round harness keeps only a ~2 KB tail of stdout, so the full
    // 16 KB record above arrives mid-truncated and unparseable
    // (BENCH_r08 'parsed: null'). This line carries the headline numbers
    // + the regression verdict and POINTS at the full per-query record,
    // so the round artifact is parseable standalone.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_median":${fmt(totalMedian)},"n_queries":${results.size},"r1_subset_n":${r1Present.size},"r1_subset_sum":${fmt(r1Sum)},"r1_subset_recorded_r01":299.292,"n_regressions_median":${regressed.size},"n_regressions_min":${regressedMin.size},"regressions_min":$regressionsCompact,"failed":$failedJson,"sf":"$sfDir","full_record":"$trackedRecord"}""")
    spark.stop()
  }
}
