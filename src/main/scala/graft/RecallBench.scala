package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** ANN approximation-quality gate (round-10 verdict #4): the catalog's
  * ANN gates prove PARITY and PLUMBING (appended index ≡ fresh scan,
  * batch ≡ single) plus a weak per-query hit floor; this main measures
  * the approximation itself — recall@10 per index family against the
  * exact brute-force ground truth — and trips a floor per family from
  * `bench/recall_floors.json`, so a rebalance, codebook change, or
  * parameter drift that silently degrades retrieval quality shows up as
  * a named regression in the round record instead of "all gates green,
  * answers quietly worse".
  *
  * Families (catalog parameters — the numbers users get from the
  * documented defaults):
  *  - `ivf`       — in-memory IVF scan (q54 params)
  *  - `ivf_index` — the PERSISTED IVF index probe (q83 path)
  *  - `ivf_rebal` — the same persisted index AFTER rebalanceIvfIndex:
  *                  the maintenance op the floor exists to watch
  *  - `pq_rerank` — PQ ADC shortlist + exact re-rank (q102 params)
  *  - `ivfpq`     — IVF-pruned PQ with re-rank (q104 params)
  *
  * Usage: `runMain graft.RecallBench [dir ...]` — default the sf0.1
  * fixture; pass e.g. `tmp/scale_x10` to add a scale cell to the trend.
  * One JSON line per run; also written to tmp/bench_recall.json.
  */
object RecallBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    val floors: Map[String, Double] =
      try {
        val txt = Files.readString(Paths.get("bench/recall_floors.json"))
        "\"([^\"]+)\"\\s*:\\s*([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }

    val cells = dirs.map { dir => dir -> measure(spark, dir) }
    def fmt(d: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val cellJson = cells.map { case (dir, rs) =>
      "\"" + dir + "\":{" +
        rs.map { case (fam, r) => "\"" + fam + "\":" + fmt(r) }.mkString(",") + "}"
    }.mkString("{", ",", "}")
    // the gate: any family under its floor, in ANY measured cell
    val regressions = cells.flatMap { case (dir, rs) =>
      rs.flatMap { case (fam, r) =>
        floors.get(fam).filter(r < _).map(f =>
          s"""{"dir":"$dir","family":"$fam","recall":${fmt(r)},"floor":${fmt(f)}}""")
      }
    }
    val floorsJson = floors.toSeq.sorted
      .map { case (f, v) => "\"" + f + "\":" + fmt(v) }.mkString("{", ",", "}")
    val line = s"""{"metric":"recall","k":$K,"n_queries":$NQueries,""" +
      s""""recalls":$cellJson,"floors":$floorsJson,""" +
      s""""regressions":[${regressions.mkString(",")}]}"""
    try {
      Files.createDirectories(Paths.get("tmp"))
      Files.writeString(Paths.get("tmp/bench_recall.json"), line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[recall] file write failed: ${e.getMessage}") }
    println(line)
    spark.stop()
  }

  private val K = 10
  private val NQueries = 100

  /** recall@K of `approx` against exact `truth`: hit fraction over the
    * truth pairs (both relations emit (query_id, neighbor_id) rows). */
  private def recallOf(approx: DataFrame, truth: DataFrame, nTruth: Long): Double = {
    val hits = approx.select("query_id", "neighbor_id")
      .join(truth.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count()
    hits.toDouble / nTruth
  }

  def measure(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < NQueries)
    System.err.println(s"[recall] ground truth @ $dir")
    val truth = Similarity.bruteForceKnn(q, emb, "vec_id", "embedding", K)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val nTruth = truth.count()
    val shortlist = math.max(100L, emb.count() / 20).toInt
    def cell(name: String)(approx: => DataFrame): (String, Double) = {
      System.err.println(s"[recall] $name @ $dir")
      val r = recallOf(approx, truth, nTruth)
      System.err.println(f"[recall] $name = $r%.4f")
      name -> r
    }
    val inMem = Seq(
      cell("ivf")(Similarity.ivfKnn(q, emb, "vec_id", "embedding",
        k = K, nCentroids = 16, nProbe = 8, lloydIters = 1, lloydSamplePct = 25)),
      cell("pq_rerank")(Similarity.pqKnnRerank(q, emb, "vec_id", "embedding",
        k = K, shortlist = shortlist, m = 8, kCodes = 32, lloydIters = 1)),
      cell("ivfpq")(Similarity.ivfPqKnn(q, emb, "vec_id", "embedding",
        k = K, nCentroids = 16, nProbe = 8, shortlist = shortlist,
        m = 8, kCodes = 32, lloydIters = 1)))
    // the persisted-index pair: the SAME index before and after a
    // rebalance — the maintenance op whose quality drift this gate watches
    val store = graft.core.Fs.scratchDir("graft_recall_ivf")
    val persisted = try {
      Similarity.buildIvfIndex(
        emb.filter(pmod(col("vec_id"), lit(2L)) === 0L), "vec_id", "embedding",
        store.toString, nCentroids = 16, lloydIters = 1, lloydSamplePct = 25,
        shardId = "s0")
      Similarity.appendIvfIndex(
        emb.filter(pmod(col("vec_id"), lit(2L)) === 1L), "vec_id", "embedding",
        store.toString, shardId = "s1")
      val before = cell("ivf_index")(Similarity.queryIvfIndex(spark,
        store.toString, q, "vec_id", "embedding", k = K, nProbe = 8))
      Similarity.rebalanceIvfIndex(spark, store.toString,
        nCentroids = 16, lloydIters = 1, lloydSamplePct = 25)
      val after = cell("ivf_rebal")(Similarity.queryIvfIndex(spark,
        store.toString, q, "vec_id", "embedding", k = K, nProbe = 8))
      Seq(before, after)
    } finally graft.core.Fs.deleteRecursively(store)
    inMem ++ persisted
  }
}
