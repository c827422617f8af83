package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, NeurIPS —
  * the DSIR recipe): score every raw document by how much more likely its
  * hashed n-gram features are under a TARGET distribution (the
  * high-quality corpus you want more of) than under the RAW distribution
  * it came from, then resample the raw corpus toward the target by those
  * weights. The standard pretraining-mixture tool for "make the crawl
  * look like Wikipedia" without training a classifier.
  *
  * Scale shape (100 TB):
  *  - ONE tokenize+explode pass per corpus builds hashed-BIGRAM bucket
  *    instances; per-doc bucket counts pre-aggregate map-side
  *  - both LANGUAGE MODELS are `buckets`-sized arrays (default 256 rows)
  *    — the whole model pair broadcasts; scoring is a map-side join +
  *    per-doc sum, so the only corpus-sized exchange is the per-doc
  *    (doc, bucket) combine
  *  - no window over the corpus, no driver collect beyond the 2-row
  *    total-count aggregate
  *
  * Two scoring variants, the [[Retrieval]] bm25/bm25LogIdf discipline:
  *  - [[dsirWeights]] — gate-portable QUANTISED-LOG score: per bucket
  *    `qlog2((c_t+1)·(N_r+B)) − qlog2((c_r+1)·(N_t+B))` where [[qlog2Sql]]
  *    is a piecewise-linear integer log2 (exponent from the binary-string
  *    length, fraction from an exact power-of-two division, scaled 2^20)
  *    — a true log-likelihood-ratio sum up to the PLF error (≤ ~0.086
  *    log2 units per bucket), in arithmetic both engines compute
  *    bit-identically. Long-exact while (c+1)·(N+B) < 2^63; a
  *    planetary-scale model should use the double log variant.
  *  - [[dsirLogWeights]] — the paper's log-likelihood-ratio sum in
  *    double space (libm ln: NOT oracle-portable; spec'd against the
  *    quantised variant for top-decile rank agreement on the fixture).
  */
object Dsir {

  /** SQL text of the piecewise-linear integer log2, scaled by 2^20:
    * `(length(bin(v))−1)·2^20 + frac`, with the fraction linearly
    * interpolated between neighbouring powers of two via an EXACT
    * power-of-two multiply/divide (powers of two are exact doubles, so
    * the pow-cast is exact; the division operand order keeps everything
    * in long range for v < 2^63). Single source for the Spark expr
    * (`intDiv = "div"`) and the DuckDB oracle (`intDiv = "//"`) — change
    * both call sites together. Requires v >= 1. */
  def qlog2Sql(v: String, intDiv: String): String =
    s"(CAST(length(bin($v)) - 1 AS BIGINT) * 1048576 + " +
      s"CASE WHEN length(bin($v)) >= 21 " +
      s"THEN ($v $intDiv CAST(pow(2, length(bin($v)) - 21) AS BIGINT)) " +
      s"ELSE $v * CAST(pow(2, 21 - length(bin($v))) AS BIGINT) END - 1048576)"

  /** Per-doc hashed-bigram bucket counts: (id, bucket, n). One explode
    * pass; the bigram strings die inside the projection that hashes them
    * (only `buckets`-bounded ints reach the exchange). */
  private def docBuckets(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame = {
    val t = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), TextAnalysis.tokens(col(textCol)).as("__ts"))
    val n1 = greatest(size(col("__ts")) - 1, lit(0))
    t.select(col("__id"), explode(zip_with(
        slice(col("__ts"), lit(1), n1), slice(col("__ts"), lit(2), n1),
        (a, b) => concat_ws(" ", a, b))).as("bg"))
      .select(col("__id"),
        pmod(graft.dedup.Dedup.portableHash(col("bg")), lit(buckets.toLong)).as("bucket"))
      .groupBy("__id", "bucket").agg(count(lit(1)).as("n"))
  }

  /** `buckets`-sized model: per-bucket instance counts (+ implicit add-1
    * smoothing applied by the callers). */
  private def bucketModel(docs: DataFrame, textCol: String,
      buckets: Int): DataFrame =
    docBuckets(docs, textCol, "doc_id", buckets)
      .groupBy("bucket").agg(sum("n").as("c"))

  /** Gate-portable DSIR importance weights for every raw doc with at
    * least one bigram: (idCol, n_bigrams, dsir_u) where dsir_u is the
    * quantised-log importance sum (see object doc). Deterministic long
    * arithmetic end-to-end; ties broken downstream by id. */
  def dsirWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 256): DataFrame = {
    // the raw model derives from the SAME per-doc bucket relation the
    // scoring join consumes (sum of per-doc counts ≡ instance counts), so
    // the raw corpus tokenizes/explodes once — the shared (id, bucket)
    // aggregate exchange is reused by both consumers
    val db = docBuckets(raw, textCol, idCol, buckets)
    val cT = bucketModel(target, textCol, buckets)
      .select(col("bucket"), col("c").as("c_t"))
    val cR = db.groupBy("bucket").agg(sum("n").as("c_r"))
    // the two models + totals: buckets-bounded relations, broadcast
    val totals = cT.agg(coalesce(sum("c_t"), lit(0L)).as("n_t"))
      .crossJoin(cR.agg(coalesce(sum("c_r"), lit(0L)).as("n_r")))
    val model = cR.join(cT, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        ((coalesce(col("c_t"), lit(0L)) + 1L) * (col("n_r") + buckets))
          .as("__num"),
        ((coalesce(col("c_r"), lit(0L)) + 1L) * (col("n_t") + buckets))
          .as("__den"))
      .select(col("bucket"),
        expr(s"${qlog2Sql("__num", "div")} - ${qlog2Sql("__den", "div")}")
          .as("qlr"))
    db.join(broadcast(model), Seq("bucket"))
      .groupBy("__id")
      .agg(sum("n").as("n_bigrams"),
        sum(col("n") * col("qlr")).as("dsir_u"))
      .withColumnRenamed("__id", idCol)
  }

  /** The paper's log-likelihood-ratio importance weight (double; libm ln
    * — production scoring at any corpus scale, but not bit-portable to
    * the external oracle; spec'd for rank agreement with
    * [[dsirWeights]]). */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 256): DataFrame = {
    val cT = bucketModel(target, textCol, buckets)
      .select(col("bucket"), col("c").as("c_t"))
    val cR = bucketModel(raw, textCol, buckets)
      .select(col("bucket"), col("c").as("c_r"))
    val totals = cT.agg(coalesce(sum("c_t"), lit(0L)).as("n_t"))
      .crossJoin(cR.agg(coalesce(sum("c_r"), lit(0L)).as("n_r")))
    val model = cR.join(cT, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("c_t"), lit(0L)) + 1).cast("double") /
            (col("n_t") + buckets).cast("double")) -
          log((coalesce(col("c_r"), lit(0L)) + 1).cast("double") /
            (col("n_r") + buckets).cast("double"))).as("llr"))
    docBuckets(raw, textCol, idCol, buckets)
      .join(broadcast(model), Seq("bucket"))
      .groupBy("__id")
      .agg(sum("n").as("n_bigrams"),
        sum(col("n").cast("double") * col("llr")).as("dsir_log"))
      .withColumnRenamed("__id", idCol)
  }
}
