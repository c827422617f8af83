package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]) — north-star
  * extension.
  *
  *  - [[cosine]]: HOF dot product / norms, double accumulation in index
  *    order (deterministic; mirrorable in the DuckDB oracle).
  *  - [[bruteForceKnn]]: broadcast the (small) query set against the full
  *    corpus — the exact baseline. At 100 TB corpus scale this is one
  *    map-only pass: no shuffle for the join (broadcast), one partial
  *    top-k shuffle for the final rank.
  *  - [[lshKnn]]: random-hyperplane LSH — sign-bit signature, bucket join,
  *    exact re-rank inside buckets. The scale path: candidate set per query
  *    is a bucket, not the corpus.
  */
object Similarity {

  /** Elementwise double products in index order. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Production path: native fused expression (one pass for dot + norms),
    * bit-identical to [[cosineHof]]. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.cosine(a, b)

  /** Builtin-HOF reference formulation of [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * enough to broadcast (driver enforces nothing; Spark picks broadcast
    * from size). Ties broken by corpus id for determinism. */
  def bruteForceKnn(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 10): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * hash of (p, j) mapped to [-1, 1). No RNG — reproducible across runs
    * and engines. */
  private def planeComponent(p: Column, j: Column): Column =
    xxhash64(p, j).cast("double") / lit(Long.MaxValue.toDouble)

  /** Sign-bit LSH signature of `planes` random hyperplanes. */
  def lshSignature(vec: Column, planes: Int = 16): Column = {
    val projections = transform(sequence(lit(0), lit(planes - 1)), p => {
      // dot(vec, plane_p) via index zip: component j weight = planeComponent
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, x) => acc + x)
    })
    val masks = array((0 until planes).map(i => lit(1L << i)): _*)
    aggregate(
      zip_with(projections, masks,
        (proj, mask) => when(proj >= 0, mask).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Approximate top-k: candidates share the LSH bucket, re-ranked by exact
    * cosine. Recall grows with fewer planes (bigger buckets). */
  def lshKnn(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, planes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), planes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshSignature(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style approximate top-k: an inverted-file index with
    * hash-sampled centroids.
    *
    *  1. centroids = `nCentroids` corpus vectors chosen by lowest
    *     xxhash64(id) — deterministic pseudo-random, no RNG, no kmeans
    *     iteration (at 100 TB a couple of Lloyd iterations over a sample
    *     would refine these; the plumbing is identical)
    *  2. every corpus vector is assigned to its nearest centroid (one
    *     broadcast pass — centroids are tiny)
    *  3. each query probes its `nProbe` nearest centroids and scores only
    *     those clusters' members: per-query work is the probed fraction of
    *     the corpus, and the candidate join is an equi-join on centroid id
    *
    * Recall grows with nProbe; identical/near-identical vectors always
    * share a top-1 centroid, so exact duplicates are found at nProbe=1. */
  def ivfKnn(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

    def assign(df: DataFrame, id: String, vec: String, topN: Int) = {
      val w = Window.partitionBy(id).orderBy(desc("__csim"), col("centroid_id"))
      df.crossJoin(broadcast(cents))
        .withColumn("__csim", cosine(col(vec), col("centroid_vec")))
        .withColumn("__crk", row_number().over(w))
        .filter(col("__crk") <= topN)
        .drop("__csim", "__crk", "centroid_vec")
    }

    val corpusAssigned = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id", "cv", 1)
    val queryProbes = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", nProbe)

    val scored = queryProbes.join(corpusAssigned, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Near-duplicate pairs by embedding cosine above a threshold, bounded to
    * same-`groupCol` pairs (e.g. label or LSH bucket) to avoid the full
    * cross product. */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, groupCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(groupCol).as("g"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(groupCol).as("g"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("g")).filter(col("id_b") > col("id_a"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
