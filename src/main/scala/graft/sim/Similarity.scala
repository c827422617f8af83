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
