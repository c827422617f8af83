package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{BoundedTopK, PortableRowHash60, VectorSumAgg}
import graft.functions.expressions.TextHashExpressions.{MinHashShingled, MinHashSignature, PortableSimHash48, RollingChunkTexts, RollingChunks, SimHash64, WordShingles}
import graft.functions.expressions.VectorExpressions.{CosineSimilarity, RandomHyperplaneSignature}

/** Session-extension registration: exposes graft's native expressions to
  * SQL, so `spark.sql("SELECT simhash64(text) …")` works alongside the
  * Column API. Install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or config
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  import GraftExtensions.planesArg

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit near-duplicate signature"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("portable_simhash48"),
      info("portable_simhash48",
        "portable_simhash48(text) - 48-bit md5-family simhash, DuckDB-mirrorable"),
      (children: Seq[Expression]) => PortableSimHash48(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles, k) - k MinHash values"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => MinHashSignature(c, 32)
        case Seq(c, k) => MinHashSignature(c,
          k.eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine over float arrays"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("lsh_signature"),
      info("lsh_signature", "lsh_signature(vec, planes) - sign-bit random-hyperplane LSH signature"),
      (children: Seq[Expression]) =>
        RandomHyperplaneSignature(children(0), planesArg(children))))
    ext.injectFunction((
      FunctionIdentifier("bounded_top_k"),
      info("bounded_top_k",
        "bounded_top_k(struct(score, id...), k) - k-bounded partial top-k aggregate"),
      (children: Seq[Expression]) => BoundedTopK(children(0),
        children(1).eval().asInstanceOf[Number].intValue())))
    GraftExtensions.roundFourFunctions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    // BETWEEN-join → bucketed equi-join (gated on spark.graft.rangeJoin.binSize)
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    // corpus↔corpus equi-joins must never broadcast-hash (see the rule doc)
    ext.injectOptimizerRule(_ => DemoteCorpusBroadcast)
    // registered rollup stores answer raw-table aggregates from states
    ext.injectOptimizerRule(_ => RollupRewrite)
  }
}

/** Registration for an already-running session (tests, REPL). */
object GraftExtensions {

  /** Analyzer-time validation of the `planes` argument: a null, non-numeric
    * or non-foldable second argument gets a usage message instead of an
    * NPE/ClassCastException from a blind `eval().asInstanceOf`. */
  private[plans] def planesArg(children: Seq[Expression]): Int = {
    val usage = "lsh_signature(vec, planes): planes must be an integer literal in [1, 64]"
    if (children.size != 2 || !children(1).foldable)
      throw new IllegalArgumentException(usage)
    children(1).eval() match {
      case n: Number => n.intValue()
      case _ => throw new IllegalArgumentException(usage)
    }
  }

  /** Analyzer-time integer-literal argument with a usage message instead
    * of an NPE/ClassCastException from a blind eval cast. */
  private def intLit(e: Expression, usage: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(usage)
    e.eval() match {
      case n: Number => n.intValue()
      case _ => throw new IllegalArgumentException(usage)
    }
  }

  /** The text-pipeline expression surface (name, usage, builder) shared by
    * the extension and the already-running-session registration paths. */
  private[plans] val roundFourFunctions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    // Every builder ends in an explicit usage-rejection arm: a wrong arity
    // must surface the usage string, not a scala.MatchError (and the chunk
    // functions must REJECT extra args, not silently ignore them).
    ("word_shingles",
      "word_shingles(text[, n]) - n-token (default 3) shingle strings",
      children => children match {
        case Seq(c) => WordShingles(c, 3)
        case Seq(c, n) => WordShingles(c, intLit(n, "word_shingles: n must be an integer literal"))
        case _ => throw new IllegalArgumentException(
          "word_shingles(text[, n]): expected 1 or 2 arguments")
      }),
    ("minhash_shingled",
      "minhash_shingled(text[, n[, k]]) - fused shingle+minhash signature (defaults n=3, k=32)",
      children => children match {
        case Seq(c) => MinHashShingled(c, 3, 32)
        case Seq(c, n) => MinHashShingled(c,
          intLit(n, "minhash_shingled: n must be an integer literal"), 32)
        case Seq(c, n, k) => MinHashShingled(c,
          intLit(n, "minhash_shingled: n must be an integer literal"),
          intLit(k, "minhash_shingled: k must be an integer literal"))
        case _ => throw new IllegalArgumentException(
          "minhash_shingled(text[, n[, k]]): expected 1 to 3 arguments")
      }),
    ("rolling_chunks",
      "rolling_chunks(text) - content-defined-chunk xxhash64 fingerprints (Buzhash boundaries)",
      children => children match {
        case Seq(c) => RollingChunks(c)
        case _ => throw new IllegalArgumentException(
          "rolling_chunks(text): expected exactly 1 argument")
      }),
    ("rolling_chunk_texts",
      "rolling_chunk_texts(text) - the chunk TEXTS for the same boundaries (audit companion)",
      children => children match {
        case Seq(c) => RollingChunkTexts(c)
        case _ => throw new IllegalArgumentException(
          "rolling_chunk_texts(text): expected exactly 1 argument")
      }),
    ("portable_row_hash60",
      "portable_row_hash60(cols...) - fused oracle-portable 60-bit md5-prefix row hash",
      children => PortableRowHash60(children)),
    ("vector_sum",
      "vector_sum(bigint_array) - exact element-wise vector sum aggregate",
      children => VectorSumAgg(children.head)),
    ("sorted_asof_pick",
      "sorted_asof_pick(arr, ts) - last element of a first-field-ascending struct array at-or-before ts (binary search)",
      children => children match {
        case Seq(a, t) => graft.functions.expressions.AsOfExpressions.SortedAsOfPick(a, t)
        case _ => throw new IllegalArgumentException(
          "sorted_asof_pick(arr, ts): expected exactly 2 arguments")
      }))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      (children: Seq[Expression]) => SimHash64(children.head), "scala_udf")
    reg.createOrReplaceTempFunction("portable_simhash48",
      (children: Seq[Expression]) => PortableSimHash48(children.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      (children: Seq[Expression]) => children match {
        case Seq(c) => MinHashSignature(c, 32)
        case Seq(c, k) => MinHashSignature(c,
          intLit(k, "minhash_signature: k must be an integer literal"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(shingles[, k]): expected 1 or 2 arguments")
      }, "scala_udf")
    reg.createOrReplaceTempFunction("cosine_similarity",
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)), "scala_udf")
    reg.createOrReplaceTempFunction("lsh_signature",
      (children: Seq[Expression]) =>
        RandomHyperplaneSignature(children(0), planesArg(children)), "scala_udf")
    // raw AggregateFunction: the analyzer wraps it in AggregateExpression
    reg.createOrReplaceTempFunction("bounded_top_k",
      (children: Seq[Expression]) => BoundedTopK(children(0),
        children(1).eval().asInstanceOf[Number].intValue()),
      "scala_udf")
    roundFourFunctions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    if (!spark.experimental.extraOptimizations.contains(DemoteCorpusBroadcast))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DemoteCorpusBroadcast
    if (!spark.experimental.extraOptimizations.contains(RollupRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite
  }
}
