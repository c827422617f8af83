package graft.functions.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** The native expressions must be bit-identical to the builtin-HOF
  * reference formulations they replace. */
class TextHashExpressionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("SimHash64 expression == HOF formulation on the corpus + edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "one", "a  b\t c ",
      "hello\n", "\thello", "a\nb", "trailing\t", "\n", "a b").toDF("text")
      .select(col("text"), lit(-1L).as("doc_id"))
    val all = docs.select(col("text"), col("doc_id")).unionByName(edge)
    val diff = all.select(
      Dedup.simhash(col("text")).as("fast"),
      Dedup.simhashHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("MinHashSignature expression == HOF formulation") {
    val sh = Dedup.wordShingles(col("text"), 3)
    val diff = docs.select(
      Dedup.minhashSignature(sh, 32).as("fast"),
      Dedup.minhashSignatureHof(sh, 32).as("ref"))
      .filter(to_json(col("fast")) =!= to_json(col("ref")))
    assert(diff.count() == 0)
  }

  test("MinHashShingled fused expression == MinHashSignature(wordShinglesHof) + edge cases") {
    import spark.implicits._
    // edge cases: <n tokens (empty shingle arm), exactly n, whitespace runs,
    // trailing newline (tokenizer keeps the trailing empty token), null text
    // (HOF's otherwise-arm yields empty shingles → all-MaxValue signature)
    val edge = Seq("", " ", "one", "a b", "a b c", "a  b\t c d", "hello\n x y z")
      .toDF("text").select(col("text"), lit(-1L).as("doc_id"))
      .unionByName(Seq(1).toDF("x").select(lit(null).cast("string").as("text"),
        lit(-2L).as("doc_id")))
    val all = docs.select(col("text"), col("doc_id")).unionByName(edge)
    val diff = all.select(
      TextHashExpressions.minhashShingled(col("text"), 3, 32).as("fast"),
      Dedup.minhashSignatureHof(Dedup.wordShinglesHof(col("text"), 3), 32).as("ref"))
      .filter(to_json(col("fast")) =!= to_json(col("ref")))
    assert(diff.count() == 0)
  }

  test("WordShingles native expression == HOF formulation + edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "one", "a b", "a b c", "a  b\t c d", "hello\n x y z")
      .toDF("text").select(col("text"), lit(-1L).as("doc_id"))
      .unionByName(Seq(1).toDF("x").select(lit(null).cast("string").as("text"),
        lit(-2L).as("doc_id")))
    val all = docs.select(col("text"), col("doc_id")).unionByName(edge)
    val diff = all.select(
      Dedup.wordShingles(col("text"), 3).as("fast"),
      Dedup.wordShinglesHof(col("text"), 3).as("ref"))
      .filter(to_json(col("fast")) =!= to_json(col("ref")))
    assert(diff.count() == 0)
  }

  test("CosineSimilarity expression == HOF formulation on embeddings") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") <= col("ia") + 5)
    val diff = pairs.select(
      graft.sim.Similarity.cosine(col("ea"), col("eb")).as("fast"),
      graft.sim.Similarity.cosineHof(col("ea"), col("eb")).as("ref"))
      .filter(col("fast") =!= col("ref")) // bitwise-equal doubles required
    assert(diff.count() == 0)
  }

  test("null input yields null") {
    import spark.implicits._
    val r = Seq[String](null).toDF("text")
      .select(Dedup.simhash(col("text"))).head()
    assert(r.isNullAt(0))
  }
}
