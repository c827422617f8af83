package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")
  private lazy val target = docs.filter(col("lang") === "en")

  test("dsirWeights: deterministic, covers every bigram-bearing doc") {
    val a = Dsir.dsirWeights(docs, target, "text", "doc_id")
    val b = Dsir.dsirWeights(docs, target, "text", "doc_id")
    assert(a.orderBy("doc_id").collect().toSeq ==
      b.orderBy("doc_id").collect().toSeq)
    val nBigramDocs = docs.filter(col("text").isNotNull &&
      size(TextAnalysis.tokens(col("text"))) >= 2).count()
    assert(a.count() == nBigramDocs)
  }

  test("dsirWeights: the target slice scores higher than the rest (the selector selects)") {
    val w = Dsir.dsirWeights(docs, target, "text", "doc_id")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      // per-bigram-normalised means, or long docs dominate the comparison
      .select(col("lang"), (col("dsir_u").cast("double") /
        col("n_bigrams").cast("double")).as("w"))
    val en = w.filter(col("lang") === "en").agg(avg("w")).head().getDouble(0)
    val rest = w.filter(col("lang") =!= "en").agg(avg("w")).head().getDouble(0)
    assert(en > rest,
      s"en per-bigram weight $en must exceed non-en $rest")
  }

  test("rational and log variants agree on the top decile (rank-agreement floor)") {
    val k = (docs.count() / 10).toInt
    def topIds(df: org.apache.spark.sql.DataFrame, scoreCol: String): Set[Long] =
      df.orderBy(col(scoreCol).desc, col("doc_id"))
        .limit(k).select("doc_id").collect().map(_.getLong(0)).toSet
    val rat = topIds(Dsir.dsirWeights(docs, target, "text", "doc_id"), "dsir_u")
    val log = topIds(Dsir.dsirLogWeights(docs, target, "text", "doc_id"), "dsir_log")
    val overlap = rat.intersect(log).size.toDouble / k
    assert(overlap >= 0.5,
      s"top-$k overlap $overlap below floor — the quantised-rational " +
        "surrogate diverged from the paper's log scoring")
  }
}
