package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextAnalysis

class ScaleQueriesSpec extends SparkSpec {

  test("q75 HLL union: per-lang and global estimates within 5% of exact") {
    val est = ScaleQueries.all("q75_hll_union")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val toks = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val exactPerLang = toks.groupBy("lang")
      .agg(countDistinct(col("tok")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = toks.agg(countDistinct(col("tok"))).head().getLong(0)
    (exactPerLang + ("ALL" -> exactAll)).foreach { case (lang, exact) =>
      val e = est(lang)
      assert(math.abs(e - exact).toDouble / exact < 0.05,
        s"$lang: estimate $e vs exact $exact")
    }
  }

  test("q73 top-20 ngrams match the exact grouped counts") {
    val got = ScaleQueries.all("q73_frequent_ngrams")(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(graft.dedup.Dedup.wordShinglesHof(col("text"), 2)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (g, n) => (-n, g) }.take(20).toSeq
    assert(got == want)
  }

  test("q73 plans as a distributed partial top-k (TakeOrderedAndProject)") {
    val plan = ScaleQueries.all("q73_frequent_ngrams")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k should not be a full sort:\n$plan")
  }
}
