package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the BM25 index build path — prints per-action
  * wall times so optimisation targets are measured, not guessed.
  * Not part of the engine surface; driven by hand during perf rounds. */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    docs.count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.text.TextAnalysis
    (1 to 3).foreach { it =>
      println(s"--- iter $it ---")
      t("docs scan noop") { noop(docs) }
      val toksTwice = docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).as("dl"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
      t("explode (tokens twice) noop") { noop(toksTwice) }
      val toksOnce = docs.filter(col("text").isNotNull)
        .withColumn("__toks", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), size(col("__toks")).as("dl"),
          explode(col("__toks")).as("tok"))
      t("explode (tokens once) noop") { noop(toksOnce) }
      t("toks count") { println("  rows=" + toksOnce.count()) }
      val agg2 = toksTwice.groupBy("doc_id", "tok", "dl").agg(count(lit(1)).as("tf"))
      t("postings agg (tokens twice) noop") { noop(agg2) }
      val agg1 = toksOnce.groupBy("doc_id", "tok", "dl").agg(count(lit(1)).as("tf"))
      t("postings agg (tokens once) noop") { noop(agg1) }
      val withCols = agg1
        .withColumn("bucket", pmod(xxhash64(col("tok")), lit(64)))
        .withColumn("block", pmod(xxhash64(col("doc_id")), lit(64)))
        .withColumn("shard", lit("s0"))
      t("agg+cols+repartition noop") { noop(withCols.repartition(col("bucket"))) }
      val idx = java.nio.file.Files.createTempDirectory("graft_prof_bm25").toString
      t("partitioned write") {
        withCols.repartition(col("bucket"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("shard", "bucket")
          .parquet(s"$idx/postings")
      }
      graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(idx))
    }
    spark.stop()
  }
}
