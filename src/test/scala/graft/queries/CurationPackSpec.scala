package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-level pack offsets (round-7 task #2): [[CurationQueries.packIds]]
  * must reproduce the flat per-source running sum EXACTLY — including on
  * the pathology it exists for (one source holding ~all the corpus) and
  * across shard boundaries (tiny shardSize forces many shards). */
class CurationPackSpec extends SparkSpec {

  private def flatPackIds(df: org.apache.spark.sql.DataFrame, budget: Int) = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_id",
      floor(coalesce(sum("n_tokens").over(w), lit(0L)) / budget).cast("long"))
  }

  private def docsDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_tokens")
  }

  test("two-level offsets equal the flat per-source running sum (giant source, many shards)") {
    // 900 of 1000 docs in ONE source; shardSize=7 → ~130 shards of it
    val rows = (0L until 1000L).map { i =>
      val src = if (i % 10 == 0) s"small${i % 3}" else "giant"
      (i, src, (i * 37 % 23) + 1)
    }
    val df = docsDf(rows)
    val got = CurationQueries.packIds(df, "source", "doc_id", "n_tokens",
        budget = 50, shardSize = 7)
      .select("doc_id", "pack_id")
    val want = flatPackIds(df, 50).select("doc_id", "pack_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      got.join(want.withColumnRenamed("pack_id", "want"), "doc_id")
        .filter(col("pack_id") =!= col("want")).orderBy("doc_id")
        .collect().take(10).mkString("\n"))
  }

  test("shard boundaries are invisible: a doc straddling shards lands by its global offset") {
    // budget 100; shard size 2: doc offsets accumulate across shards
    val df = docsDf(Seq(
      (1L, "s", 60L), (2L, "s", 60L), // shard 0: offsets 0, 60
      (3L, "s", 60L), (4L, "s", 60L), // shard 1: offsets 120, 180
      (5L, "s", 60L)))                // shard 2: offset 240
    val got = CurationQueries.packIds(df, "source", "doc_id", "n_tokens",
        budget = 100, shardSize = 2)
      .orderBy("doc_id").select("pack_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 0L, 1L, 1L, 2L), got)
  }

  test("null source and null n_tokens stream through like the flat form") {
    val df = docsDf(Seq((1L, "a", 10L), (2L, "a", 10L)))
      .unionByName(docsDf(Seq((3L, "x", 5L), (4L, "x", 7L)))
        .withColumn("source", lit(null).cast("string")))
      .withColumn("n_tokens",
        when(col("doc_id") === 2, lit(null).cast("long")).otherwise(col("n_tokens")))
    val got = CurationQueries.packIds(df, "source", "doc_id", "n_tokens",
        budget = 6, shardSize = 2)
      .select("doc_id", "pack_id")
    val want = flatPackIds(df, 6).select("doc_id", "pack_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
