package graft.sources

import graft.SparkSpec

class ShardWriterSpec extends SparkSpec {

  test("shardCount: ceil semantics, floor of one file") {
    assert(ShardWriter.shardCount(0, 100) == 1)
    assert(ShardWriter.shardCount(1, 100) == 1)
    assert(ShardWriter.shardCount(100, 100) == 1)
    assert(ShardWriter.shardCount(101, 100) == 2)
    assert(ShardWriter.shardCount(1000, 100) == 10)
    intercept[IllegalArgumentException](ShardWriter.shardCount(10, 0))
  }

  test("evenShards: all rows land, file count matches, no file exceeds the cap") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet") // 500 rows
    val out = tmpDir("shards")
    val n = docs.count()
    ShardWriter.evenShards(docs, n, rowsPerFile = 120).mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files.size == ShardWriter.shardCount(n, 120)) // 5 files for 500
    assert(spark.read.parquet(out).count() == n)
    // hard cap holds per file
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 120, f.getName)
    }
    // even fill: round-robin repartition keeps files within one row of
    // ceil(n / files) (parquet task boundaries preserve the partitioning)
    val sizes = files.map(f => spark.read.parquet(f.getPath).count())
    assert(sizes.max - sizes.min <= 1, sizes.mkString(","))
  }
}
