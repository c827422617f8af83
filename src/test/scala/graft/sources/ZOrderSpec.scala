package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference interleave: bit i of a → 2i, bit i of b → 2i+1. */
  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L)((acc, i) =>
      acc | ((a.toLong >> i & 1L) << (2 * i)) | ((b.toLong >> i & 1L) << (2 * i + 1)))

  test("zValue matches the bitwise reference on edge + grid values") {
    val cases = Seq(0, 1, 2, 3, 255, 256, 4096, 65535, 12345, 54321)
    val rows = cases.flatMap(a => cases.map(b => (a, b))).toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("scale16 is order-preserving onto the full 16-bit domain") {
    val df = Seq(0L, 1L, 1L << 20, (1L << 24) - 1).toDF("v")
      .select(ZOrder.scale16(col("v"), (1L << 24) - 1).as("k"))
    val ks = df.collect().map(_.getLong(0))
    assert(ks.sameElements(ks.sorted) && ks.forall(k => k >= 0 && k < 65536))
    assert(ks.last == 65535) // the max value maps to the top key
  }

  test("z-clustered layout bounds BOTH dimensions per file; single-sort does not") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey").as("a"), col("l_suppkey").as("b"))
    val Array(maxA, maxB) = li.agg(max("a"), max("b")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val zDir = tmpDir("zorder")
    val sDir = tmpDir("singlesort")
    ZOrder.writeClustered(li, col("a"), col("b"), maxA, maxB, zDir, 8)
    li.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sDir)

    // mean per-file min/max width on dimension b, as a fraction of the
    // global range — the quantity parquet row-group pruning depends on
    def meanWidthB(path: String): Double = {
      val w = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(((max("b") - min("b")).cast("double")).as("w"))
        .agg(avg("w")).head().getDouble(0)
      w / maxB.toDouble
    }
    val zw = meanWidthB(zDir)
    val sw = meanWidthB(sDir)
    // sorting by `a` alone leaves b unconstrained (~ full range per file);
    // the z layout must cut the per-file b-footprint substantially
    assert(sw > 0.8, s"control layout unexpectedly clustered: $sw")
    assert(zw < 0.6 * sw, s"z-order did not bound dimension b: z=$zw vs sort=$sw")
  }

  test("file-stats index prunes files on BOTH z-ordered dimensions, results exact") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey").as("a"), col("l_suppkey").as("b"))
    val Array(maxA, maxB) = li.agg(max("a"), max("b")).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val zDir = tmpDir("zstats")
    ZOrder.writeClustered(li, col("a"), col("b"), maxA, maxB, zDir, 8)
    FileStatsIndex.build(spark, zDir, Seq("a", "b"))
    val nFiles = spark.read.parquet(zDir)
      .select(input_file_name()).distinct().count()
    for (dim <- Seq("a", "b")) {
      val hiBound = if (dim == "a") maxA / 8 else maxB / 8
      val pruned = FileStatsIndex.prunedRead(spark, zDir, dim, lit(0L), lit(hiBound))
      val full = spark.read.parquet(zDir)
        .filter(col(dim) >= 0L && col(dim) <= hiBound)
      // exact result...
      assert(pruned.count() == full.count() && pruned.count() > 0, s"dim $dim")
      // ...from fewer files than the table holds
      val filesRead = pruned.select(input_file_name()).distinct().count()
      assert(filesRead < nFiles, s"dim $dim read all $nFiles files")
    }
    // empty range: no files, empty frame with the right schema
    assert(FileStatsIndex.prunedRead(spark, zDir, "a",
      lit(maxA + 10), lit(maxA + 20)).count() == 0)
  }

  test("prunedRead keeps hive partition columns on a partitioned layout (basePath)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey").as("a"), col("l_suppkey").as("b"),
        (col("l_orderkey") % 4).as("p"))
    val dir = tmpDir("partstats")
    li.write.mode("overwrite").partitionBy("p").parquet(dir)
    FileStatsIndex.build(spark, dir, Seq("a"))
    val maxA = li.agg(max("a")).head().getLong(0)
    val pruned = FileStatsIndex.prunedRead(spark, dir, "a", lit(0L), lit(maxA / 4))
    // without basePath the leaf-file read would silently drop `p`
    assert(pruned.columns.contains("p"))
    val expected = spark.read.parquet(dir)
      .filter(col("a") >= 0L && col("a") <= maxA / 4)
      .groupBy("p").count().orderBy("p").collect().toSeq
    assert(pruned.groupBy("p").count().orderBy("p").collect().toSeq == expected)
    assert(pruned.count() > 0)
  }

  test("writeCuratedTable: one call yields a pruned-readable z layout in sync") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_partkey").as("a"), col("l_suppkey").as("b"))
    val dir = tmpDir("curated")
    ZOrder.writeCuratedTable(li, "a", "b", dir, numFiles = 8)
    val maxB = li.agg(max("b")).head().getLong(0)
    val pruned = FileStatsIndex.prunedRead(spark, dir, "b", lit(0L), lit(maxB / 8))
    val full = spark.read.parquet(dir).filter(col("b") >= 0L && col("b") <= maxB / 8)
    assert(pruned.count() == full.count() && pruned.count() > 0)
    assert(pruned.select(input_file_name()).distinct().count() <
      spark.read.parquet(dir).select(input_file_name()).distinct().count())
  }
}
