package graft.recon

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fp.Fingerprint
import graft.recon.Reconciler._

/** Reconciliation scenarios from FIXTURES.md §B — the reference's decision
  * ladder (copy/copy.go:237-266) exercised end-to-end, including repair. */
class ReconcilerSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sf001/lineitem.parquet")
  private def withPart(df: DataFrame) =
    df.withColumn("part", date_format(col("l_shipdate"), "yyyyMM"))
  private val partKeys = Seq("part" -> col("part"))
  private def cols(df: DataFrame) = li.columns.toSeq.map(col)

  test("identical tables -> all skip") {
    val src = withPart(li)
    val v = verdicts(src, src, partKeys, cols(li), cols(li)).collect()
    assert(v.nonEmpty && v.forall(_.getAs[String]("verdict") == Verdict.Skip))
  }

  test("dest missing partition -> copy via count==0 short-circuit") {
    val src = withPart(li)
    val dst = src.filter(col("part") =!= "199607")
    val v = verdicts(src, dst, partKeys, cols(li), cols(li))
    assert(v.filter(col("verdict") === Verdict.Copy).select("part")
      .collect().map(_.getString(0)).toSeq == Seq("199607"))
  }

  test("dest corrupted partition -> delete_recopy; dest extra partition -> dest_only") {
    val src0 = withPart(li)
    val src = src0.filter(col("part") =!= "199711")
    val dst = src0.withColumn("l_quantity",
      when(col("part") === "199609" && col("l_linenumber") === 1, col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    val v = verdicts(src, dst, partKeys, cols(li), cols(li))
    val byVerdict = v.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byVerdict(Verdict.DeleteRecopy) == 1L)
    assert(byVerdict(Verdict.DestOnly) == 1L)
    assert(v.filter(col("verdict") === Verdict.DestOnly).head().getString(0) == "199711")
  }

  test("check_hashes=false compares row counts only (config.go:34)") {
    val src = withPart(li)
    // same counts, different content: hash mode flags it, count mode skips
    val dst = src.withColumn("l_quantity",
      when(col("part") === "199610" && col("l_linenumber") === 1, col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    val hashMode = verdicts(src, dst, partKeys, cols(li), cols(li))
    val countMode = verdicts(src, dst, partKeys, cols(li), cols(li), Config(checkHashes = false))
    assert(hashMode.filter(col("verdict") === Verdict.DeleteRecopy).count() == 1)
    assert(countMode.filter(col("verdict") === Verdict.DeleteRecopy).count() == 0)
  }

  test("B18 asymmetry: source fingerprint over cast expressions") {
    val src = withPart(li).withColumn("l_quantity", col("l_quantity").cast("string"))
    val dst = withPart(li)
    val srcCols = li.columns.toSeq.map {
      case "l_quantity" => col("l_quantity").cast("double")
      case c => col(c)
    }
    val v = verdicts(src, dst, partKeys, srcCols, cols(li))
    assert(v.collect().forall(_.getAs[String]("verdict") == Verdict.Skip))
  }

  test("null partition keys match null-safely (one skip row, no Copy+DestOnly split)") {
    val src = li.withColumn("part",
      when(col("l_orderkey") % 97 === 0, lit(null))
        .otherwise(date_format(col("l_shipdate"), "yyyyMM")))
    val v = verdicts(src, src, partKeys, cols(li), cols(li))
    val nullRows = v.filter(col("part").isNull).collect()
    assert(nullRows.length == 1, "null key must join with itself exactly once")
    assert(nullRows.head.getAs[String]("verdict") == Verdict.Skip)
    assert(v.collect().forall(_.getAs[String]("verdict") == Verdict.Skip))
  }

  test("preflight warnings (copy.go:35-41,162-168)") {
    assert(preflight(100, 100).size == 1)
    assert(preflight(100, 150).size == 1)
    assert(preflight(150, 100).isEmpty)
    assert(preflight(100, 100).head.contains("equal"))
  }

  test("repair end-to-end: corrupt dest, repair, fingerprints equal") {
    val dstPath = tmpDir("recon-dst")
    val src = withPart(li)
    // dest: one partition missing, one corrupted
    src.filter(col("part") =!= "199605")
      .withColumn("l_quantity",
        when(col("part") === "199606" && col("l_linenumber") === 1, col("l_quantity") + 99)
          .otherwise(col("l_quantity")))
      .write.partitionBy("part").mode("overwrite").parquet(dstPath)

    def readDst = spark.read.parquet(dstPath)
      .select(src.columns.map(col): _*) // partition col order normalization
    val v1 = verdicts(src, readDst, partKeys, cols(li), cols(li))
    val repaired = repair(spark, v1, src, "part", dstPath)
    assert(repaired.map(_.toString).toSet == Set("199605", "199606"))

    val v2 = verdicts(src, readDst, partKeys, cols(li), cols(li))
    assert(v2.collect().forall(_.getAs[String]("verdict") == Verdict.Skip))
    val (fpS, nS) = Fingerprint.ofDataFrame(src.select(cols(li): _*))
    val (fpD, nD) = Fingerprint.ofDataFrame(readDst.select(cols(li): _*))
    assert(fpS == fpD && nS == nD)
  }

  /** Build a dest where exactly partition 199607 is corrupted; returns
    * (dstPath, readDst, rows in the corrupt dest partition). */
  private def corruptDest(src: DataFrame): (String, () => DataFrame, Long) = {
    val dstPath = tmpDir("recon-flags")
    src.withColumn("l_quantity",
      when(col("part") === "199607" && col("l_linenumber") === 1, col("l_quantity") + 99)
        .otherwise(col("l_quantity")))
      .write.partitionBy("part").mode("overwrite").parquet(dstPath)
    val readDst = () => spark.read.parquet(dstPath).select(src.columns.map(col): _*)
    (dstPath, readDst, readDst().filter(col("part") === "199607").count())
  }

  test("skip_delete still re-copies: appends source partition without deleting (copy.go:248-257)") {
    val src = withPart(li)
    val (dstPath, readDst, before) = corruptDest(src)
    val srcPartRows = src.filter(col("part") === "199607").count()
    val v = verdicts(src, readDst(), partKeys, cols(li), cols(li))
    val repaired = repair(spark, v, src, "part", dstPath, Config(skipDelete = true))
    assert(repaired.map(_.toString) == Seq("199607"))
    // copy-without-delete duplicates, exactly as the reference's INSERT would
    assert(readDst().filter(col("part") === "199607").count() == before + srcPartRows)
  }

  test("skip_reimport still deletes: partition removed and left empty (copy.go:248-257)") {
    val src = withPart(li)
    val (dstPath, readDst, _) = corruptDest(src)
    val v = verdicts(src, readDst(), partKeys, cols(li), cols(li))
    val repaired = repair(spark, v, src, "part", dstPath, Config(skipReimport = true))
    assert(repaired.map(_.toString) == Seq("199607"))
    assert(readDst().filter(col("part") === "199607").count() == 0)
    assert(readDst().filter(col("part") === "199606").count() > 0, "other partitions untouched")
  }

  test("parallelism>1: concurrent per-partition repair converges like the fused path") {
    val dstPath = tmpDir("recon-par")
    val src = withPart(li)
    // three dirty partitions: two corrupted, one missing
    src.filter(col("part") =!= "199605")
      .withColumn("l_quantity",
        when((col("part") === "199606" || col("part") === "199608") && col("l_linenumber") === 1,
          col("l_quantity") + 99).otherwise(col("l_quantity")))
      .write.partitionBy("part").mode("overwrite").parquet(dstPath)
    def readDst = spark.read.parquet(dstPath).select(src.columns.map(col): _*)
    val v1 = verdicts(src, readDst, partKeys, cols(li), cols(li))
    val repaired = repair(spark, v1, src, "part", dstPath, Config(parallelism = 3))
    assert(repaired.map(_.toString).toSet == Set("199605", "199606", "199608"))
    val v2 = verdicts(src, readDst, partKeys, cols(li), cols(li))
    assert(v2.collect().forall(_.getAs[String]("verdict") == Verdict.Skip))
    val (fpS, nS) = Fingerprint.ofDataFrame(src.select(cols(li): _*))
    val (fpD, nD) = Fingerprint.ofDataFrame(readDst.select(cols(li): _*))
    assert(fpS == fpD && nS == nD)
  }

  test("skip_delete + skip_reimport leaves corrupted partitions untouched") {
    val src = withPart(li)
    val (dstPath, readDst, before) = corruptDest(src)
    val v = verdicts(src, readDst(), partKeys, cols(li), cols(li))
    val repaired = repair(spark, v, src, "part", dstPath,
      Config(skipDelete = true, skipReimport = true))
    assert(repaired.isEmpty)
    assert(readDst().filter(col("part") === "199607").count() == before)
    val v2 = verdicts(src, readDst(), partKeys, cols(li), cols(li))
    assert(v2.filter(col("verdict") === Verdict.DeleteRecopy).count() == 1)
  }
}
