package graft.fp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf001/lineitem.parquet")

  test("fingerprint is order-independent (reference groupBitXor semantics)") {
    val a = Fingerprint.ofDataFrame(li)
    val b = Fingerprint.ofDataFrame(li.orderBy(rand(7)))
    val c = Fingerprint.ofDataFrame(li.repartition(13))
    assert(a == b && a == c)
  }

  test("fingerprint is sensitive to single-value perturbation") {
    val (fp, n) = Fingerprint.ofDataFrame(li)
    val perturbed = li.withColumn("l_quantity",
      when(col("l_orderkey") === li.select("l_orderkey").head().getLong(0),
        col("l_quantity") + 1).otherwise(col("l_quantity")))
    val (fp2, n2) = Fingerprint.ofDataFrame(perturbed)
    assert(n == n2 && fp != fp2)
  }

  test("fingerprint of empty relation is 0 with count 0") {
    assert(Fingerprint.ofDataFrame(li.filter(lit(false))) == (0L, 0L))
  }

  test("byPartition totals reconcile with whole-table counts") {
    val parts = Fingerprint.byPartition(li,
      Seq("part" -> date_format(col("l_shipdate"), "yyyyMM")),
      li.columns.toSeq.map(col))
    val total = parts.agg(sum("rows")).head().getLong(0)
    assert(total == li.count())
    // partition fingerprints XOR to... not the table fp in general, but each
    // partition's fp matches an independent filtered computation
    val one = parts.orderBy("part").head()
    val filtered = li.filter(date_format(col("l_shipdate"), "yyyyMM") === one.getString(0))
    val (fp, n) = Fingerprint.ofDataFrame(filtered)
    assert(one.getLong(1) == n && one.getLong(2) == fp)
  }

  test("mergeDelta: append and delete deltas reproduce a full recompute") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val keys = Seq("part" -> date_format(col("l_shipdate"), "yyyyMM"))
    val cols = li.columns.toSeq.map(col)
    val old = li.filter(col("l_orderkey") % 5 =!= 0)
    val delta = li.filter(col("l_orderkey") % 5 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("part").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // append: stored(old) + delta == recompute(old ∪ delta)
    val merged = Fingerprint.mergeDelta(
      Fingerprint.byPartition(old, keys, cols),
      Fingerprint.byPartition(delta, keys, cols), Seq("part"))
    assert(canon(merged) == canon(Fingerprint.byPartition(li, keys, cols)))
    // delete: stored(all) - delta == recompute(old); emptied partitions drop
    val removed = Fingerprint.mergeDelta(
      Fingerprint.byPartition(li, keys, cols),
      Fingerprint.byPartition(delta, keys, cols), Seq("part"), deltaSign = -1)
    assert(canon(removed) == canon(Fingerprint.byPartition(old, keys, cols)))
  }
}
