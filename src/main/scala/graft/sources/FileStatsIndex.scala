package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index — manifest-based data skipping.
  *
  * Parquet row-group pruning needs every file's FOOTER opened first; at
  * 100 TB / millions of files that footer sweep is itself the bottleneck
  * (and on object stores, a per-file round trip). The lakehouse answer
  * (Delta/Iceberg manifests) is a tiny side table of per-file column
  * ranges consulted BEFORE the scan, so non-qualifying files are never
  * opened, listed, or fetched. This is that index in plain parquet:
  *
  *  - [[build]]: one pass over the table computes (file, min, max) per
  *    indexed column and writes it next to the data (`<table>_stats`) —
  *    rebuild after writes, or maintain incrementally per new file.
  *  - [[prunedRead]]: filter the stats relation (files × columns rows,
  *    driver-bounded the same way the partition list is), then read ONLY
  *    the surviving files. The predicate is re-applied exactly, so an
  *    OVER-WIDE index (ranges looser than the data) only costs extra I/O.
  *    The manifest must stay in sync with the file SET, exactly like a
  *    Delta/Iceberg manifest: a file appended after [[build]] is invisible
  *    to [[prunedRead]] (silently missing rows) and a deleted file fails
  *    the read — rebuild (or incrementally extend) the index as part of
  *    every write, the same transaction discipline table formats impose.
  *
  * Pairs with [[ZOrder.writeClustered]]: z-ordered files have tight
  * rectangles on both clustering keys, so this index prunes on either
  * dimension; a linearly-sorted layout only ever prunes on its sort key.
  */
object FileStatsIndex {

  /** Per-file (path, n_rows, <col>_min, <col>_max …) stats relation. */
  def stats(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)

  /** Compute and persist the index for a parquet table directory. */
  def build(spark: SparkSession, tablePath: String, cols: Seq[String]): Unit =
    stats(spark.read.parquet(tablePath), cols)
      .coalesce(1).write.mode("overwrite").parquet(statsPath(tablePath))

  def statsPath(tablePath: String): String =
    tablePath.stripSuffix("/") + "_stats"

  /** Read only the files whose [min, max] range intersects [lo, hi] on
    * `column`, then re-apply the exact predicate. The driver materialises
    * just the surviving file LIST (≤ #files rows — the same bounded
    * cardinality the reconciler's partition list carries).
    *
    * `basePath` is passed to the leaf-file read so a HIVE-PARTITIONED
    * layout keeps its partition columns: reading leaf files directly
    * would otherwise silently drop `part=…` directory columns from the
    * schema (and break any predicate on them). Note the index itself
    * stores only IN-FILE column stats — to prune on a partition
    * directory column, use PartitionPredicate; this index prunes on data
    * columns within whatever files the partition filter left. */
  def prunedRead(spark: SparkSession, tablePath: String, column: String,
      lo: Column, hi: Column): DataFrame = {
    val files = spark.read.parquet(statsPath(tablePath))
      .filter(col(s"${column}_max") >= lo && col(s"${column}_min") <= hi)
      .select("file").collect().map(_.getString(0))
    val pruned =
      if (files.isEmpty) spark.read.parquet(tablePath).limit(0)
      else spark.read.option("basePath", tablePath).parquet(files: _*)
    pruned.filter(col(column) >= lo && col(column) <= hi)
  }
}
