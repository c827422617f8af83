package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping.
  *
  * Parquet prunes row groups by column min/max. Sorting a table by ONE
  * column makes that column's ranges tight and every other column's ranges
  * useless; at 100 TB, a query filtering on the OTHER dimension then reads
  * the whole table. Interleaving the bits of two key columns into one
  * z-value and range-sorting the write by it gives every file a bounded
  * rectangle in (a, b) space — min/max stays selective on BOTH dimensions
  * (the classic lakehouse `OPTIMIZE ZORDER BY` layout, e.g. Delta/Iceberg).
  *
  * The bit-spread is the standard binary-magic-numbers dilation (public
  * domain, "Interleave bits by Binary Magic Numbers", Stanford bit-hacks
  * collection), expressed in Spark integer builtins so it runs inside
  * whole-stage codegen AND can be mirrored verbatim in ANSI SQL for the
  * DuckDB oracle — no UDF, no native code.
  *
  * Keys are first rank-normalised by the caller (or truncated) into
  * [0, 2^16); 16+16 bits → one positive 32-bit z-value in a long.
  */
object ZOrder {

  /** Dilate the low 16 bits of `x` so bit i moves to bit 2i (magic-number
    * spread: x | x<<8 … masked at each step). Input must be in [0, 2^16). */
  def spread16(x: Column): Column = {
    val s0 = x.cast("long")
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two 16-bit keys: a's bits at even positions, b's at
    * odd. Total order = the Z space-filling curve over the (a, b) grid. */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Linearly scale a non-negative column into the full 16-bit key domain:
    * `floor(c / (maxValue+1) * 2^16)`. Order-preserving, and — unlike a
    * plain bit shift — it uses ALL 16 bits even when the column's natural
    * domain is small, so the interleave genuinely alternates between the
    * two dimensions at every split granularity. (`maxValue` = the column's
    * inclusive upper bound; production callers get it from stats or a
    * sample, exactly like `repartitionByRange`'s boundary sampling.) */
  def scale16(c: Column, maxValue: Long): Column =
    floor(c.cast("double") / (maxValue + 1.0) * 65536.0).cast("long")

  /** Write `df` z-clustered on (a, b): range-repartition + sort by the
    * z-value so each output file covers one compact curve segment (a
    * bounded rectangle per row group in (a, b) space). The z column itself
    * is dropped — it exists only to drive the layout. */
  def writeClustered(df: DataFrame, a: Column, b: Column, maxA: Long,
      maxB: Long, path: String, numFiles: Int): Unit = {
    val z = zValue(scale16(a, maxA), scale16(b, maxB))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The full curated-table write a 100 TB consumer actually wants, in one
    * call: z-clustered layout on two skipping keys + the per-file min/max
    * manifest built from the SAME write (the [[FileStatsIndex]] sync
    * discipline by construction), so
    * `FileStatsIndex.prunedRead(spark, path, "a" | "b", lo, hi)` skips
    * files on either dimension immediately afterwards. `statCols` defaults
    * to the two clustering keys; pass more to index extra columns. */
  def writeCuratedTable(df: DataFrame, aName: String, bName: String,
      path: String, numFiles: Int, statCols: Seq[String] = Nil): Unit = {
    // max() over zero rows (or all-null keys) is null — an empty input is a
    // legal boundary (a filter-everything pipeline) and writes an empty
    // table, not a MatchError
    val r = df.agg(max(col(aName).cast("long")), max(col(bName).cast("long"))).head()
    val maxA = if (r.isNullAt(0)) 0L else r.getLong(0)
    val maxB = if (r.isNullAt(1)) 0L else r.getLong(1)
    writeClustered(df, col(aName), col(bName), maxA, maxB, path, numFiles)
    // statCols EXTENDS the clustering keys (their manifest entries back the
    // documented prunedRead-on-either-dimension guarantee)
    FileStatsIndex.build(df.sparkSession, path,
      (Seq(aName, bName) ++ statCols).distinct)
  }
}
