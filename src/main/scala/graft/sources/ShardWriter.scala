package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

/** Evenly-sized shard output — the write-side dual of partition sizing.
  *
  * A naive `df.write.parquet(dir)` emits one file per task: after a
  * filter-heavy pipeline those range from empty to multi-GB (the
  * small-files / giant-file problem that poisons downstream scan
  * parallelism at 100 TB — a training job reading 10M tiny shards spends
  * its time in file-open overhead; one 50 GB shard serialises a whole
  * executor).
  *
  * `evenShards` bounds both ends: `repartition(numFiles)` spreads rows
  * round-robin so every task holds ~rows/numFiles, and
  * `maxRecordsPerFile` is the hard upper cap no file can exceed whatever
  * the partitioning does. The row count comes from the caller (production
  * pipelines know it from the previous stage's metrics or table metadata;
  * `run`-style callers can pass a `count()`).
  */
object ShardWriter {

  /** Number of shard files for `totalRows` at `rowsPerFile`. */
  def shardCount(totalRows: Long, rowsPerFile: Long): Int = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    math.max(1L, (totalRows + rowsPerFile - 1) / rowsPerFile).toInt
  }

  /** A writer that produces ceil(totalRows/rowsPerFile) shards of
    * ≤ rowsPerFile rows each, evenly filled. Compose further (partitionBy,
    * format, mode) before `.save`/`.parquet`. */
  def evenShards(df: DataFrame, totalRows: Long, rowsPerFile: Long): DataFrameWriter[Row] =
    df.repartition(shardCount(totalRows, rowsPerFile))
      .write.option("maxRecordsPerFile", rowsPerFile)
}
