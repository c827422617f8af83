package graft.recon

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level snapshot diff — the CDC complement to [[Reconciler]]'s
  * partition-level verdicts.
  *
  * `Reconciler.verdicts` answers "WHICH partitions differ" in one
  * 16-bytes-per-partition aggregate; this answers "which ROWS differ" when
  * a partition is dirty and you want the minimal change set (incremental
  * replication, audit, or a targeted repair smaller than a partition
  * rewrite). The reference engine can only rewrite whole partitions
  * (`/root/reference/copy/copy.go:248-271`); row-level diff is the
  * finer-grained capability its users ask the pattern for.
  *
  * Scale shape: each side collapses its value columns to ONE 8-byte
  * `xxhash64` in the scan stage, so the full-outer join shuffles
  * key + 8 bytes per row — never the payload. At 100 TB with a 16-byte
  * key that is ~2.4% of table bytes on the wire; the join itself is a
  * plain shuffle hash/sort-merge on the key (AQE-elastic, skew-split).
  * Hash equality stands in for value equality (64-bit xxhash: collision
  * odds ~n²/2⁶⁵ — at a billion rows, ~3%·10⁻⁷; a colliding row pair would
  * be reported `unchanged` — acceptable for replication triage, and the
  * follow-up copy re-verifies with [[Reconciler]] fingerprints anyway).
  *
  * Verdicts are from dst's point of view, i.e. "what must happen to dst
  * to match src": `insert` (src-only key), `delete` (dst-only key),
  * `update` (both sides, differing value hash). Unchanged rows never
  * leave the join.
  */
object SnapshotDiff {

  /** (keyCols..., change) — one row per key whose state differs between
    * the two snapshots. Keys must be unique per side (enforce upstream;
    * duplicate keys make per-row comparison ill-defined on any engine). */
  def diff(src: DataFrame, dst: DataFrame, keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+
        xxhash64(valueCols.map(col): _*).as(as): _*)
    hashed(src, "__src_h").join(hashed(dst, "__dst_h"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__dst_h").isNull, "insert")
          .when(col("__src_h").isNull, "delete")
          .when(col("__src_h") =!= col("__dst_h"), "update"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
