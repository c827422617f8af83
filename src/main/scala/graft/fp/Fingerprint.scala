package graft.fp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent content fingerprints.
  *
  * Reference semantics: `SELECT groupBitXor(cityHash64(*)) FROM (SELECT cols
  * FROM t WHERE …)` (`/root/reference/database/database.go:509-530`) — XOR of
  * per-row 64-bit hashes, so equal row-multisets produce equal fingerprints
  * regardless of order. CityHash64 bit-parity is NOT required: the hash is
  * only ever compared against the same hash on the other side
  * (`/root/reference/copy/copy.go:237-241`), so any good 64-bit row hash
  * works. We use Spark's codegen'd `xxhash64` + `bit_xor` builtins — the
  * whole fingerprint stays inside whole-stage codegen and partial
  * aggregation, so at 100 TB each executor folds its partitions locally and
  * only 8 bytes per partition-group cross the shuffle.
  *
  * XOR caveat (inherited from the reference): rows appearing an even number
  * of times cancel out. We therefore always pair the fingerprint with a
  * count, as the reference pairs `CheckPartitionRowCount` with the hash
  * compare (`/root/reference/copy/copy.go:215,237`).
  */
object Fingerprint {

  /** 64-bit per-row hash over the given columns (null-safe: xxhash64 folds
    * nulls into the seed deterministically). */
  def rowHash(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** Aggregate fingerprint column: XOR of per-row hashes. */
  def agg(cols: Seq[Column]): Column = bit_xor(rowHash(cols))

  /** Whole-relation fingerprint + row count (single pass). */
  def ofDataFrame(df: DataFrame, cols: Seq[String] = Nil): (Long, Long) = {
    val cs = (if (cols.isEmpty) df.columns.toSeq else cols).map(col)
    val row = df.agg(
      coalesce(agg(cs), lit(0L)).as("fp"),
      count(lit(1)).as("rows")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** Per-partition fingerprints: one shuffle computes (partKey, rows, fp) for
    * every partition at once — the set-based replacement for the reference's
    * per-partition query loop (`/root/reference/copy/copy.go:194-271`), which
    * would issue 2×P scans. At 1000 executors this is a single map-side
    * partially-aggregated pass over the table.
    *
    * @param partKeys (alias, expression) pairs forming the partition key
    * @param cols     content columns to fingerprint (post-cast on the source
    *                 side — see Reconciler for the B18 asymmetry)
    */
  def byPartition(df: DataFrame, partKeys: Seq[(String, Column)], cols: Seq[Column]): DataFrame =
    df.groupBy(partKeys.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("rows"), agg(cols).as("fp"))

  /** Incremental fingerprint maintenance — the reason XOR (not a sum or a
    * sketch) is the right aggregate at 100 TB: XOR is its own inverse, so a
    * stored per-partition (rows, fp) table updates from a DELTA alone.
    * Appends fold in as `fp ⊕ fp(delta)`; deletions fold in the SAME way
    * (re-XOR of the removed rows cancels them). A daily reconcile of an
    * append-only table therefore scans the day's delta, never the table:
    * O(delta + partitions) instead of O(table).
    *
    * `stored` must have columns (partCols..., rows, fp) as produced by
    * [[byPartition]]; `deltaRows` counts sign (+1 append, -1 delete).
    * Partitions that end at rows==0 drop out. Spec-verified:
    * merge(byPartition(old), delta) == byPartition(old ∪ delta). */
  def mergeDelta(stored: DataFrame, delta: DataFrame, partCols: Seq[String],
      deltaSign: Int = 1): DataFrame = {
    val d = delta.withColumnRenamed("rows", "__d_rows")
      .withColumnRenamed("fp", "__d_fp")
    stored.join(d, partCols, "full_outer")
      .select(partCols.map(col) ++ Seq(
        (coalesce(col("rows"), lit(0L)) +
          lit(deltaSign) * coalesce(col("__d_rows"), lit(0L))).as("rows"),
        coalesce(col("fp"), lit(0L))
          .bitwiseXOR(coalesce(col("__d_fp"), lit(0L))).as("fp")): _*)
      .filter(col("rows") > 0)
  }
}
