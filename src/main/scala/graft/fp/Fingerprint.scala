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
}
