package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom filter over [[Dedup.portableHash]] keys — the
  * 100 TB-scale form of set membership for decontamination (q114's exact
  * broadcast set becomes a FIXED-SIZE bitmap):
  *
  *  - the filter is `mBits` bits stored as `mBits/32` longs of 32 used
  *    bits each — 64 KiB of bitmap rows for the default 2^19 bits — so
  *    the broadcast cost is O(mBits) REGARDLESS of how many benchmark
  *    keys went in (q114 broadcasts the whole distinct-key set, which a
  *    large held-out suite makes gigabytes);
  *  - k = 2 probe positions come from disjoint bit ranges of the 60-bit
  *    portable hash (`h mod m` and `(h >> log2m) mod m`), so the DuckDB
  *    oracle recomputes every position with plain `%` / `//` arithmetic
  *    (h is non-negative, making pmod/% and shift/`//` agree exactly);
  *  - membership has NO FALSE NEGATIVES by construction; false positives
  *    occur at rate ~(1 - e^(-2n/m))^2 (n inserted keys) — 0.4% at
  *    n = m/8. Callers that must be exact re-verify bloom hits against
  *    the true key set; callers that only need a conservative KEEP/DROP
  *    (decontamination drops flagged docs) use the bloom verdict alone.
  *
  * 32 used bits per word (not 64) keeps every mask and OR positive and
  * below 2^32: no engine's `1 << 63` sign/overflow edge is in play, and
  * the bitmap still broadcasts at double the row count of the 64-bit
  * packing — irrelevant against the word count (mBits/32 rows).
  *
  * Scale shape: building the bitmap is one explode + one `bit_or`
  * aggregate over ≤ mBits/32 groups; probing is two broadcast-hash
  * equi-joins on the word index (map-side after the broadcast) — the
  * only corpus-sized exchange a probe pays is its own downstream
  * aggregate. Reference semantics: the content-fingerprint membership
  * family (`/root/reference/database/database.go:511` — cityHash64 row
  * fingerprints compared across sides), re-expressed as a sketch the
  * cluster can broadcast instead of a full hash-set exchange.
  */
object Bloom {
  /** log2 of the filter size in bits; mBits = 2^19 = 524288 bits =
    * 16384 words. Gate-pinned so the oracle SQL spells the same shape. */
  val Log2M = 19
  val MBits: Long = 1L << Log2M
  private val WordBits = 32L

  /** k=2 probe positions of a non-negative 60-bit hash. Power-of-two
    * modulus → bit ops Spark-side; the oracle mirrors with `%` and `//`
    * (equal for non-negative operands). */
  private[graft] def positions(h: Column, log2m: Int): Seq[Column] = Seq(
    h.bitwiseAND(lit((1L << log2m) - 1)),
    shiftright(h, log2m).bitwiseAND(lit((1L << log2m) - 1)))

  /** Bitmap relation (w: long, bits: long) from a key relation holding
    * non-negative hashes in `hCol`. ≤ mBits/32 rows — always
    * broadcastable. `log2m` below the default shrinks the filter (specs
    * plant false positives that way); production keeps the default. */
  def bitmap(keys: DataFrame, hCol: String, log2m: Int = Log2M): DataFrame =
    keys.select(explode(array(positions(col(hCol), log2m): _*)).as("__p"))
      .select(shiftright(col("__p"), 5).as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__p & 31 AS INT))").as("__m"))
      .groupBy("w").agg(bit_or(col("__m")).as("bits"))

  /** Adds `bloom_hit` (boolean, never null) to a relation holding
    * non-negative hashes in `hCol`: true iff BOTH probe bits are set.
    * The bitmap joins broadcast (bounded at mBits/32 rows by
    * construction); words absent from the bitmap are all-zero. */
  def probe(df: DataFrame, hCol: String, bm: DataFrame,
      log2m: Int = Log2M): DataFrame = {
    val Seq(p1, p2) = positions(col(hCol), log2m)
    def side(i: Int) = bm.select(col("w").as(s"__w$i"), col("bits").as(s"__bits$i"))
    df.withColumn("__p1", p1).withColumn("__p2", p2)
      .join(broadcast(side(1)), shiftright(col("__p1"), 5) === col("__w1"), "left")
      .join(broadcast(side(2)), shiftright(col("__p2"), 5) === col("__w2"), "left")
      .withColumn("bloom_hit",
        coalesce(col("__bits1"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(__p1 & 31 AS INT))")) =!= 0L &&
        coalesce(col("__bits2"), lit(0L))
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(__p2 & 31 AS INT))")) =!= 0L)
      .drop("__p1", "__p2", "__w1", "__w2", "__bits1", "__bits2")
  }
}
