package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash sampling — the ClickHouse `SAMPLE f [OFFSET o]`
  * clause re-expressed for Spark (reference-adjacent surface: every table
  * the reference copies can declare `SAMPLE BY intHash32(key)`; ClickHouse
  * docs, SELECT … SAMPLE). Unlike `df.sample(f)` (RNG per task attempt —
  * unstable under retries and unjoinable across tables), a hash sample is
  * a PURE PREDICATE on the sampling key:
  *
  *   keep row ⇔ bucket(key) ∈ [offset·2^60, (offset+fraction)·2^60)
  *
  * which buys, at 100 TB, exactly what ClickHouse's clause buys:
  *
  *  - **Deterministic + replayable**: the same rows survive on every run,
  *    every retry, every executor count — a sampled pipeline stage is
  *    idempotent, so the shard-replay discipline keeps working.
  *  - **Consistent across tables**: sampling `orders` and `customer` by
  *    the SAME key (custkey) keeps referential pairs together, so a
  *    sampled join is a valid join of samples — the q157 emission proves
  *    it (sampled-join ≡ join-then-sample, bit-for-bit).
  *  - **Nested samples**: a 1% sample is a subset of the 10% sample
  *    (same hash, smaller prefix interval), so staged experiments reuse
  *    cached smaller tiers.
  *  - **Map-only**: no shuffle, no RNG state; the predicate is a codegen'd
  *    expression evaluated at the scan, and Catalyst prunes everything
  *    behind it.
  *
  * Sibling surface to the q59 deterministic train/val/test split
  * (CurationQueries.knuthBucket): the split PARTITIONS all rows into
  * named tiers by doc id, while SAMPLE takes a keyed fraction with
  * offset windows, nesting, and cross-table join consistency — the
  * ClickHouse clause's contract, not a re-spelling of the split.
  *
  * Two hash families, same split as the fingerprint/simhash operators:
  * the ORACLE-PORTABLE 60-bit md5-prefix bucket (DuckDB mirror in
  * [[graft.queries.PortableSql]]) for externally-checkable gates, and the
  * production xxhash64 bucket (native codegen, no md5 cost) whose
  * interval logic is identical — spec'd for determinism/nesting/fraction
  * accuracy in SampleSpec rather than oracle-gated. */
object Sample {

  /** Bits of the portable bucket space (md5-prefix hash, sign-safe). */
  val PortableBits = 60

  /** Bucket interval [lo, hi) for a (fraction, offset) pair, computed in
    * BigDecimal so the literal bound is exact and REPRODUCIBLE in the
    * oracle SQL text (a double multiply here could differ in the last
    * bit from the constant DuckDB parses). */
  def portableBounds(fraction: Double, offset: Double): (Long, Long) = {
    require(fraction > 0 && fraction <= 1, s"fraction $fraction not in (0,1]")
    require(offset >= 0 && offset + fraction <= 1,
      s"offset $offset + fraction $fraction leaves [0,1]")
    val space = BigDecimal(BigInt(1) << PortableBits)
    val lo = (space * BigDecimal(offset)).toBigInt.toLong
    val hi = (space * BigDecimal(offset + fraction)).toBigInt.toLong
    (lo, hi)
  }

  /** Portable sampling bucket of a key column: the 60-bit md5-prefix hash
    * over the key's canonical string (DuckDB mirror:
    * `CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)`). */
  def portableBucket(key: Column): Column =
    graft.dedup.Dedup.portableHash(key.cast("string"))

  /** The sample as a filter — compose onto any plan. */
  def portablePredicate(key: Column, fraction: Double, offset: Double = 0.0): Column = {
    val (lo, hi) = portableBounds(fraction, offset)
    val b = portableBucket(key)
    b >= lit(lo) && b < lit(hi)
  }

  /** `SAMPLE fraction OFFSET offset` over `df` keyed on `keyCol`. */
  def portable(df: DataFrame, keyCol: String, fraction: Double,
      offset: Double = 0.0): DataFrame =
    df.filter(portablePredicate(col(keyCol), fraction, offset))

  /** Production bucket: xxhash64 over the key's CANONICAL STRING form
    * (as [[portableBucket]] does), folded to the same non-negative 60-bit
    * space so the interval arithmetic — and the nesting property — carry
    * over. The string cast is what makes the cross-table consistency
    * guarantee real: xxhash64 hashes the same numeric value differently
    * for IntegerType vs LongType, so hashing raw columns would silently
    * de-correlate two tables whose shared key is stored at different
    * widths (an INT custkey in one table, BIGINT in the other) — ~f² of
    * referential pairs would survive instead of f, with no error. */
  def bucket(key: Column): Column =
    pmod(xxhash64(key.cast("string")), lit(1L << PortableBits))

  /** Production `SAMPLE fraction OFFSET offset` keyed on `keyCol`. */
  def apply(df: DataFrame, keyCol: String, fraction: Double,
      offset: Double = 0.0): DataFrame = {
    val (lo, hi) = portableBounds(fraction, offset)
    val b = bucket(col(keyCol))
    df.filter(b >= lit(lo) && b < lit(hi))
  }
}
