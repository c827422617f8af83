package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-filtered semi join — the "runtime filter" pattern made
  * explicit.
  *
  * At 100 TB the expensive part of `fact SEMI JOIN dim` is shuffling the
  * fact side: every fact row crosses the wire just to be thrown away by the
  * join. A Bloom filter built over the dim keys and evaluated map-side on
  * the fact scan drops the non-matching fact rows BEFORE the shuffle, so
  * the exchange carries only (matches + false positives) — with fpp=3%,
  * ~97% of a non-matching corpus never leaves the scan stage. The final
  * exact semi join then removes the false positives, so the RESULT is
  * exact; the Bloom stage only reduces work. (Spark's AQE injects the same
  * shape automatically in some plans — `InjectRuntimeFilter` — but only for
  * selective broadcast-able creation sides; this operator is the explicit,
  * always-available form, same construction the optimizer rule uses:
  * `BloomFilterAggregate` build + `BloomFilterMightContain` probe.)
  *
  * The sketch is a bounded-size binary (numBits/8 bytes, default ~1.1 MB
  * for 1M keys at 3% fpp) collected once on the driver and inlined as a
  * literal — the same driver-resident footprint as a broadcast var, with
  * zero per-executor rebuild. Keys are hashed to 64 bits (`xxhash64`)
  * before both build and probe, so any key type works and the sketch sees
  * fixed-width input.
  */
object BloomJoin {

  /** Serialized Bloom filter (Spark's `util.sketch.BloomFilter` wire
    * format) over `xxhash64(key)` for every row of `df`. */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(toExpr(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.select(toColumn(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Map-side membership probe against a serialized Bloom filter. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType), toExpr(xxhash64(key))))

  /** Exact left-semi join of `fact` against `dim`'s key set, with the
    * Bloom pre-filter applied to the fact scan so non-matching rows are
    * dropped before any exchange. `expectedItems` sizes the sketch (an
    * over-estimate only wastes bits; an under-estimate raises fpp). */
  def semiJoin(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, fpp)
    val keys = dim.select(dimKey.as("__bj_key"))
    fact.filter(mightContain(bloom, factKey))
      .join(keys, factKey === col("__bj_key"), "left_semi")
  }
}
