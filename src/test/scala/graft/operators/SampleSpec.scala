package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hash-sample contract — the properties that distinguish it from
  * `df.sample()` and that the 100 TB uses depend on: determinism under
  * re-execution, nesting of fractions, disjointness of offset windows,
  * cross-table consistency (a sampled join is a join of samples), and
  * fraction accuracy. The portable (md5) family is additionally
  * oracle-gated end to end by q157; the production (xxhash64) family gets
  * its guarantees here. */
class SampleSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet(s"$sf001/orders.parquet")

  test("portable: deterministic, nested, offset windows partition the space") {
    val ten = Sample.portable(orders, "o_custkey", 0.10)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val again = Sample.portable(orders, "o_custkey", 0.10)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(ten == again, "same predicate, different rows — not deterministic")
    // nesting: the 5% sample is a subset of the 10% sample (same hash,
    // prefix interval) — staged experiments can reuse the smaller tier
    val five = Sample.portable(orders, "o_custkey", 0.05)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(five.subsetOf(ten), "5% sample not nested in the 10% sample")
    // offset windows are disjoint and union to the wider window
    val w0 = Sample.portable(orders, "o_custkey", 0.05, offset = 0.0)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val w1 = Sample.portable(orders, "o_custkey", 0.05, offset = 0.05)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert((w0 & w1).isEmpty)
    assert((w0 | w1) == ten)
  }

  test("portable: sampled join ≡ join of per-table samples (shared key)") {
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
    val joinOfSamples = Sample.portable(orders, "o_custkey", 0.2)
      .join(Sample.portable(cust, "c_custkey", 0.2),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val sampleOfJoin = Sample.portable(
        orders.join(cust, col("o_custkey") === col("c_custkey")),
        "o_custkey", 0.2)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(joinOfSamples == sampleOfJoin,
      "hash sampling lost join consistency — keys diverged across tables")
  }

  test("production (xxhash64): deterministic, nested, accurate on 100k keys") {
    val keys = spark.range(100000).select(col("id").as("k"))
    val ten = Sample(keys, "k", 0.10).collect().map(_.getLong(0)).toSet
    assert(ten == Sample(keys, "k", 0.10).collect().map(_.getLong(0)).toSet)
    val five = Sample(keys, "k", 0.05).collect().map(_.getLong(0)).toSet
    assert(five.subsetOf(ten))
    // binomial(100k, 0.1): sd ≈ 95 keys; ±5σ band
    assert(math.abs(ten.size - 10000) < 500, s"10% of 100k keys gave ${ten.size}")
    assert(math.abs(five.size - 5000) < 400, s"5% of 100k keys gave ${five.size}")
  }

  test("portable: fraction accuracy at the key level") {
    val keys = spark.range(20000).select(col("id").as("k"))
    val n = Sample.portable(keys, "k", 0.10).count()
    // binomial(20k, 0.1): sd ≈ 42; ±5σ
    assert(math.abs(n - 2000L) < 250, s"10% of 20k keys gave $n")
  }

  test("production: cross-table consistency survives key-type width skew") {
    // the same key VALUE stored at different widths (INT in one table,
    // BIGINT in another) must land in the same bucket — the canonical
    // string cast inside bucket() is what makes the documented
    // join-consistency guarantee real (raw xxhash64 hashes IntegerType
    // and LongType differently)
    val asLong = spark.range(5000).select(col("id").cast("long").as("k"))
    val asInt = spark.range(5000).select(col("id").cast("int").as("k"))
    def keep(df: org.apache.spark.sql.DataFrame) =
      Sample(df, "k", 0.2).select(col("k").cast("long"))
        .collect().map(_.getLong(0)).toSet
    assert(keep(asLong) == keep(asInt),
      "sample survivors diverged across key widths — joins of samples would silently shrink")
  }

  test("bounds validation") {
    intercept[IllegalArgumentException](Sample.portableBounds(0.0, 0.0))
    intercept[IllegalArgumentException](Sample.portableBounds(0.5, 0.6))
    val (lo, hi) = Sample.portableBounds(1.0, 0.0)
    assert(lo == 0L && hi == (1L << Sample.PortableBits))
  }
}
