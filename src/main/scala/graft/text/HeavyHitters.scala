package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT corpus heavy hitters without a full-vocabulary shuffle — the
  * two-pass Misra-Gries design (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * q64 computes the full token frequency table: one shuffle whose key
  * space is the VOCABULARY — fine when the vocabulary is bounded, but a
  * 100 TB web corpus's token space (URLs, hashes, typos) is effectively
  * unbounded and the shuffle carries almost-all-unique keys. The
  * heavy-hitter question ("every token above frequency n/φ") doesn't need
  * that shuffle:
  *
  *  - **Pass 1 (map-only):** each partition builds a k-counter
  *    Misra-Gries sketch over its own tokens — O(k) memory, zero shuffle.
  *    The local guarantee: a token with in-partition count f_p keeps a
  *    sketch count ≥ f_p − n_p/(k+1).
  *  - **Candidates:** the union of all partitions' sketch entries —
  *    ≤ P·k rows, a bounded relation (NOT corpus-scaled). Summing the
  *    local bounds over partitions: a token with global count
  *    f ≥ n/φden retains Σ ≥ f − n/(k+1) > 0 whenever k+1 > φden, so
  *    with k = 2·φden every true heavy hitter appears in at least one
  *    partition sketch — NO FALSE NEGATIVES, by construction, for any
  *    adversarial distribution of the token across partitions.
  *  - **Pass 2 (exact):** re-scan the tokens, keep only candidate tokens
  *    (broadcast hash semi-join against the bounded candidate relation —
  *    the filter runs map-side, BEFORE any shuffle), count exactly, and
  *    apply the threshold n·(1/φden) exactly. False positives from the
  *    sketch die here; the emission is therefore EXACT and deterministic
  *    regardless of partitioning — which is what makes it hash-gateable
  *    against a DuckDB oracle that just runs the full GROUP BY.
  *
  * Shuffle volume: candidates only (≤ P·k keys), versus the vocabulary.
  */
object HeavyHitters {

  /** Misra-Gries k-counter sketch of one iterator. Returns the surviving
    * (token, kept-count) entries — at most k of them. */
  private[text] def mgSketch(
      toks: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counters = new java.util.HashMap[String, java.lang.Long](k * 2)
    toks.foreach { t =>
      val c: Long = counters.getOrDefault(t, 0L)
      if (c > 0L) counters.put(t, c + 1L)
      else if (counters.size < k) counters.put(t, 1L)
      else {
        // decrement step: all counters down by one, drop zeros
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.entrySet().asScala
      .map(e => (e.getKey, e.getValue.longValue())).toVector.iterator
  }

  /** Exact heavy hitters: every token of `docs.text` whose exact count c
    * satisfies c · φden ≥ n (n = total token count), emitted with its
    * exact count. `k` defaults to 2·φden, the no-false-negative bound
    * above. Tokens are the engine-standard whitespace split (the
    * PortableSql mirror). */
  def exactHeavyHitters(docs: DataFrame, phiDen: Long,
      k: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kEff = if (k > 0) k else (2 * phiDen).toInt
    def toks: Dataset[String] = docs.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .as[String]
    // pass 1: per-partition sketches -> bounded candidate relation
    // (≤ partitions·k rows — never corpus-scaled)
    val candidates = toks
      .mapPartitions(it => mgSketch(it, kEff))
      .toDF("tok", "kept").select("tok").distinct()
    // pass 2: exact counts for candidates only; the broadcast is the
    // BOUNDED candidate set (caller-asserted via explicit hint)
    val counts = toks.toDF("tok")
      .join(broadcast(candidates), Seq("tok"), "left_semi")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = toks.toDF("tok").agg(count(lit(1)).as("n"))
    counts.crossJoin(broadcast(total))
      .filter(col("cnt") * phiDen >= col("n"))
      .select(col("tok"), col("cnt"))
  }
}
