package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.TopKAggregate

/** Hybrid (sparse ⊕ dense) retrieval — reciprocal-rank fusion.
  *
  * RRF (Cormack et al., SIGIR 2009) fuses any number of per-query ranked
  * lists without score calibration: each list contributes
  * `1 / (rrfK + rank)` for every (query, doc) it ranks, and documents
  * order by the summed contribution. That rank-only contract is exactly
  * why it is THE production default for BM25 ⊕ embedding retrieval — the
  * two scores live on incomparable scales (quantised-idf longs vs
  * cosines), and fusion must not depend on either calibration.
  *
  * Exactness discipline (the [[graft.text.Retrieval.rankTopK]] rule): the
  * contribution is quantised to the LONG `floor(1e9 / (rrfK + rank))`
  * before summing, so the fused ordering is integer arithmetic — no
  * float-sum association order to drift between engines, and the DuckDB
  * oracle reproduces it bit-for-bit. With rrfK = 60 and rank ≥ 1 the
  * quantisation step (~1e9/61² ≈ 2.7e5) dwarfs any honest tie, and
  * residual ties break deterministically by doc_id ASC.
  *
  * Scale shape (100 TB): each input list is already k-bounded per query
  * (top-k from an index probe), so the union is |queries| × k × |lists|
  * rows — the fusion itself never touches the corpus. The one shuffle is
  * the (query_id, doc_id) partial+final sum, followed by the k-bounded
  * [[TopKAggregate]] — no window, no per-query sort of more than
  * k × |lists| rows.
  */
object Hybrid {

  /** Fuse ranked lists `(query_id, doc_id, rank)` (rank 1-based) into the
    * per-query RRF top-`k`: (query_id, doc_id, rank, rrf_u, n_lists),
    * ordered rrf_u DESC then doc_id ASC. */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 10, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val weighted = lists.map(_.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      // integer division of exact ints — identical on every engine
      floor(lit(1000000000L) / (lit(rrfK) + col("rank"))).as("w")))
      .reduce(_ unionAll _)
    val agg = weighted.groupBy("query_id", "doc_id")
      .agg(sum("w").as("rrf_u"), count(lit(1)).as("n_lists"))
    agg.groupBy("query_id")
      .agg(TopKAggregate.topK(
        struct(col("rrf_u"), col("doc_id"), col("n_lists")), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), col("hit.doc_id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("hit.rrf_u").as("rrf_u"),
        col("hit.n_lists").cast("int").as("n_lists"))
  }
}
