package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance fuzzy join (FastSS deletion-neighborhood
  * blocking), the typo-level record-linkage member of the dedup family:
  * find every document pair whose canonical key (here: the lowercased
  * `prefixLen`-char text prefix — titles, in a corpus that has them) is
  * within Levenshtein distance ≤ 1, WITHOUT an all-pairs comparison.
  *
  * Jaccard/MinHash banding (Dedup.minhashPairs) is blind to this class:
  * a one-character typo in a 30-char key shifts every overlapping shingle,
  * so shingle similarity collapses while edit distance stays 1. The
  * deletion-neighborhood is the exact complement — it catches precisely
  * the small-edit pairs, with a candidate set that is provably complete
  * for d ≤ 1: two distinct strings at distance 1 always share a member of
  * each other's {self} ∪ {one-char-deletions} set (substitution: delete
  * the differing position from both; indel: the shorter IS a deletion of
  * the longer).
  *
  * Scale design:
  *  - **Distinct-key collapse first.** Exact-duplicate keys (the planted
  *    boilerplate case — routinely thousands of docs per key) would make
  *    the variant join quadratic in GROUP SIZE. Collapsing to one
  *    representative per distinct key before blocking means the candidate
  *    join is over distinct strings only; the m_a·m_b doc-pair expansion
  *    happens AFTER verification, where it is the answer itself, not a
  *    candidate blowup.
  *  - **Blocking key is a 64-bit hash** of each variant (len+2 variants
  *    per distinct key) — the shuffle rows are (hash, rep, key), ~40
  *    bytes; the equi-join on the hash is sort-merge-able and never
  *    broadcasts a corpus side ([[graft.plans.DemoteCorpusBroadcast]]).
  *    Hash collisions only ever ADD candidates; the exact levenshtein
  *    verify removes them.
  *  - **Verification is exact** (`levenshtein`, codegen'd builtin on both
  *    engines) and runs once per distinct candidate key pair, not per doc
  *    pair.
  *  - The pair-level emission is the gate's contract; a production run on
  *    a 100 TB corpus emits the group-level form ([[fuzzyPrefixGroups]])
  *    and expands pairs only downstream of a keep/drop policy — the
  *    intra-group m² expansion of a viral boilerplate key is an OUTPUT
  *    property, not a join cost, and the group form avoids it entirely.
  */
object FuzzyJoin {

  /** (doc_id, key) relation: lowercased `prefixLen`-char prefix. */
  private def keysOf(docs: DataFrame, prefixLen: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        lower(substring(col("text"), 1, prefixLen)).as("p"))

  /** Verified DISTINCT-key pairs at Levenshtein distance exactly 1
    * (distance 0 cannot occur between distinct keys): (p_a, p_b) with
    * rep_a < rep_b canonicalising the unordered pair. */
  private def verifiedKeyPairs(keys: DataFrame): DataFrame = {
    val groups = keys.groupBy("p").agg(min("doc_id").as("rep"))
    // FastSS d=1 neighborhood: i=0 keeps the key itself, i=1..len deletes
    // the i-th char. The generator input is `sequence` over the key
    // attribute — no sibling expression rides the explode (the r8 lesson).
    val variants = groups
      .select(col("rep"), col("p"),
        explode(expr("sequence(0, length(p))")).as("i"))
      .select(col("rep"), col("p"),
        when(col("i") === 0, col("p"))
          .otherwise(concat(expr("substring(p, 1, i-1)"),
            expr("substring(p, i+1, length(p))"))).as("v"))
      .select(col("rep"), col("p"), xxhash64(col("v")).as("vh"))
    variants.as("a").join(variants.as("b"), "vh")
      .filter(col("a.rep") < col("b.rep"))
      .select(col("a.p").as("p_a"), col("b.p").as("p_b"))
      .distinct()
      .filter(levenshtein(col("p_a"), col("p_b")) <= 1)
  }

  /** Group-level emission — the scale-native form: one row per verified
    * key pair, with member counts; O(|distinct keys| + |matches|). */
  def fuzzyPrefixGroups(docs: DataFrame, prefixLen: Int = 30): DataFrame = {
    val keys = keysOf(docs, prefixLen)
    val sizes = keys.groupBy("p")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("m"))
    verifiedKeyPairs(keys)
      .join(sizes.select(col("p").as("p_a"), col("rep").as("rep_a"),
        col("m").as("m_a")), "p_a")
      .join(sizes.select(col("p").as("p_b"), col("rep").as("rep_b"),
        col("m").as("m_b")), "p_b")
      .select(col("rep_a"), col("rep_b"), col("m_a"), col("m_b"))
  }

  /** Doc-pair emission: every (id_a < id_b) pair whose keys are within
    * edit distance ≤ 1 — distance 0 via the exact-key self-join (the
    * same-group pairs), distance 1 via the verified key pairs expanded
    * over both member lists. */
  def fuzzyPrefixPairs(docs: DataFrame, prefixLen: Int = 30): DataFrame = {
    val keys = keysOf(docs, prefixLen)
    val intra = keys.as("x").join(keys.as("y"), "p")
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(0).as("dist"))
    val cross = verifiedKeyPairs(keys)
      .join(keys.select(col("p").as("p_a"), col("doc_id").as("da")), "p_a")
      .join(keys.select(col("p").as("p_b"), col("doc_id").as("db")), "p_b")
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), lit(1).as("dist"))
    intra.unionByName(cross)
  }
}
