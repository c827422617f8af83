package graft.queries

/** DuckDB-side mirrors of the ORACLE-PORTABLE hash family:
  * [[graft.fp.Fingerprint.portableRowHash]] / `portableAgg` and
  * [[graft.dedup.Dedup.portableHash]] / `portableSimhash`.
  *
  * xxhash64 — the engine's production row hash — has no DuckDB equivalent,
  * which left every hash-emitting catalog query invisible to the external
  * DuckDB correctness gate (round-2 verdict §"What's missing" #2). Both
  * engines share `md5` over strings, and DuckDB parses '0x…' string casts
  * to integers, so a 60-bit md5-prefix hash is computable bit-for-bit on
  * both sides. The generators here are the single source of the DuckDB SQL
  * text; the Spark formulations live next to the production operators and
  * reference these in their Scaladoc — change both together.
  */
object PortableSql {

  /** First 15 md5-hex chars of `e` as a BIGINT (60 bits, sign-safe in both
    * engines). Spark mirror: `conv(substring(md5(e), 1, 15), 16, 10)`. */
  def hex15(e: String): String = s"CAST('0x' || substr($e, 1, 15) AS BIGINT)"

  /** Canonical string forms (Spark mirror: Fingerprint.portableCanonical).
    * NULL → chr(0) sentinel after conversion, because concat_ws drops
    * nulls in both engines. */
  def canon(e: String): String = s"coalesce(CAST($e AS VARCHAR), chr(0))"
  def canonDouble(e: String): String =
    s"coalesce(CAST(TRY_CAST($e AS DECIMAL(38,6)) AS VARCHAR), chr(0))"
  def canonTimestamp(e: String): String =
    s"coalesce(CAST(epoch_us($e) AS VARCHAR), chr(0))"

  /** Portable 60-bit row hash over canonicalized columns. */
  def rowHash(canonCols: Seq[String]): String =
    hex15(s"md5(concat_ws(chr(1), ${canonCols.mkString(", ")}))")

  /** XOR-aggregate fingerprint (0 on empty input, like the Spark side). */
  def fpAgg(canonCols: Seq[String]): String =
    s"coalesce(bit_xor(${rowHash(canonCols)}), 0)"

  /** Bits in the portable SimHash (Dedup.PortableSimhashBits mirror). */
  val SimhashBits = 48

  /** Whole-oracle SQL for the portable 48-bit SimHash over whitespace
    * tokens of `documents.text`: per-token 60-bit md5 hash, per-bit
    * majority vote across the document's tokens (duplicates counted, as in
    * the Spark HOF), bits 0..47 assembled into one BIGINT.
    *
    * @param extraSelect additional projections from the `documents` table
    *                    (prefix `d.`), e.g. a content hash column
    */
  /** CTE bodies (for a `WITH ${...}, more...` splice) computing
    * `sh(doc_id, ts)` — each document's DISTINCT 3-token shingle set
    * (Spark mirror: `array_distinct(Dedup.wordShingles(text))`) — and
    * `ndpairs(id_a, id_b, n_common, n_union)`, the all-pairs EXACT
    * shingle-Jaccard >= `minJ` near-duplicate pairs. This is the ground
    * truth the q31/q80 LSH emissions are compared against; quadratic, but
    * only the gate-SF oracle ever runs it — the Spark side stays
    * candidate-bounded. */
  def shingleNearDupCtes(minJ: Double): String =
    "t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(tk) >= 3 THEN " +
      "list_transform(range(1, len(tk)-1), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2])) " +
      "ELSE [] END) AS ts FROM t), " +
      "ndpairs AS (SELECT * FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "len(list_intersect(a.ts, b.ts)) AS n_common, " +
      "len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)) AS n_union " +
      "FROM sh a JOIN sh b ON b.doc_id > a.doc_id) " +
      s"WHERE n_union > 0 AND CAST(n_common AS DOUBLE) / n_union >= $minJ)"

  def simhashOracle(extraSelect: String = "", alias: String = "simhash_p",
      bits: Int = SimhashBits): String = {
    val counts = (0 until bits)
      .map(i => s"sum(CAST((h >> $i) & 1 AS BIGINT)) AS c$i").mkString(", ")
    val assemble = (0 until bits)
      .map(i => s"(CASE WHEN 2*c$i > n THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    val extra = if (extraSelect.isEmpty) "" else s"$extraSelect, "
    // LEFT join + NULL arm: a NULL text yields no token rows in `b`, but
    // the Spark side still emits the doc with a NULL simhash — the oracle
    // must mirror that row rather than drop it
    "WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), " +
      s"h AS (SELECT doc_id, ${hex15("md5(tok)")} AS h FROM t), " +
      s"b AS (SELECT doc_id, count(*) AS n, $counts FROM h GROUP BY doc_id) " +
      s"SELECT d.doc_id, ${extra}CASE WHEN b.doc_id IS NULL THEN NULL " +
      s"ELSE CAST($assemble AS BIGINT) END AS $alias " +
      "FROM documents d LEFT JOIN b ON b.doc_id = d.doc_id ORDER BY d.doc_id"
  }
}
