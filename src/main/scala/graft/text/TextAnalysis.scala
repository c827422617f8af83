package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extension; no reference counterpart — the reference copies
  * tables, these prepare the 100 TB corpus the tables would hold).
  *
  * All operators are composed Spark builtins/HOFs — fully codegen'd, no
  * UDFs, so a 100 TB documents scan stays in one WholeStageCodegen span
  * with column pruning (only `text` is read).
  */
object TextAnalysis {

  /** Whitespace tokenisation. `split` on \s+ after trim — the BPE-ish
    * token-count regex variant is [[tokenCountBpeIsh]]. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Sub-word-ish token count: alphanumeric runs plus each standalone
    * symbol, the cheap stand-in for a BPE tokenizer's token count. RE2-safe
    * pattern (no lookarounds) so the DuckDB oracle can mirror it. */
  def tokenCountBpeIsh(c: Column): Column =
    regexp_count(c, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"))

  def charCount(c: Column): Column = length(c)

  /** Punctuation ratio over a fixed class (kept mirrorable in ANSI SQL). */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[.,!?;:]", ""))).cast("double") / length(c)

  private val StopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val sw = array(StopwordsEn.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks)
  }

  /** Quality score in [0,1]: length in a sane band, not punctuation-soup,
    * has some stopword glue. Deterministic integer/double arithmetic. */
  def qualityScore(c: Column): Column = {
    val lenOk = when(length(c) >= 100 && length(c) <= 10000, 0.4).otherwise(0.0)
    val punctOk = when(punctRatio(c) < 0.1, 0.3).otherwise(0.0)
    val swOk = when(stopwordRatio(c) > 0.01, 0.3).otherwise(0.0)
    round(lenOk + punctOk + swOk, 1)
  }

  /** Marker stopwords per language for the n-gram-free language-ID
    * heuristic: score = number of tokens in each language's marker set,
    * argmax wins, ties broken by fixed language order, all-zero → "und". */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(c: Column, markers: Seq[String]): Column = {
    val sw = array(markers.map(lit): _*)
    size(filter(tokens(c), t => array_contains(sw, t)))
  }

  /** Canonical text normalisation for dedup keys and training text:
    * lowercase → strip the fixed punctuation class → collapse whitespace
    * runs to one space → trim. Every step is a codegen'd builtin and has
    * an exact ANSI-SQL mirror (DuckDB `regexp_replace` with the 'g' flag),
    * so normalised output is engine-portable — the property that matters
    * when the dedup keys of a 100 TB corpus are built by more than one
    * system. */
  def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[.,!?;:]", ""), "\\s+", " "))

  /** Crude HTML → text for web-crawl ingest: drop script/style blocks
    * (content AND markup), strip remaining tags, decode the five core
    * entities, collapse whitespace. RE2-safe patterns (no lookarounds,
    * non-greedy block bodies), map-only, codegen'd — the cheap first-pass
    * boilerplate cut before language-ID/quality scoring; a production
    * extractor (readability/trafilatura-class) plugs in at the same
    * column-in/column-out seam. */
  def stripHtml(c: Column): Column = {
    // one pass per block kind: an alternation <(script|style)>.*?</(script|style)>
    // would let a script block terminate at a </style> inside a JS string
    // literal and leak the tail of the script into the corpus
    val noBlocks = Seq("script", "style").foldLeft(c)((col0, tag) =>
      regexp_replace(col0, s"(?is)<$tag[^>]*>.*?</$tag>", " "))
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    // decode &amp; LAST: decoding it first would turn the double-escaped
    // &amp;lt; into &lt; and then into a literal '<' — re-inventing markup
    // after tags were already stripped
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (ent, ch)) =>
        regexp_replace(col0, ent, java.util.regex.Matcher.quoteReplacement(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** PII patterns, RE2-safe (no lookarounds, no backreferences) so the
    * DuckDB oracle evaluates them with IDENTICAL match semantics — RE2
    * and java.util.regex agree on leftmost-greedy matching for this
    * fragment of the syntax. Shared by [[redactPii]] and the q98 catalog
    * query's staged per-type counts; change them together with the
    * `PiiSql` mirror in [[graft.queries.PipelineQueries]]. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\+?\\d[\\d\\s().-]{6,}\\d"

  /** PII scrubbing: replace email addresses, international-ish phone
    * numbers, and IPv4 literals with type tags. Deliberately conservative
    * RE2-safe patterns (no lookarounds); map-only, codegen'd. Order
    * matters: emails first (their local parts can contain digits that the
    * phone pattern would otherwise shred), then IPv4 before the phone
    * pattern (whose digit/dot class would swallow dotted quads). */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c, EmailRe, "<EMAIL>")
    val ip = regexp_replace(email, Ipv4Re, "<IP>")
    regexp_replace(ip, PhoneRe, "<PHONE>")
  }

  /** Credit-card candidates: MAXIMAL digit runs of plausible PAN length.
    * `[0-9]+` (maximal-run matching — RE2-safe, unlike the lookaround
    * `(?<!\d)\d{13,19}(?!\d)` form RE2 rejects) then a length gate, so a
    * 20-digit run is one over-long non-candidate, not a 19-digit match
    * plus a stray digit. */
  def ccnCandidates(c: Column): Column =
    filter(regexp_extract_all(c, lit("[0-9]+"), lit(0)),
      x => length(x).between(13, 19))

  /** The candidates that pass the Luhn mod-10 check — the gate that
    * separates PANs from order ids (see
    * [[graft.functions.expressions.LuhnExpressions]]). */
  def luhnValidCcns(c: Column): Column =
    filter(ccnCandidates(c),
      x => graft.functions.expressions.LuhnExpressions.luhnCheck(x))

  /** Replace every Luhn-valid candidate with `<CC>` — a fold over the
    * (per-document-bounded) valid list. Non-valid digit runs are left
    * intact: redacting order ids is data damage, not privacy. Caveat
    * (documented, fixture-avoided): `replace` is occurrence-global, so a
    * valid PAN that also occurs as a substring of a longer run would
    * shred that run — maximal-run candidate extraction makes this
    * impossible for digit-delimited text. */
  def redactCcns(c: Column): Column =
    aggregate(luhnValidCcns(c), c, (acc, x) => {
      import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
      toColumn(org.apache.spark.sql.catalyst.expressions.StringReplace(
        toExpr(acc), toExpr(x),
        org.apache.spark.sql.catalyst.expressions.Literal("<CC>")))
    })

  /** Required-stopword set of the Gopher quality rules (Rae et al. 2021,
    * Appendix A1.1): a document must contain at least two of these. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021, Appendix A1.1)
    * as a struct of per-rule booleans plus the conjunction `keep` — the
    * standard first-pass web-corpus filter battery. Every threshold is
    * evaluated in INTEGER arithmetic (`10*nsym < nw` instead of
    * `nsym/nw < 0.1`) so the emission is engine-portable: no IEEE division
    * anywhere, and the DuckDB oracle mirrors each rule expression exactly.
    *
    * Rules: word count in [50, 100000]; mean word length in [3, 10];
    * symbol-to-word ratio (# and ellipsis) < 0.1; < 90% of lines
    * bullet-initial; < 30% of lines ellipsis-final; >= 80% of words
    * contain an alphabetic character; >= 2 distinct [[GopherStopwords]].
    * One tokenize + one line-split, all codegen'd builtins/HOFs — a
    * 100 TB corpus pass stays map-only with only `text` read. */
  def gopherRules(c: Column): Column = {
    val toks = tokens(c)
    val nw = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nHash = (length(c) - length(regexp_replace(c, "#", ""))).cast("long")
    val nEll = regexp_count(c, lit("\\.\\.\\.")).cast("long")
    val lines = split(c, "\n")
    val nl = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val nEllLine =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val sw = array(GopherStopwords.map(lit): _*)
    val nSw = size(filter(sw, s => array_contains(toks, s))).cast("long")
    val okWords = nw >= 50L && nw <= 100000L
    val okMeanLen = sumLen >= lit(3L) * nw && sumLen <= lit(10L) * nw
    val okSymbol = lit(10L) * (nHash + nEll) < nw
    val okBullet = lit(10L) * nBullet < lit(9L) * nl
    val okEllLine = lit(10L) * nEllLine < lit(3L) * nl
    val okAlpha = lit(5L) * nAlpha >= lit(4L) * nw
    val okStopwords = nSw >= 2L
    struct(
      nw.as("n_words"),
      okWords.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbol.as("ok_symbol_ratio"),
      okBullet.as("ok_bullet_lines"),
      okEllLine.as("ok_ellipsis_lines"),
      okAlpha.as("ok_alpha_words"),
      okStopwords.as("ok_stopwords"),
      (okWords && okMeanLen && okSymbol && okBullet && okEllLine &&
        okAlpha && okStopwords).as("keep"))
  }

  /** C4 line-keep predicate (Raffel et al. 2020 §2.2, the line-level half
    * of the C4 cleaning heuristics): a line survives iff it ends in a
    * terminal punctuation mark, carries at least `minWords` whitespace
    * words, and does not mention javascript (the boilerplate marker C4
    * strips at line level). Whole-line predicate over builtins — stays
    * inside codegen, mirrorable in DuckDB lambda SQL. */
  private def c4LineKeep(l: Column, minWords: Int): Column =
    rtrim(l).rlike("[.!?\"]$") &&
      size(split(trim(l), "\\s+")) >= minWords &&
      !lower(l).contains("javascript")

  /** C4 page+line cleaning battery (Raffel et al. 2020 §2.2; the
    * reference pipeline for the original T5 corpus — the OTHER canonical
    * rule set next to [[gopherRules]]). Returns a struct of per-doc
    * counters, per-rule booleans, the page-level keep verdict, and the
    * line-filtered text itself (q93 discipline: the transform output is
    * the artifact, not a summary of it):
    *  - lines ending in terminal punctuation with >= 5 words and no
    *    javascript mention survive; the rest are dropped in place
    *  - the PAGE is kept iff it has >= 3 sentences (terminal-punct
    *    count), no "lorem ipsum", and no curly brace (code marker)
    * Integer arithmetic only; one line-split + per-line HOFs — a 100 TB
    * pass stays map-only with only `text` read. */
  def c4Rules(c: Column, minWords: Int = 5): Column = {
    val lines = split(c, "\n")
    val kept = filter(lines, l => c4LineKeep(l, minWords))
    val nSentences = regexp_count(c, lit("[.!?]")).cast("long")
    val hasLorem = lower(c).contains("lorem ipsum")
    val hasBrace = c.contains("{")
    struct(
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      nSentences.as("n_sentences"),
      hasLorem.as("has_lorem_ipsum"),
      hasBrace.as("has_brace"),
      (nSentences >= 3L && !hasLorem && !hasBrace).as("keep"),
      // concat_ws treats a NULL array as empty ("") where the oracle's
      // array_to_string(NULL) is NULL — propagate the null explicitly
      when(c.isNull, lit(null).cast("string"))
        .otherwise(concat_ws("\n", kept)).as("clean_text"))
  }

  /** Total characters across a document's newline-split lines (excludes
    * the newlines themselves). Per-row HOF — lines per doc are few. */
  def lineChars(c: Column): Column =
    aggregate(transform(split(c, "\n"), l => length(l).cast("long")),
      lit(0L), _ + _)

  /** Characters contained in lines that occur 2+ times within the doc
    * (ALL occurrences counted — Gopher A1.2's duplicate-line character
    * fraction numerator). O(lines²) per row; lines per doc are few, and
    * the corpus pass stays map-only. */
  def dupLineChars(c: Column): Column = {
    val lines = split(c, "\n")
    aggregate(
      transform(lines, l => when(size(filter(lines, x => x === l)) >= 2,
        length(l).cast("long")).otherwise(0L)),
      lit(0L), _ + _)
  }

  /** Per-(doc, token) unigram log-frequency mass: `count_in_doc ×
    * log10(corpus_count)`. Summed per doc and divided by the doc's token
    * count it is the mean log corpus frequency — the cheap unigram-LM
    * perplexity proxy (higher = more common-word mass). q64 records the
    * exact-integer `count × corpus_count` form as the oracle query instead,
    * because libm `log10` rounding differs across engines. */
  def unigramLogMass(tokCount: Column, corpusFreq: Column): Column =
    tokCount * log10(corpusFreq)

  /** Per-doc bigram coherence against the corpus's OWN bigram statistics —
    * the model-free core of a CCNet-style statistical-LM quality filter:
    * how predictable is each next token under the corpus bigram table.
    * score ≈ mean over doc bigrams of C(a,b)/C(a), emitted as the exact
    * integer sums (Σ C(a,b), Σ C(a)) plus the 1e-6-quantised ratio, so the
    * external gate hash-checks it (ratio of exact integers → one IEEE
    * division, deterministic across engines).
    *
    * Scale shape (identical to unigram corpus frequency, q64): per-doc
    * bigram instances pre-aggregate map-side to (doc, bigram, count); the
    * corpus bigram/unigram tables are vocabulary-sized shuffles; the join
    * back is instance-bounded. No all-pairs, no per-row HOF beyond the
    * doc-length-bounded token zip. Docs with < 2 tokens have no bigrams
    * and drop out (inner join) — the caller treats absence as unscorable. */
  def bigramStats(docs: org.apache.spark.sql.DataFrame,
      textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val t = docs.select(col(idCol), tokens(col(textCol)).as("__ts"))
    val n1 = greatest(size(col("__ts")) - 1, lit(0)) // 0 for empty/1-token
    val pairs = t.select(col(idCol), explode(zip_with(
        slice(col("__ts"), lit(1), n1), slice(col("__ts"), lit(2), n1),
        (a, b) => struct(concat_ws(" ", a, b).as("bg"), a.as("la")))).as("p"))
      .select(col(idCol), col("p.bg").as("bg"), col("p.la").as("la"))
      // semantically a no-op (concat_ws / split never emit nulls) — stated
      // HERE so the inner joins below don't infer per-branch isnotnull
      // filters, which would make the three consumers' subtrees differ and
      // defeat ReuseExchange (plan-guarded in PlanSpec)
      .filter(col("bg").isNotNull && col("la").isNotNull)
    // ONE tokenize+explode pass: per-(doc, bigram, left-token) counts.
    // Both corpus tables below derive from this aggregate, so its shuffle
    // is the shared subplan — ReuseExchange serves the extra consumers
    // from shuffle files instead of re-exploding the raw text (measured
    // 3 full explode passes -> 1 on the gate corpus).
    val inst = pairs.groupBy(col(idCol), col("bg"), col("la"))
      .agg(count(lit(1)).as("c"))
    val bf = inst.groupBy("bg").agg(sum("c").as("cab"))
    // corpus unigram counts without a third explode: every token occurrence
    // is either the LEFT token of some bigram (positions 1..n-1, already
    // counted in `inst`) or its doc's final token (one row per doc via
    // element_at). A full-outer merge keeps tokens seen only in one role
    // (a doc's unique last word; 1-token docs whose only word never leads
    // a bigram).
    val laTok = inst.groupBy(col("la").as("tok")).agg(sum("c").as("af"))
    val lastTok = t.filter(size(col("__ts")) > 0)
      .select(element_at(col("__ts"), -1).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("lf"))
    val tf = laTok.join(lastTok, Seq("tok"), "full_outer")
      .select(col("tok"),
        (coalesce(col("af"), lit(0L)) + coalesce(col("lf"), lit(0L))).as("cf"))
    inst
      .join(bf, "bg")
      .join(tf, col("la") === col("tok"))
      .groupBy(idCol)
      .agg(sum("c").cast("long").as("n_bigrams"),
        sum(col("c") * col("cab")).cast("long").as("sum_cab"),
        sum(col("c") * col("cf")).cast("long").as("sum_ca"))
      .withColumn("score_u",
        floor(lit(1e6) * col("sum_cab") / col("sum_ca")).cast("long"))
  }

  /** Predicted language code (heuristic). First language in [[LangMarkers]]
    * order with the maximal nonzero score; "und" when no marker hits. */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, m) => lang -> langScore(c, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }
}
