package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.{TextAnalysis => T}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column, text: String): A =
    Seq(text).toDF("text").select(c).head().getAs[A](0)

  test("normalize: lower, strip punct class, collapse whitespace, trim") {
    assert(one[String](T.normalize(col("text")),
      "  Hello,  WORLD!? this:\tis it. ") == "hello world this is it")
    assert(one[String](T.normalize(col("text")), "...") == "")
  }

  test("redactPii: emails, phones, IPv4 tagged; plain text untouched") {
    assert(one[String](T.redactPii(col("text")),
      "mail a.b+c@ex-1.org or call +1 (415) 555-0199 from 10.0.0.1 ok")
      == "mail <EMAIL> or call <PHONE> from <IP> ok")
    assert(one[String](T.redactPii(col("text")),
      "no pii here just words") == "no pii here just words")
  }

  test("c4Rules: line filter keeps punct-terminated 5-word lines; page rules fire") {
    def rules(text: String): org.apache.spark.sql.Row =
      one[org.apache.spark.sql.Row](T.c4Rules(col("text")), text)
    val doc = Seq(
      "This line has the required five words.", // kept
      "Too short.",                             // < 5 words
      "this line has five words no terminal punct", // no terminal punct
      "Enable javascript to view this page today.", // boilerplate marker
      "A second proper sentence keeps the page alive!",
      "Ends with a quoted word count of seven \"").mkString("\n")
    val r = rules(doc)
    assert(r.getAs[Long]("n_lines") == 6)
    assert(r.getAs[Long]("n_kept_lines") == 3)
    assert(r.getAs[String]("clean_text") ==
      "This line has the required five words.\n" +
      "A second proper sentence keeps the page alive!\n" +
      "Ends with a quoted word count of seven \"")
    assert(r.getAs[Boolean]("keep")) // 5 sentences, no lorem, no brace
    // page-level failure arms
    assert(!rules("One. Two. Three. lorem ipsum dolor.").getAs[Boolean]("keep"))
    assert(!rules("One. Two. Three. { code }").getAs[Boolean]("keep"))
    assert(!rules("Only two. Sentences here.").getAs[Boolean]("keep"))
    // null text propagates (oracle mirrors NULL, not '')
    val n = Seq(Option.empty[String]).toDF("text")
      .select(T.c4Rules(col("text")).as("c")).select("c.clean_text").head()
    assert(n.isNullAt(0))
  }

  test("gopherRules: each rule's failure arm fires on a crafted doc") {
    def rules(text: String): org.apache.spark.sql.Row =
      one[org.apache.spark.sql.Row](T.gopherRules(col("text")), text)
    def flag(text: String, f: String): Boolean =
      rules(text).getAs[Boolean](f)
    // a passing doc: 50+ mid-length words with stopword glue, no symbols
    val good = (Seq("the", "of") ++ (1 to 60).map(i => s"word$i")).mkString(" ")
    val g = rules(good)
    assert(g.getAs[Long]("n_words") == 62L && g.getAs[Boolean]("keep"))
    // word count: under 50 words
    assert(!flag("the of few words here", "ok_word_count"))
    // mean word length: single-char words => mean < 3
    assert(!flag(("a " * 60).trim + " the of", "ok_mean_word_len"))
    // symbol ratio: >= 1 hash per <10 words
    assert(!flag("# # # # the of end", "ok_symbol_ratio"))
    // bullet lines: every line bullet-initial
    assert(!flag("- one two\n- three four\n  * five", "ok_bullet_lines"))
    // ellipsis lines: every line ellipsis-final (both ... and Unicode)
    assert(!flag("truncated...\nalso cut…", "ok_ellipsis_lines"))
    // alpha words: digit soup
    assert(!flag((1 to 50).map(_.toString).mkString(" "), "ok_alpha_words"))
    // stopwords: only one marker present
    assert(!flag(("the " + (1 to 60).map(i => s"w$i").mkString(" ")), "ok_stopwords"))
    // the good doc passes every individual rule (keep is their conjunction)
    Seq("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
      "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
      "ok_stopwords").foreach(f => assert(g.getAs[Boolean](f), f))
  }

  test("dupLineChars: all occurrences of repeated lines counted, unique lines not") {
    // "aa" repeats (2x2 chars), "bbb" and "c" unique -> dup=4, total=8
    assert(one[Long](T.dupLineChars(col("text")), "aa\nbbb\naa\nc") == 4L)
    assert(one[Long](T.lineChars(col("text")), "aa\nbbb\naa\nc") == 8L)
    // single-line doc: nothing repeats
    assert(one[Long](T.dupLineChars(col("text")), "just one line") == 0L)
    // empty lines repeat too (zero chars, zero mass)
    assert(one[Long](T.dupLineChars(col("text")), "x\n\n\ny") == 0L)
  }

  test("unigramLogMass: count x log10(corpus freq), closed form") {
    val got = Seq((3L, 100L)).toDF("c", "cf")
      .select(T.unigramLogMass(col("c"), col("cf"))).head().getDouble(0)
    assert(math.abs(got - 6.0) < 1e-12) // 3 * log10(100) = 6
  }

  test("token count: whitespace runs and trim") {
    assert(one[Int](T.tokenCount(col("text")), "the quick  brown\tfox ") == 4)
    assert(one[Int](T.tokenCount(col("text")), "one") == 1)
  }

  test("BPE-ish count: words plus standalone symbols") {
    assert(one[Int](T.tokenCountBpeIsh(col("text")).cast("int"), "don't stop, now!") == 7)
    // don + ' + t + stop + , + now + !
  }

  test("punct ratio over fixed class") {
    assert(one[Double](T.punctRatio(col("text")), "ab.,") == 0.5)
    assert(one[Double](T.punctRatio(col("text")), "abcd") == 0.0)
  }

  test("stopword ratio") {
    assert(one[Double](T.stopwordRatio(col("text")), "the cat and a dog") == 0.6)
  }

  test("langId picks the language with most marker hits; und when none") {
    assert(one[String](T.langId(col("text")), "le chat et la souris dans les bois") == "fr")
    assert(one[String](T.langId(col("text")), "der hund und die katze ist da") == "de")
    assert(one[String](T.langId(col("text")), "el perro y los gatos es bueno") == "es")
    assert(one[String](T.langId(col("text")), "the cat and the dog is a pet") == "en")
    assert(one[String](T.langId(col("text")), "xyzzy plugh qwert") == "und")
  }

  test("stripHtml drops tags and script/style bodies, decodes entities") {
    val html = "<html><head><style>body { color: red }</style>" +
      "<script>var x = \"<b>evil</b>\";</script></head>" +
      "<body><h1>Title</h1><p>Hello &amp; welcome to &quot;graft&quot;.</p>" +
      "<a href=\"x\">link</a>&nbsp;end</body></html>"
    assert(one[String](T.stripHtml(col("text")), html) ==
      "Title Hello & welcome to \"graft\". link end")
    // plain text passes through (modulo whitespace collapse)
    assert(one[String](T.stripHtml(col("text")), "no  markup\there") == "no markup here")
    // a </style> inside a script string must not terminate the script block
    assert(one[String](T.stripHtml(col("text")),
      "<script>var s = \"</style>\"; trackUser(id);</script><p>Hi</p>") == "Hi")
    // double-escaped entities decode ONE level (&amp;lt; -> &lt;, not '<')
    assert(one[String](T.stripHtml(col("text")), "&amp;lt;b&amp;gt;") == "&lt;b&gt;")
  }

  test("bigramStats: closed-form corpus, short docs drop, ratio quantised") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "x y"), (3L, "a"), (4L, ""))
      .toDF("doc_id", "text")
    val out = T.bigramStats(docs, "text", "doc_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // corpus bigrams: "a b"x2 (doc1), "b a"x1 (doc1), "x y"x1 (doc2)
    // unigrams: a:3 (doc1 twice + doc3), b:2, x:1, y:1
    // doc1: n=3, sum_cab = 2*2 + 1*1 = 5, sum_ca = 2*3 + 1*2 = 8
    // doc2: n=1, sum_cab = 1, sum_ca = cf(x) = 1
    assert(out.toSeq == Seq(
      (1L, 3L, 5L, 8L, math.floor(1e6 * 5 / 8).toLong),
      (2L, 1L, 1L, 1L, 1000000L)))
    // docs 3 (one token) and 4 (no tokens) have no bigrams -> absent
  }

  test("quality score bands") {
    val good = ("word " * 40).trim + " the and of it is" // >100 chars, no punct, stopwords
    assert(one[Double](T.qualityScore(col("text")), good) == 1.0)
    assert(one[Double](T.qualityScore(col("text")), "short") == 0.3) // only the punct band passes
  }
}
