package graft.dedup

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toDF("doc_id", "text")

  test("planted edit classes: exact dup, substitution, deletion, insertion; distance 2 excluded") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon", // base (30 chars)
      2L -> "alpha beta gamma delta epsilon", // exact dup -> dist 0
      3L -> "alpha beta gamma delta epsilan", // 1 substitution
      4L -> "alpha beta gamma delta epsilo",  // 1 deletion (29 chars)
      5L -> "alpha beta gamma delta epsilonX African", // prefix = base + 1 char? no: 30-char cut
      6L -> "alpha beta gamma delta epsiZZn", // 2 substitutions -> excluded
      7L -> "totally unrelated text content here")
    // doc 5's 30-char prefix: "alpha beta gamma delta epsilon" + nothing —
    // substring(1,30) of a longer string is exactly the base -> dist 0
    val got = FuzzyJoin.fuzzyPrefixPairs(d, prefixLen = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // note (3,4) is absent: "…epsilan" vs "…epsilo" is distance 2
    val expected = Set(
      (1L, 2L, 0), (1L, 5L, 0), (2L, 5L, 0), // the exact-prefix trio
      (1L, 3L, 1), (2L, 3L, 1), (3L, 5L, 1), // substitution vs each
      (1L, 4L, 1), (2L, 4L, 1), (4L, 5L, 1)) // deletion vs each
    assert(got == expected)
  }

  test("completeness vs brute force on a pseudo-random corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    def word() = (1 to 8).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val texts = (1L to 80L).map(i => i -> word())
    val d = docs(texts: _*)
    val got = FuzzyJoin.fuzzyPrefixPairs(d, prefixLen = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over the same prefixes
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val expected = (for {
      (ia, ta) <- texts; (ib, tb) <- texts if ia < ib
      dist = lev(ta.toLowerCase, tb.toLowerCase) if dist <= 1
    } yield (ia, ib, dist)).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must actually exercise matches")
  }

  test("group emission is consistent with the pair emission") {
    val d = docs(
      1L -> "aaaa", 2L -> "aaaa", 3L -> "aaaa", // group of 3
      4L -> "aaab", 5L -> "aaab",               // group of 2, dist 1 to aaaa
      6L -> "zzzz")
    val pairs = FuzzyJoin.fuzzyPrefixPairs(d).collect()
    val intra = pairs.count(_.getInt(2) == 0)
    val cross = pairs.count(_.getInt(2) == 1)
    assert(intra == 3 + 1) // C(3,2) + C(2,2)
    assert(cross == 3 * 2)
    val groups = FuzzyJoin.fuzzyPrefixGroups(d).collect()
    assert(groups.length == 1)
    val g = groups.head
    assert(Set(g.getLong(2), g.getLong(3)) == Set(2L, 3L))
  }

  test("null text is dropped, not joined") {
    val d = Seq((1L, "hello world"), (2L, null.asInstanceOf[String]),
      (3L, "hello world")).toDF("doc_id", "text")
    val got = FuzzyJoin.fuzzyPrefixPairs(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 3L, 0)))
  }
}
