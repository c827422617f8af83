package graft.text

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("mgSketch: classic guarantee — kept count >= true count - n/(k+1)") {
    val rnd = new scala.util.Random(11)
    val toks = Seq.fill(5000)(s"w${rnd.nextInt(40)}")
    val k = 20
    val sketch = HeavyHitters.mgSketch(toks.iterator, k).toMap
    assert(sketch.size <= k)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = toks.size.toLong / (k + 1)
    exact.foreach { case (t, f) =>
      val kept = sketch.getOrElse(t, 0L)
      assert(kept >= f - bound, s"$t: kept=$kept f=$f bound=$bound")
      assert(kept <= f, s"$t overcounts")
    }
  }

  test("exactHeavyHitters matches brute force, under adversarial partitioning") {
    val rnd = new scala.util.Random(23)
    // zipf-ish corpus: token w_i with weight ~ 1/(i+1)
    val vocab = (0 until 300).map(i => s"w$i")
    val docs = (1 to 400).map { id =>
      val words = (1 to 50).map { _ =>
        val r = rnd.nextDouble()
        vocab(math.min(299, (math.pow(300.0, r) - 1).toInt))
      }
      (id.toLong, words.mkString(" "))
    }
    val phiDen = 50L
    // adversarial layout: spread every token's occurrences thinly across
    // many partitions (round-robin by id) — the distribution that defeats
    // a naive "locally heavy somewhere" argument
    val df = docs.toDF("doc_id", "text").repartition(16, $"doc_id")
    val got = HeavyHitters.exactHeavyHitters(df, phiDen)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val allToks = docs.flatMap(_._2.trim.split("\\s+", -1))
    val n = allToks.size.toLong
    val expected = allToks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * phiDen >= n }.toMap
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must produce heavy hitters")
    // and the guarantee is not vacuous: some vocab must be BELOW threshold
    assert(got.size < allToks.distinct.size)
  }

  test("result is partitioning-invariant (exactness survives the sketch)") {
    val docs = (1 to 100).map(i => (i.toLong, s"alpha beta w$i")).toDF("doc_id", "text")
    def run(parts: Int) =
      HeavyHitters.exactHeavyHitters(docs.repartition(parts), phiDen = 10L)
        .orderBy("tok").collect().map(_.toSeq).toSeq
    assert(run(1) == run(13))
  }
}
