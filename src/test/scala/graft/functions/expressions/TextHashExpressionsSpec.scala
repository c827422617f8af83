package graft.functions.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** The native expressions must be bit-identical to the builtin-HOF
  * reference formulations they replace. */
class TextHashExpressionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("SimHash64 expression == HOF formulation on the corpus + edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "one", "a  b\t c ",
      "hello\n", "\thello", "a\nb", "trailing\t", "\n", "a b").toDF("text")
      .select(col("text"), lit(-1L).as("doc_id"))
    val all = docs.select(col("text"), col("doc_id")).unionByName(edge)
    val diff = all.select(
      Dedup.simhash(col("text")).as("fast"),
      Dedup.simhashHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("PortableSimHash48 expression == HOF formulation on the corpus + edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "one", "a  b\t c ",
      "hello\n", "\thello", "a\nb", "trailing\t", "\n", "a b").toDF("text")
      .select(col("text"), lit(-1L).as("doc_id"))
    val all = docs.select(col("text"), col("doc_id")).unionByName(edge)
    val diff = all.select(
      Dedup.portableSimhash(col("text")).as("fast"),
      Dedup.portableSimhashHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("portableHash builtin pipeline == the JVM md5Prefix60 reference") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello", "éü中文", "0", "the quick fox")
    val got = inputs.toDF("w").select(Dedup.portableHash(col("w")))
      .collect().map(_.getLong(0)).toSeq
    val jvm = inputs.map(w => TextHashExpressions.md5Prefix60(w.getBytes("UTF-8")))
    assert(got == jvm)
  }

  test("MinHashSignature expression == HOF formulation") {
    val sh = Dedup.wordShingles(col("text"), 3)
    val diff = docs.select(
      Dedup.minhashSignature(sh, 32).as("fast"),
      Dedup.minhashSignatureHof(sh, 32).as("ref"))
      .filter(to_json(col("fast")) =!= to_json(col("ref")))
    assert(diff.count() == 0)
  }

  test("MinHashShingled fused expression == MinHashSignature(wordShinglesHof) + edge cases") {
    import spark.implicits._
    // edge cases: <n tokens (empty shingle arm), exactly n, whitespace runs,
    // trailing newline (tokenizer keeps the trailing empty token), null text
    // (HOF's otherwise-arm yields empty shingles → all-MaxValue signature)
    val edge = Seq("", " ", "one", "a b", "a b c", "a  b\t c d", "hello\n x y z")
      .toDF("text").select(col("text"), lit(-1L).as("doc_id"))
      .unionByName(Seq(1).toDF("x").select(lit(null).cast("string").as("text"),
        lit(-2L).as("doc_id")))
    val all = docs.select(col("text"), col("doc_id")).unionByName(edge)
    val diff = all.select(
      TextHashExpressions.minhashShingled(col("text"), 3, 32).as("fast"),
      Dedup.minhashSignatureHof(Dedup.wordShinglesHof(col("text"), 3), 32).as("ref"))
      .filter(to_json(col("fast")) =!= to_json(col("ref")))
    assert(diff.count() == 0)
  }

  test("RollingChunks: deterministic, bounded lengths, suffix-stable under prefix edit") {
    import spark.implicits._
    val chunksOf = (c: org.apache.spark.sql.Column) =>
      TextHashExpressions.rollingChunks(c, 16, 4, 16, 64) // avg 16B, max 64B
    // determinism + full coverage on fixture docs: same input -> same chunks,
    // concatenated chunk lengths == byte length is implied by count bounds
    val fx = docs.select(col("text"), chunksOf(col("text")).as("a"))
      .select(col("text"), col("a"), chunksOf(col("text")).as("b"))
      .filter(to_json(col("a")) =!= to_json(col("b")))
    assert(fx.count() == 0)
    // edge cases: null/empty -> empty array
    val edge = Seq[Option[String]](None, Some("")).toDF("text")
      .select(chunksOf(col("text")).as("c")).collect()
    assert(edge.forall(_.getSeq[Long](0).isEmpty))
    // suffix stability: prepend 100 bytes; the chunk streams must re-converge
    // (shared tail chunks), which offset-based fixed chunking cannot do.
    // Deterministic pseudo-random text: periodic text is CDC's documented
    // pathological case (boundary phase-lock on repeated content), so a
    // repeated-phrase fixture would test the pathology, not the property.
    val base = {
      var s = 12345L
      (1 to 900).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        ('a' + math.floorMod(s >>> 33, 26)).toChar
      }.mkString
    }
    val edited = ("Z" * 100) + base
    val Seq(ca, cb) = Seq(base, edited).toDF("text")
      .select(chunksOf(col("text")).as("c")).collect().toSeq
      .map(_.getSeq[Long](0))
    val shared = ca.toSet.intersect(cb.toSet).size
    assert(shared >= ca.size / 2, s"only $shared of ${ca.size} chunks survived a prefix edit")
    // chunk count is within the [min,max] clamp bounds for the byte length
    assert(ca.size >= base.length / 64 && ca.size <= base.length / 16 + 1)
  }

  test("RollingChunkTexts: byte-exact reconstruction incl. multi-byte UTF-8 split mid-codepoint") {
    import spark.implicits._
    // boundaries are BYTE offsets, so a chunk edge can land inside a
    // multi-byte codepoint; UTF8String concat is byte-level, so the
    // ordered concat must still restore the document exactly — the q69
    // reconstructs_ok contract, exercised here on non-ASCII text the
    // (ASCII) fixture corpus never covers
    val rng = new scala.util.Random(7)
    val pool = "αβγδεζ漢字ensemble日本語 текст mixé ασκήσεις 🚀"
    val texts = (1 to 20).map(_ =>
      (1 to 400).map(_ => pool(rng.nextInt(pool.length))).mkString) :+
      "" :+ "ascii only words here"
    val df = texts.toDF("text").select(col("text"),
      TextHashExpressions.rollingChunkTexts(col("text")).as("cts"),
      TextHashExpressions.rollingChunks(col("text")).as("chs"))
    val bad = df.filter(
      coalesce(concat_ws("", col("cts")), lit("")) =!= coalesce(col("text"), lit("")))
    assert(bad.count() == 0, "chunk concat failed to reconstruct a document")
    // hash emission == xxhash64 of the emitted texts, element-wise
    val mismatch = df.filter(!(size(col("chs")) === size(col("cts")) &&
      forall(zip_with(col("chs"), col("cts"), (h, t) => h === xxhash64(t)), x => x)))
    assert(mismatch.count() == 0, "chunk hash / text divergence")
  }

  test("WordShingles native expression == HOF formulation + edge cases") {
    import spark.implicits._
    val edge = Seq("", " ", "one", "a b", "a b c", "a  b\t c d", "hello\n x y z")
      .toDF("text").select(col("text"), lit(-1L).as("doc_id"))
      .unionByName(Seq(1).toDF("x").select(lit(null).cast("string").as("text"),
        lit(-2L).as("doc_id")))
    val all = docs.select(col("text"), col("doc_id")).unionByName(edge)
    val diff = all.select(
      Dedup.wordShingles(col("text"), 3).as("fast"),
      Dedup.wordShinglesHof(col("text"), 3).as("ref"))
      .filter(to_json(col("fast")) =!= to_json(col("ref")))
    assert(diff.count() == 0)
  }

  test("CosineSimilarity expression == HOF formulation on embeddings") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") && col("ib") <= col("ia") + 5)
    val diff = pairs.select(
      graft.sim.Similarity.cosine(col("ea"), col("eb")).as("fast"),
      graft.sim.Similarity.cosineHof(col("ea"), col("eb")).as("ref"))
      .filter(col("fast") =!= col("ref")) // bitwise-equal doubles required
    assert(diff.count() == 0)
  }

  test("null input yields null") {
    import spark.implicits._
    val r = Seq[String](null).toDF("text")
      .select(Dedup.simhash(col("text"))).head()
    assert(r.isNullAt(0))
  }

  test("SimHash64 and MinHashShingled are real codegen, not CodegenFallback (r4 verdict #3)") {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenFallback, GenerateMutableProjection}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    val sim = TextHashExpressions.SimHash64(BoundReference(0, StringType, nullable = true))
    val mh = TextHashExpressions.MinHashShingled(BoundReference(0, StringType, nullable = true), 3, 4)
    assert(!sim.isInstanceOf[CodegenFallback] && !mh.isInstanceOf[CodegenFallback])
    // force the doGenCode path directly (no interpreted-fallback safety net)
    // and cross-check it against eval on a real row and a null row
    val proj = GenerateMutableProjection.generate(Seq(sim, mh), useSubexprElimination = false)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c d e f"))
    val nullRow = org.apache.spark.sql.catalyst.InternalRow(null)
    val out = proj(row).copy()
    assert(out.getLong(0) == sim.eval(row).asInstanceOf[Long])
    assert(out.getArray(1).toLongArray().toSeq ==
      mh.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq)
    val outNull = proj(nullRow).copy()
    assert(outNull.isNullAt(0)) // simhash propagates null
    assert(outNull.getArray(1).toLongArray().forall(_ == Long.MaxValue)) // HOF empty arm
  }
}
