package graft.functions.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Similarity

/** Parity of the native CosineSimilarity expression with its executable
  * HOF spec (Similarity.cosineHof), including the degenerate inputs the
  * round-1 advice flagged: ragged lengths, zero norms, empty arrays, null
  * elements, and double-typed arrays. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def bothWays(pairs: Seq[(Seq[java.lang.Float], Seq[java.lang.Float])]): Unit = {
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    rows.zip(pairs).foreach { case (r, p) =>
      val (nNull, hNull) = (r.isNullAt(0), r.isNullAt(1))
      assert(nNull == hNull, s"null-ness diverges for $p: native=$r")
      if (!nNull) {
        val (n, h) = (r.getDouble(0), r.getDouble(1))
        assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
          s"value diverges for $p: native=$n hof=$h")
      }
    }
  }

  private def F(xs: Float*): Seq[java.lang.Float] = xs.map(java.lang.Float.valueOf)

  test("native == HOF on regular vectors (bitwise)") {
    bothWays(Seq(
      (F(1f, 2f, 3f), F(4f, 5f, 6f)),
      (F(-1f, 0.5f, 2.25f), F(0.125f, -8f, 1f)),
      (F(1f, 0f, 0f), F(0f, 1f, 0f)),
      (F(0.1f, 0.2f), F(0.3f, 0.7f))))
  }

  test("ragged lengths -> null (zip_with null-pads, it does not truncate)") {
    bothWays(Seq(
      (F(1f, 2f, 3f), F(1f, 2f)),
      (F(1f), F(1f, 2f, 3f, 4f))))
  }

  test("zero norm and empty arrays -> null (double division by zero is null)") {
    bothWays(Seq(
      (F(0f, 0f, 0f), F(1f, 2f, 3f)),
      (F(1f, 2f, 3f), F(0f, 0f, 0f)),
      (F(0f, 0f), F(0f, 0f)),
      (Seq.empty, Seq.empty)))
  }

  test("null elements poison the result -> null") {
    bothWays(Seq(
      (Seq(java.lang.Float.valueOf(1f), null, java.lang.Float.valueOf(3f)), F(1f, 2f, 3f)),
      (F(1f, 2f, 3f), Seq(null, java.lang.Float.valueOf(2f), java.lang.Float.valueOf(3f)))))
  }

  test("double-typed arrays accepted, values match the HOF double path") {
    val df = Seq((Seq(1.0, 2.5, -3.0), Seq(0.5, 2.0, 4.0))).toDF("a", "b")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("non-array input is an analysis-time error, not silent garbage") {
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Similarity.cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_similarity") ||
      e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }

  test("lsh signature: native == HOF bitwise on real embeddings and edge vectors") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    for (planes <- Seq(4, 8, 16, 64)) {
      // null-SAFE comparison: =!= would silently skip rows where one side
      // is NULL, vacuously passing exactly the divergence class it guards
      val diverged = emb.select(
          Similarity.lshSignature(col("embedding"), planes).as("native"),
          Similarity.lshSignatureHof(col("embedding"), planes).as("hof"))
        .filter(not(col("native") <=> col("hof"))).count()
      assert(diverged == 0, s"planes=$planes: $diverged rows diverge")
    }
    // edges: empty -> 0; null element -> 0; NULL vector -> 0 (HOF's null
    // projections OR to zero); NaN projection -> all bits (Spark's double
    // ordering puts NaN above 0, so `proj >= 0` is TRUE)
    val edges = Seq(Seq.empty[java.lang.Float], Seq(F(1f, -2f): _*),
      Seq[java.lang.Float](java.lang.Float.valueOf(1f), null),
      null.asInstanceOf[Seq[java.lang.Float]],
      Seq(F(Float.NaN, 1f): _*))
      .toDF("v")
      .select(Similarity.lshSignature(col("v"), 8).as("native"),
        Similarity.lshSignatureHof(col("v"), 8).as("hof"))
      .collect()
    edges.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1), s"NULL leaked: $r")
      assert(r.getLong(0) == r.getLong(1), r.toString)
    }
    assert(edges(0).getLong(0) == 0L && edges(2).getLong(0) == 0L)
    assert(edges(3).getLong(0) == 0L)          // NULL vector
    assert(edges(4).getLong(0) == 255L)        // NaN: all 8 bits set
  }
}
