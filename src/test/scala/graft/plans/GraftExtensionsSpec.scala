package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("native expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet").createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql(
      "SELECT doc_id, simhash64(text) AS sh FROM docs_ext ORDER BY doc_id LIMIT 20")
    val viaColumn = spark.table("docs_ext")
      .select(col("doc_id"), graft.dedup.Dedup.simhash(col("text")).as("sh"))
      .orderBy("doc_id").limit(20)
    assert(viaSql.collect().toSeq == viaColumn.collect().toSeq)

    val viaSqlP = spark.sql(
      "SELECT doc_id, portable_simhash48(text) AS sh FROM docs_ext ORDER BY doc_id LIMIT 20")
    val viaColumnP = spark.table("docs_ext")
      .select(col("doc_id"), graft.dedup.Dedup.portableSimhash(col("text")).as("sh"))
      .orderBy("doc_id").limit(20)
    assert(viaSqlP.collect().toSeq == viaColumnP.collect().toSeq)

    spark.read.parquet(s"$sf001/embeddings.parquet").createOrReplaceTempView("emb_ext")
    val cos = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, a.embedding) AS c
         FROM emb_ext a ORDER BY a.vec_id LIMIT 5""").collect()
    cos.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))

    val lsh = spark.sql(
      "SELECT vec_id, lsh_signature(embedding, 8) AS sig FROM emb_ext ORDER BY vec_id LIMIT 20")
    val lshCol = spark.table("emb_ext")
      .select(col("vec_id"),
        graft.sim.Similarity.lshSignature(col("embedding"), 8).as("sig"))
      .orderBy("vec_id").limit(20)
    assert(lsh.collect().toSeq == lshCol.collect().toSeq)

    // bounded_top_k as a SQL aggregate: top-3 docs by doc_id score
    val topk = spark.sql(
      """SELECT bounded_top_k(struct(CAST(doc_id AS DOUBLE) AS s, doc_id), 3) AS t
         FROM docs_ext""").head().getSeq[org.apache.spark.sql.Row](0)
    val top3 = spark.table("docs_ext").orderBy(desc("doc_id")).limit(3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(topk.map(_.getLong(1)) == top3)
  }

  test("virtual-column per-file predicate (use_virtual_column / _part mode)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(col("l_orderkey"), col("_metadata.file_path").as("fp"))
    val somePath = li.head().getString(1)
    val n = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter(graft.pred.PartitionPredicate.byFile(somePath))
      .count()
    assert(n == li.filter(col("fp") === somePath).count() && n > 0)
  }
}
