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

  test("text-pipeline and hash expressions callable from SQL") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf001/documents.parquet").createOrReplaceTempView("docs_ext2")

    // word_shingles / minhash_shingled ≡ the Column API
    val sh = spark.sql(
      "SELECT doc_id, word_shingles(text) AS s, minhash_shingled(text) AS m FROM docs_ext2 ORDER BY doc_id LIMIT 10")
    val shCol = spark.table("docs_ext2")
      .select(col("doc_id"), graft.dedup.Dedup.wordShingles(col("text")).as("s"),
        graft.functions.expressions.TextHashExpressions.minhashShingled(col("text"), 3, 32).as("m"))
      .orderBy("doc_id").limit(10)
    assert(sh.collect().toSeq == shCol.collect().toSeq)

    // rolling_chunk_texts reconstruct through SQL, hashes match
    val rc = spark.sql(
      """SELECT count(*) AS bad FROM docs_ext2
         WHERE concat_ws('', rolling_chunk_texts(text)) <> text
            OR size(rolling_chunks(text)) <> size(rolling_chunk_texts(text))""")
    assert(rc.head().getLong(0) == 0)

    // portable_row_hash60 ≡ the builtin md5-prefix chain
    val ph = spark.sql(
      "SELECT doc_id, portable_row_hash60(doc_id, text) AS h FROM docs_ext2 ORDER BY doc_id LIMIT 10")
    val phCol = spark.table("docs_ext2")
      .select(col("doc_id"), graft.fp.Fingerprint.portableRowHash(
        graft.fp.Fingerprint.portableCanonicalCols(
          spark.table("docs_ext2"), Seq("doc_id", "text"))).as("h"))
      .orderBy("doc_id").limit(10)
    assert(ph.collect().toSeq == phCol.collect().toSeq)

    // vector_sum as a SQL aggregate over quantized embeddings
    spark.read.parquet(s"$sf001/embeddings.parquet").createOrReplaceTempView("emb_ext2")
    val vs = spark.sql(
      """SELECT label, vector_sum(transform(embedding, x -> CAST(round(x * 1000) AS BIGINT))) AS s
         FROM emb_ext2 GROUP BY label ORDER BY label""")
    val vsCol = spark.table("emb_ext2")
      .select(col("label"), org.apache.spark.sql.functions.transform(col("embedding"),
        x => org.apache.spark.sql.functions.round(x * 1000).cast("long")).as("q"))
      .groupBy("label")
      .agg(graft.functions.expressions.VectorAggregates.vectorSum(col("q")).as("s"))
      .orderBy("label")
    assert(vs.collect().toSeq == vsCol.collect().toSeq)

    // sorted_asof_pick ≡ the filter/element_at composition, through SQL
    spark.read.parquet(s"$sf001/events.parquet").createOrReplaceTempView("ev_ext2")
    val ap = spark.sql(
      """WITH hist AS (
           SELECT user_id, sort_array(collect_list(struct(ts AS __ts, value))) AS arr
           FROM ev_ext2 WHERE event_type = 'signup' GROUP BY user_id)
         SELECT e.event_id, sorted_asof_pick(h.arr, e.ts).value AS v
         FROM ev_ext2 e JOIN hist h ON e.user_id = h.user_id
         ORDER BY e.event_id LIMIT 50""")
    val apOld = spark.sql(
      """WITH hist AS (
           SELECT user_id, sort_array(collect_list(struct(ts AS __ts, value))) AS arr
           FROM ev_ext2 WHERE event_type = 'signup' GROUP BY user_id)
         SELECT e.event_id,
           CASE WHEN size(filter(h.arr, x -> x.__ts <= e.ts)) > 0
                THEN element_at(filter(h.arr, x -> x.__ts <= e.ts),
                                size(filter(h.arr, x -> x.__ts <= e.ts))).value
           END AS v
         FROM ev_ext2 e JOIN hist h ON e.user_id = h.user_id
         ORDER BY e.event_id LIMIT 50""")
    assert(ap.collect().toSeq == apOld.collect().toSeq)
  }

  test("SQL builders reject wrong arity with the usage message, never a MatchError") {
    GraftExtensions.register(spark)
    spark.range(1).selectExpr("'a b c d' AS text").createOrReplaceTempView("arity_t")
    def err(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // 2-arg minhash_shingled is now a SUPPORTED form (n with default k)
    assert(spark.sql("SELECT minhash_shingled(text, 2) FROM arity_t").collect().nonEmpty)
    // wrong arities surface the usage string
    assert(err("SELECT minhash_shingled(text, 2, 3, 4) FROM arity_t")
      .contains("minhash_shingled"))
    assert(err("SELECT word_shingles(text, 2, 9) FROM arity_t").contains("word_shingles"))
    assert(err("SELECT word_shingles() FROM arity_t").contains("word_shingles"))
    // chunk functions REJECT extra args instead of silently ignoring them
    assert(err("SELECT rolling_chunks(text, 99) FROM arity_t").contains("rolling_chunks"))
    assert(err("SELECT rolling_chunk_texts(text, 99) FROM arity_t")
      .contains("rolling_chunk_texts"))
    assert(err("SELECT minhash_signature(array('a'), 8, 9) FROM arity_t")
      .contains("minhash_signature"))
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
