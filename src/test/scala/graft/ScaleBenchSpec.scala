package graft

import org.apache.spark.sql.functions._

class ScaleBenchSpec extends SparkSpec {

  test("scaled corpus: key offsets, constant time density, disjoint tokens") {
    val out = java.nio.file.Files.createTempDirectory("graft_scale_spec").toString
    try {
      ScaleBench.build(spark, sf001, out, factor = 2)
      def raw(dir: String, t: String) = {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$dir/$t.parquet")
      }

      // fact rows scale by the factor; dimensions stay fixed
      assert(raw(out, "lineitem").count() == 2 * raw(sf001, "lineitem").count())
      assert(raw(out, "orders").count() == 2 * raw(sf001, "orders").count())
      assert(raw(out, "nation").count() == raw(sf001, "nation").count())

      // join integrity: every scaled lineitem still finds its order
      val l = raw(out, "lineitem").select(col("l_orderkey").as("k")).distinct()
      val o = raw(out, "orders").select(col("o_orderkey").as("k")).distinct()
      assert(l.join(o, Seq("k"), "left_anti").count() == 0)

      // events: copy 1 shifted FORWARD past copy 0's span (constant
      // density — the whole point of the round-5 corpus fix), ids offset.
      // All time math in epoch-MICROS so the spec is agnostic to the
      // fixture's ts encoding (INT64 nanos vs timestamp[us]).
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val tsIsLongNanos = raw(sf001, "events").schema("ts").dataType ==
        org.apache.spark.sql.types.LongType
      def withMicros(df: org.apache.spark.sql.DataFrame) = df.withColumn("tsu",
        if (tsIsLongNanos) expr("ts div 1000") // integer div: ns epoch > 2^53
        else unix_micros(col("ts").cast("timestamp")))
      val base = withMicros(raw(sf001, "events"))
      val scaled = withMicros(raw(out, "events"))
      // physical shape preserved: the scaled file streams through the same
      // pathGlobFilter source, so ts must keep the fixture's type
      assert(scaled.schema("ts").dataType == base.schema("ts").dataType)
      assert(scaled.count() == 2 * base.count())
      val Array(bMin, bMax) = base.agg(min("tsu"), max("tsu")).head()
        .toSeq.map(_.asInstanceOf[Long]).toArray
      val span = bMax - bMin + 3600L * 1000000L
      // copy 0 bit-identical range; copy 1 exactly one span later
      val tsSet = scaled.select("tsu").distinct()
      assert(tsSet.filter(col("tsu") > bMax && col("tsu") < bMin + span).count() == 0)
      assert(scaled.agg(max("tsu")).head().getLong(0) == bMax + span)
      assert(scaled.select("event_id").distinct().count() == scaled.count())

      // the time-window join's output is exactly factor x base — the
      // cardinality law SCALING.md leans on
      def joinOut(df: org.apache.spark.sql.DataFrame): Long = {
        val p = df.select(col("tsu").as("pt"))
        val i = df.filter(col("event_type") === "signup")
          .select(col("tsu").as("lo"), (col("tsu") + 3600L * 1000000L).as("hi"))
        p.join(i, col("pt") >= col("lo") && col("pt") <= col("hi")).count()
      }
      assert(joinOut(scaled) == 2 * joinOut(base))

      // documents: copy tokens are disjoint from base tokens (fresh text,
      // no planted dup cliques); copy 0 survives verbatim
      val docs = raw(out, "documents")
      val baseDocs = raw(sf001, "documents")
      assert(docs.count() == 2 * baseDocs.count())
      val docOff = baseDocs.agg(max("doc_id")).head().getLong(0) + 1
      val copyToks = docs.filter(col("doc_id") >= docOff)
        .select(explode(split(trim(col("text")), "\\s+")).as("t")).distinct()
      val baseToks = baseDocs
        .select(explode(split(trim(col("text")), "\\s+")).as("t")).distinct()
      assert(copyToks.join(baseToks, Seq("t")).count() == 0)
      val copy0 = docs.filter(col("doc_id") < docOff).select("doc_id", "text")
      assert(copy0.exceptAll(baseDocs.select("doc_id", "text")).count() == 0)

      // embeddings: the noised copy is nowhere near-duplicate of its source
      val emb = raw(out, "embeddings")
      val baseEmb = raw(sf001, "embeddings")
      val vecOff = baseEmb.agg(max("vec_id")).head().getLong(0) + 1
      val pairsCos = emb.filter(col("vec_id") >= vecOff)
        .select((col("vec_id") - vecOff).as("vec_id"), col("embedding").as("vc"))
        .join(baseEmb.select(col("vec_id"), col("embedding").as("vb")), "vec_id")
        .select(graft.sim.Similarity.cosine(col("vc"), col("vb")).as("cos"))
      assert(pairsCos.filter(col("cos") > 0.9).count() == 0)
    } finally graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(out))
  }
}
