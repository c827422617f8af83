package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The structural corpus-join broadcast guard (round-7 task #1): the
  * DemoteCorpusBroadcast rule must strip broadcast eligibility from
  * corpus↔corpus equi-joins — whatever the compile-time estimates say —
  * while leaving dimension broadcasts, explicit broadcast() hints, and
  * bounded 1-row cross joins untouched. */
class DemoteCorpusBroadcastSpec extends SparkSpec {

  private def docs = graft.core.Tables.load(spark, sf001, "documents")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("corpus↔corpus equi-join never plans a broadcast hash join") {
    // the x30 OOM reproduction: a pruned 1-column projection of the corpus
    // estimates tiny, and without the rule the static planner broadcasts it
    val ids = docs.select(col("doc_id"))
    val agg = docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val p = planOf(ids.join(agg, Seq("doc_id"), "left"))
    assert(!p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("explicit broadcast() on a bounded corpus-derived side survives the rule") {
    // the duplicateClusters repLabel pattern: the caller COUNTED the side
    // and asserted the bound — the rule only fills EMPTY strategy slots
    val small = broadcast(docs.groupBy("lang").agg(count(lit(1)).as("n")))
    val p = planOf(docs.join(small, Seq("lang")))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("corpus ⋈ dimension still broadcasts the dimension") {
    val li = graft.core.Tables.load(spark, sf001, "lineitem")
    val supp = spark.read.parquet(s"$sf001/supplier.parquet")
    val p = planOf(li.join(supp, li("l_suppkey") === supp("s_suppkey")))
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("1-row corpus-derived cross joins keep the broadcast nested-loop plan") {
    // the data-card/dedup-report stats pattern: no equi condition → the
    // rule must not touch it (forcing CartesianProduct would be worse)
    val a = docs.agg(count(lit(1)).as("n_docs"))
    val b = docs.agg(countDistinct(col("text")).as("n_texts"))
    val p = planOf(a.crossJoin(b))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("the rule also blocks AQE's runtime SMJ→BHJ conversion") {
    // hint rides the logical join through adaptive re-planning: execute
    // and inspect the FINAL plan
    val ids = docs.select(col("doc_id"))
    val agg = docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val df = ids.join(agg, Seq("doc_id"), "left")
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!fin.contains("BroadcastHashJoin"), fin.take(1500))
  }

  test("persisted store trees register as corpus-scale on read") {
    val store = tmpDir("corpus_seen_store")
    graft.dedup.SeenStore.update(spark, store,
      docs.limit(50), "text", "s0")
    val seen = graft.dedup.SeenStore.read(spark, store).get
    // store ⋈ corpus: the anti-join probe side must never broadcast-build
    // the store, however small its estimate
    val p = planOf(graft.dedup.Dedup.dropSeen(docs, "text", seen))
    assert(!p.contains("BroadcastHashJoin"), p.take(1500))
  }
}
