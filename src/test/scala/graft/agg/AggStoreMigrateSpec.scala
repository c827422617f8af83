package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** AggStore.migrate contract (round-10 verdict #5): a migrated store is
  * bit-identical to a fresh rebuild on shared measures, backfills new
  * measures from raw behind an exact parity gate, supports explicit
  * null-state addition when raw is gone, drops measures cleanly, and —
  * the point of schema evolution — keeps ACCEPTING future appends under
  * the new config. */
class AggStoreMigrateSpec extends SparkSpec {

  private def events = Tables.load(spark, sf001, "events")
    .select(col("event_id"), col("event_type"), col("value"))

  private val keys = Seq("event_type")

  private def build(store: String, measures: Seq[(String, org.apache.spark.sql.Column)],
      nShards: Int = 3): Unit =
    (0L until nShards.toLong).foreach { i =>
      AggStore.appendMeasures(spark, store,
        events.filter(pmod(col("event_id"), lit(nShards.toLong)) === i),
        keys, measures, s"b_$i")
    }

  private val qty = Seq("qty" -> col("value"))
  private val both = Seq("qty" -> col("value"), "dbl" -> (col("value") * 2))

  private def asRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("migrate + raw backfill ≡ fresh rebuild, bit-for-bit, and future appends work") {
    val migrated = tmpDir("mig_a"); val rebuilt = tmpDir("mig_b")
    build(migrated, qty)
    assert(AggStore.migrate(spark, migrated, both, raw = events))
    build(rebuilt, both)
    val cols = Seq("event_type", "n", "qty_sum_u", "qty_min", "qty_max",
      "dbl_sum_u", "dbl_min", "dbl_max")
    assert(asRows(AggStore.merged(spark, migrated).select(cols.map(col): _*)) ==
      asRows(AggStore.merged(spark, rebuilt).select(cols.map(col): _*)))
    // schema evolution's point: the migrated store accepts appends under
    // the NEW config (exact StructType equality inside appendStates)
    val extra = events.filter(col("event_id") < 0) // empty but schema-real
    AggStore.appendMeasures(spark, migrated, extra, keys, both, "b_new")
    AggStore.appendMeasures(spark, rebuilt, extra, keys, both, "b_new")
    assert(asRows(AggStore.merged(spark, migrated).select(cols.map(col): _*)) ==
      asRows(AggStore.merged(spark, rebuilt).select(cols.map(col): _*)))
  }

  test("null-state migrate: shared measures exact, new measure empty-encoded") {
    val store = tmpDir("mig_null")
    build(store, qty)
    val before = asRows(AggStore.merged(spark, store)
      .select("event_type", "n", "qty_sum_u", "qty_min", "qty_max"))
    assert(AggStore.migrate(spark, store, both, raw = null))
    val m = AggStore.merged(spark, store)
    assert(asRows(m.select("event_type", "n", "qty_sum_u", "qty_min", "qty_max")) == before)
    // the all-null-group encoding: sum 0, min/max NULL (what a real shard
    // of null measure values would have produced)
    val nn = m.select(sum(when(col("dbl_sum_u") =!= 0L, 1L).otherwise(0L)).as("s"),
      sum(when(col("dbl_min").isNotNull || col("dbl_max").isNotNull, 1L).otherwise(0L)).as("x"))
      .head()
    assert(nn.getLong(0) == 0L && nn.getLong(1) == 0L)
    // and future appends fold real values into the null-started states
    AggStore.appendMeasures(spark, store,
      events.filter(col("event_id") < 100), keys, both, "b_tail")
    assert(AggStore.merged(spark, store).filter(col("dbl_min").isNotNull).count() > 0)
  }

  test("backfill parity gate: partial raw fails loudly, store unchanged") {
    val store = tmpDir("mig_gate")
    build(store, qty)
    val before = asRows(AggStore.merged(spark, store)
      .select("event_type", "n", "qty_sum_u"))
    val e = intercept[IllegalArgumentException] {
      AggStore.migrate(spark, store, both, raw = events.filter(col("event_id") < 100))
    }
    assert(e.getMessage.contains("disagrees"))
    assert(asRows(AggStore.merged(spark, store)
      .select("event_type", "n", "qty_sum_u")) == before)
  }

  test("dropping a measure matches a rebuild without it") {
    val dropped = tmpDir("mig_drop"); val rebuilt = tmpDir("mig_drop_b")
    build(dropped, both)
    assert(AggStore.migrate(spark, dropped, qty))
    build(rebuilt, qty)
    val cols = Seq("event_type", "n", "qty_sum_u", "qty_min", "qty_max")
    val m = AggStore.merged(spark, dropped)
    assert(!m.columns.contains("dbl_sum_u"))
    assert(asRows(m.select(cols.map(col): _*)) ==
      asRows(AggStore.merged(spark, rebuilt).select(cols.map(col): _*)))
  }
}
