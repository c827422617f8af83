package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.agg.AggStore
import graft.core.WriterLease.ConcurrentWriterException

/** Writer-lease contract (round-10 verdict #3): two writers against one
  * store path — one wins, the other fails LOUDLY, and store reads stay
  * consistent; a crashed writer's stale lock breaks after the TTL; the
  * lease always releases, even when the guarded operation throws. */
class WriterLeaseSpec extends SparkSpec {

  private def events = Tables.load(spark, sf001, "events")
    .select(col("event_id"), col("event_type"), col("value"))

  test("second writer fails loudly while the first holds the lease; store stays consistent") {
    val store = tmpDir("lease_interleave")
    // writer A mid-append (holds the lease)
    val a = WriterLease.acquire(spark, store)
    try {
      // writer B: the exact interleaving that would corrupt shard
      // subtrees must throw, not proceed
      val e = intercept[ConcurrentWriterException] {
        AggStore.append(spark, store, events, Seq("event_type"), "value", "s0")
      }
      assert(e.getMessage.contains(store))
    } finally a.release()
    // after A releases, the append proceeds and the read is the from-raw
    // answer — nothing half-written survived the refused attempt
    AggStore.append(spark, store, events, Seq("event_type"), "value", "s0")
    val expected = events.groupBy("event_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val got = AggStore.merged(spark, store)
      .select("event_type", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("the same guard protects every store family (seen-store arm)") {
    val store = tmpDir("lease_seen")
    val a = WriterLease.acquire(spark, store)
    try intercept[ConcurrentWriterException] {
      graft.dedup.SeenStore.update(spark, store,
        events.withColumn("t", col("event_type")), "t", "s0")
    } finally a.release()
  }

  test("a crashed writer's stale lock breaks after the TTL") {
    val store = tmpDir("lease_stale")
    WriterLease.acquire(spark, store) // never released — the "crash"
    // within TTL: still held
    intercept[ConcurrentWriterException] {
      WriterLease.acquire(spark, store, ttlMs = 3600000L)
    }
    // past TTL: broken and re-acquired
    val b = WriterLease.acquire(spark, store, ttlMs = 0L)
    b.release()
  }

  test("withLease releases on exception (store writable afterwards)") {
    val store = tmpDir("lease_release")
    intercept[IllegalStateException] {
      WriterLease.withLease(spark, store) {
        throw new IllegalStateException("op failed")
      }
    }
    // lock is gone: a fresh acquire succeeds immediately
    WriterLease.acquire(spark, store).release()
  }

  test("release is idempotent and reads never see the lock file") {
    val store = tmpDir("lease_reads")
    val l = WriterLease.acquire(spark, store)
    l.release(); l.release()
    AggStore.append(spark, store, events, Seq("event_type"), "value", "s0")
    // the sibling lock (if any) lives OUTSIDE the store tree — parquet
    // listing of the store path must not trip over lease artifacts
    assert(AggStore.merged(spark, store).count() > 0)
  }
}
