package graft.core

import graft.SparkSpec

/** Crash-recovery contract of the persisted-store replace discipline:
  * every interleaving of (write tmp, delete store, rename) that a crash
  * can produce must read back as either the OLD complete store or the NEW
  * complete store — never a partial directory. */
class AtomicStoreSpec extends SparkSpec {
  import spark.implicits._

  private def write(path: String, xs: Seq[Long]): Unit =
    AtomicStore.replace(spark, path, xs.toDF("v"))

  private def readBack(path: String): Option[Set[Long]] =
    AtomicStore.read(spark, path).map(_.as[Long].collect().toSet)

  test("replace then read round-trips; second replace swaps contents") {
    val p = tmpDir("astore") + "/store"
    write(p, Seq(1L, 2L))
    assert(readBack(p).contains(Set(1L, 2L)))
    write(p, Seq(3L))
    assert(readBack(p).contains(Set(3L)))
    // no tmp dir left behind after a clean replace
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p + "_tmp")))
  }

  test("crash between delete and rename: completed tmp is adopted as the store") {
    val p = tmpDir("astore") + "/store"
    write(p, Seq(1L, 2L))
    // simulate: new store fully written to tmp, old store deleted, crash
    // before rename
    (Seq(9L).toDF("v")).write.mode("overwrite").parquet(p + "_tmp")
    graft.core.Fs.deleteRecursively(java.nio.file.Paths.get(p))
    assert(readBack(p).contains(Set(9L))) // read() adopted the tmp
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p + "_tmp")))
  }

  test("crash mid-write of the first-ever store: partial tmp is deleted, not promoted") {
    val p = tmpDir("astore") + "/store"
    // simulate: tmp contains files but no _SUCCESS (incomplete job)
    val tmp = java.nio.file.Paths.get(p + "_tmp")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.writeString(tmp.resolve("part-00000.parquet"), "garbage")
    assert(readBack(p).isEmpty) // no store, no crash, no adoption
    assert(!java.nio.file.Files.exists(tmp)) // partial tmp cleaned up
    // and the path is reusable afterwards
    write(p, Seq(5L))
    assert(readBack(p).contains(Set(5L)))
  }

  test("heal: adopts a completed tmp without reading; no-op when the store exists") {
    val p = tmpDir("astore") + "/store"
    (Seq(7L).toDF("v")).write.mode("overwrite").parquet(p + "_tmp")
    AtomicStore.heal(spark, p)
    assert(readBack(p).contains(Set(7L)))
    // store present: a later heal leaves both store and a stray tmp alone
    // is NOT the contract — the writer deletes tmp itself (replaceVia);
    // heal just must not clobber the live store
    AtomicStore.heal(spark, p)
    assert(readBack(p).contains(Set(7L)))
  }

  test("replace guarantees the _SUCCESS marker even when the committer is configured not to") {
    // object-store tunings disable marksuccessfuljobs; without the
    // explicit marker, a crash between delete and rename would make
    // read() discard the COMPLETE tmp and erase the accumulated store
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    val prev = hc.get(key)
    hc.set(key, "false")
    try {
      val p = tmpDir("astore") + "/store"
      write(p, Seq(7L))
      // simulate the crash window: move the store back to tmp state
      val store = java.nio.file.Paths.get(p)
      val tmp = java.nio.file.Paths.get(p + "_tmp")
      java.nio.file.Files.move(store, tmp)
      assert(java.nio.file.Files.exists(tmp.resolve("_SUCCESS")))
      assert(readBack(p).contains(Set(7L))) // adopted, not discarded
    } finally {
      if (prev == null) hc.unset(key) else hc.set(key, prev)
    }
  }

  test("compact: identical rows back, fewer files, absent store is a no-op") {
    val p = tmpDir("astore") + "/store"
    assert(!AtomicStore.compact(spark, p)) // nothing there yet
    // many-file store (one file per shuffle task, the post-update shape)
    AtomicStore.replace(spark, p, (1L to 100L).toDF("v").repartition(8))
    val before = AtomicStore.dataFileCount(spark, p)
    assert(before >= 8)
    assert(AtomicStore.compact(spark, p))
    assert(AtomicStore.dataFileCount(spark, p) == 1)
    assert(readBack(p).contains((1L to 100L).toSet))
    // leftover-tmp hygiene, same as replace
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p + "_tmp")))
  }

  test("replace may lazily read the store it replaces (incremental merge shape)") {
    val p = tmpDir("astore") + "/store"
    write(p, Seq(1L, 2L))
    val incremented = AtomicStore.read(spark, p).get
      .union(Seq(3L).toDF("v")) // lazy plan still reading the old store
    AtomicStore.replace(spark, p, incremented)
    assert(readBack(p).contains(Set(1L, 2L, 3L)))
  }
}
