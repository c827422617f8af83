package graft.cli

import graft.SparkSpec
import graft.cli.GraftCopy._

class GraftCopySpec extends SparkSpec {

  test("parseMode: exactly one mode flag (main.go:25-43)") {
    assert(parseMode(Seq("--info", "a", "b")) == Right(Info))
    assert(parseMode(Seq("-s")) == Right(Sync))
    assert(parseMode(Seq("--version")) == Right(Version))
    assert(parseMode(Seq("a", "b")).isLeft)
    assert(parseMode(Seq("--info", "--sync")).isLeft)
  }

  test("version mode exits clean without a session") {
    assert(GraftCopy.run(Seq("--version")) == Status.Ok)
  }

  test("usage errors return the usage status") {
    assert(GraftCopy.run(Seq("--info", "onlyonearg")) == Status.UsageFail)
  }

  test("flat single-file destination: info compares; sync migrates to partitioned layout") {
    val dst = tmpDir("graftcopy-flat")
    val key = "date_format(l_shipdate, 'yyyyMM')"
    // flat layout: dst/<table>.parquet file, as the fixture dirs use
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf001/lineitem.parquet"),
      java.nio.file.Paths.get(s"$dst/lineitem.parquet"))
    // identical content -> clean compare against the flat file
    assert(reconcile(spark, sf001, dst, "lineitem", key, execute = false) == Status.Ok)
    // different source -> sync migrates the flat file to a partitioned dir
    val src2 = "/root/testdata/sf0.01"
    assert(reconcile(spark, src2, dst, "lineitem", key, execute = true) == Status.Ok)
    assert(!new java.io.File(s"$dst/lineitem.parquet").exists)
    assert(new java.io.File(s"$dst/lineitem").isDirectory)
    assert(reconcile(spark, src2, dst, "lineitem", key, execute = false) == Status.Ok)
  }

  test("info/sync lifecycle: copy-all, detect corruption, repair, clean") {
    val dst = tmpDir("graftcopy")
    val key = "date_format(l_shipdate, 'yyyyMM')"
    // 1. dest missing -> info flags, sync full-copies
    assert(reconcile(spark, sf001, dst, "lineitem", key, execute = false) == Status.DataFail)
    assert(reconcile(spark, sf001, dst, "lineitem", key, execute = true) == Status.Ok)
    // 2. now consistent
    assert(reconcile(spark, sf001, dst, "lineitem", key, execute = false) == Status.Ok)
    // 3. corrupt one partition in dest (delete its directory)
    val partDir = new java.io.File(s"$dst/lineitem/__part=199603")
    assert(partDir.exists)
    partDir.listFiles().foreach(_.delete()); partDir.delete()
    assert(reconcile(spark, sf001, dst, "lineitem", key, execute = false) == Status.HashFail)
    // 4. sync repairs, then clean again
    assert(reconcile(spark, sf001, dst, "lineitem", key, execute = true) == Status.Ok)
    assert(reconcile(spark, sf001, dst, "lineitem", key, execute = false) == Status.Ok)
  }
}
