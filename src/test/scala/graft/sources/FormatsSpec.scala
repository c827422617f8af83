package graft.sources

import graft.SparkSpec
import graft.fp.Fingerprint

class FormatsSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  test("CSV round-trip preserves content (fingerprint equality)") {
    val p = tmpDir("fmt-csv")
    Formats.writeCsv(li, s"$p/li")
    val back = Formats.readCsv(spark, s"$p/li", li.schema)
    assert(Fingerprint.ofDataFrame(back) == Fingerprint.ofDataFrame(li))
  }

  test("JSON round-trip preserves content (fingerprint equality)") {
    val p = tmpDir("fmt-json")
    Formats.writeJson(li, s"$p/li")
    val back = Formats.readJson(spark, s"$p/li", li.schema)
    assert(Fingerprint.ofDataFrame(back) == Fingerprint.ofDataFrame(li))
  }

  test("JSON quarantine: clean rows pass, malformed lines preserved verbatim") {
    import org.apache.spark.sql.types._
    val p = tmpDir("fmt-quar")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$p/in.json"),
      """{"id": 1, "name": "ok"}
        |{"id": 2 "name": "missing comma"}
        |{"id": 3, "name": "fine"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val qr = Formats.readJsonQuarantine(spark, s"$p/in.json", schema)
    assert(qr.clean.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    val bad = qr.quarantine.collect().map(_.getString(0)).toSet
    assert(bad.size == 2 && bad.contains("not json at all"))
    assert(bad.exists(_.contains("missing comma"))) // raw line kept for replay
    qr.release() // frees the split's backing cache
  }
}
