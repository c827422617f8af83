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
}
