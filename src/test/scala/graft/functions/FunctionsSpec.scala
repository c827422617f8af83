package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Functions => F}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head().get(0)

  test("uuidOrZero: valid lowered, invalid/null -> zero uuid (sidefunctions.go:131-132)") {
    val rows = Seq(
      "123E4567-E89B-12D3-A456-426614174000", // valid, mixed case
      "123e4567-e89b-12d3-a456-426614174000", // valid
      "not-a-uuid", "", null
    ).toDF("u").select(F.uuidOrZero(col("u"))).as[String].collect()
    assert(rows(0) == "123e4567-e89b-12d3-a456-426614174000")
    assert(rows(1) == "123e4567-e89b-12d3-a456-426614174000")
    assert(rows(2) == F.ZeroUuid && rows(3) == F.ZeroUuid && rows(4) == F.ZeroUuid)
  }

  test("ipv4 parse/format round-trip; invalid -> null") {
    val rows = Seq("1.2.3.4", "255.255.255.255", "0.0.0.0", "256.1.1.1", "1.2.3", "x", null)
      .toDF("ip").select(F.ipv4ToLong(col("ip")), F.ipv4Canonical(col("ip"))).collect()
    assert(rows(0).getLong(0) == 16909060L && rows(0).getString(1) == "1.2.3.4")
    assert(rows(1).getLong(0) == 4294967295L)
    assert(rows(2).getLong(0) == 0L && rows(2).getString(1) == "0.0.0.0")
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1))
    assert(rows(4).isNullAt(0) && rows(5).isNullAt(0) && rows(6).isNullAt(0))
  }

  test("ipv6 canonicalization (RFC 5952 zero compression)") {
    val rows = Seq(
      "2001:0db8:0000:0000:0000:0000:0000:0001",
      "2001:DB8::1", "::1", "::", "fe80:0:0:0:1:0:0:1", "not:an:ip", null)
      .toDF("ip").select(F.ipv6Canonical(col("ip"))).as[String].collect()
    assert(rows(0) == "2001:db8::1")
    assert(rows(1) == "2001:db8::1")
    assert(rows(2) == "::1")
    assert(rows(3) == "::")
    assert(rows(4) == "fe80::1:0:0:1") // leftmost longest zero-run compressed
    assert(rows(5) == null && rows(6) == null)
  }

  test("formatReadableSize matches ClickHouse 1024-based style (database.go:400)") {
    val rows = Seq(512.0, 1024.0, 1536.0, 1048576.0, 3.5 * 1024 * 1024 * 1024)
      .toDF("b").select(F.formatReadableSize(col("b"))).as[String].collect()
    assert(rows(0) == "512.00 B")
    assert(rows(1) == "1.00 KiB")
    assert(rows(2) == "1.50 KiB")
    assert(rows(3) == "1.00 MiB")
    assert(rows(4) == "3.50 GiB")
  }

  test("toJsonString emits bare JSON like ClickHouse toJSONString") {
    assert(one(F.toJsonString(lit(87))) == "87")
    assert(one(F.toJsonString(lit("a\"b"))) == "\"a\\\"b\"")
    assert(one(F.toJsonString(array(lit(1), lit(2)))) == "[1,2]")
    assert(one(F.toJsonString(struct(lit(1).as("x"), lit("y").as("s"))))
      == "{\"x\":1,\"s\":\"y\"}")
    assert(one(F.toJsonString(lit(null).cast("int"))) == "null")
  }
}
