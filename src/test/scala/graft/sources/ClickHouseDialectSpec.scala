package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit matrix for [[ClickHouseDialect]] — the type vocabulary is exactly
  * the reference's cast matrix
  * (`/root/reference/database/sidefunctions.go:112-192`): UInt widths,
  * DateTime/DateTime64, LowCardinality(String), Array(String),
  * IPv4/IPv6/UUID/JSON. No ClickHouse server exists in this environment,
  * so the read direction is asserted on the type NAMES the clickhouse-jdbc
  * driver reports, and the delete path on the generated statement
  * (statement-assertion mode; Derby exercises the live execution path in
  * ClickHouseJdbcLiveSpec). */
class ClickHouseDialectSpec extends AnyFunSuite {
  private val d = ClickHouseDialect
  private def md = new MetadataBuilder()

  test("registers and resolves for jdbc:clickhouse URLs only") {
    ClickHouseDialect.register()
    assert(JdbcDialects.get("jdbc:clickhouse://host:8123/db") eq ClickHouseDialect)
    assert(d.canHandle("jdbc:ClickHouse://h:8123/db")) // case-insensitive scheme
    assert(!d.canHandle("jdbc:derby:memory:x"))
    assert(!d.canHandle("jdbc:postgresql://h/db"))
  }

  // --- read direction: CH native type name → Catalyst ----------------------
  private def cat(name: String): DataType =
    d.getCatalystType(Types.OTHER, name, 0, md).getOrElse(
      fail(s"no catalyst mapping for $name"))

  test("unsigned widths widen to the next signed container; UInt64 → Decimal(20,0)") {
    assert(cat("UInt8") == ShortType)
    assert(cat("UInt16") == IntegerType)
    assert(cat("UInt32") == LongType)
    assert(cat("UInt64") == DecimalType(20, 0)) // max UInt64 needs 20 digits
    assert(cat("UInt128") == DecimalType(38, 0))
  }

  test("signed ints, floats, bool, wide ints") {
    assert(cat("Int8") == ByteType && cat("Int16") == ShortType)
    assert(cat("Int32") == IntegerType && cat("Int64") == LongType)
    assert(cat("Int128") == DecimalType(38, 0) && cat("Int256") == DecimalType(38, 0))
    assert(cat("Float32") == FloatType && cat("Float64") == DoubleType)
    assert(cat("Bool") == BooleanType)
  }

  test("string family: String, FixedString, LowCardinality, UUID/IPv4/IPv6/JSON, Enum") {
    assert(cat("String") == StringType)
    assert(cat("FixedString(16)") == StringType)
    assert(cat("LowCardinality(String)") == StringType)
    assert(cat("UUID") == StringType && cat("IPv4") == StringType)
    assert(cat("IPv6") == StringType && cat("JSON") == StringType)
    assert(cat("Enum8('a' = 1, 'b' = 2)") == StringType)
  }

  test("temporal: Date/Date32, DateTime with/without tz, DateTime64 with precision/tz") {
    assert(cat("Date") == DateType && cat("Date32") == DateType)
    assert(cat("DateTime") == TimestampType)
    assert(cat("DateTime('UTC')") == TimestampType)
    assert(cat("DateTime64(3)") == TimestampType)
    assert(cat("DateTime64(9, 'Europe/Moscow')") == TimestampType)
  }

  test("Decimal(p,s) carries precision and scale through") {
    assert(cat("Decimal(20, 0)") == DecimalType(20, 0))
    assert(cat("Decimal(38,10)") == DecimalType(38, 10))
  }

  test("Nullable/LowCardinality wrappers unwrap, composably") {
    assert(cat("Nullable(UInt64)") == DecimalType(20, 0))
    assert(cat("Nullable(LowCardinality(String))") == StringType)
    assert(cat("LowCardinality(Nullable(String))") == StringType)
  }

  test("Array(T) maps elementwise; element Nullable sets containsNull") {
    assert(cat("Array(String)") == ArrayType(StringType, containsNull = false))
    assert(cat("Array(LowCardinality(String))") == ArrayType(StringType, containsNull = false))
    assert(cat("Array(Nullable(Int64))") == ArrayType(LongType, containsNull = true))
    assert(cat("Array(Array(UInt32))") ==
      ArrayType(ArrayType(LongType, containsNull = false), containsNull = false))
  }

  test("unknown names fall through to Spark's generic mapping (None)") {
    assert(d.getCatalystType(Types.OTHER, "AggregateFunction(sum, UInt64)", 0, md).isEmpty)
    assert(d.getCatalystType(Types.OTHER, "Tuple(String, UInt8)", 0, md).isEmpty)
  }

  // --- write direction: Catalyst → CH DDL ----------------------------------
  private def ddl(dt: DataType): String =
    d.getJDBCType(dt).getOrElse(fail(s"no jdbc type for $dt")).databaseTypeDefinition

  test("write mapping produces native CH DDL types") {
    assert(ddl(ByteType) == "Int8" && ddl(ShortType) == "Int16")
    assert(ddl(IntegerType) == "Int32" && ddl(LongType) == "Int64")
    assert(ddl(FloatType) == "Float32" && ddl(DoubleType) == "Float64")
    assert(ddl(BooleanType) == "Bool" && ddl(StringType) == "String")
    assert(ddl(DateType) == "Date32" && ddl(TimestampType) == "DateTime64(6)")
    assert(ddl(DecimalType(20, 0)) == "Decimal(20,0)")
    assert(ddl(ArrayType(StringType, containsNull = false)) == "Array(String)")
    assert(ddl(ArrayType(LongType, containsNull = true)) == "Array(Nullable(Int64))")
  }

  test("round trip: every cast-matrix read type writes back to a type that reads the same") {
    // read(write(read(chType))) must be stable — the contract a copy
    // pipeline (reference's whole purpose) depends on
    val chTypes = Seq("UInt8", "UInt16", "UInt32", "UInt64", "Int8", "Int16",
      "Int32", "Int64", "Float32", "Float64", "String",
      "LowCardinality(String)", "Date", "DateTime", "DateTime64(3)",
      "Decimal(20,0)", "Array(String)", "UUID", "IPv4", "IPv6", "JSON")
    for (t <- chTypes) {
      val catalyst = cat(t)
      val written = ddl(catalyst)
      assert(cat(written) == catalyst, s"$t → $catalyst → $written not stable")
    }
  }

  test("ddlType puts nullability INSIDE the type, never on arrays") {
    assert(d.ddlType(StructField("a", LongType, nullable = true)) == "Nullable(Int64)")
    assert(d.ddlType(StructField("a", LongType, nullable = false)) == "Int64")
    // CH forbids Nullable(Array(…)) — nullability pushes to the element
    assert(d.ddlType(StructField("a", ArrayType(StringType, true), nullable = true))
      == "Array(Nullable(String))")
  }

  // --- identifiers, truncate, delete builder -------------------------------
  test("backtick quoting (MySQL-style), with embedded backtick doubling") {
    assert(d.quoteIdentifier("col") == "`col`")
    assert(d.quoteIdentifier("we`ird") == "`we``ird`")
  }

  test("truncate is native TRUNCATE TABLE; cascade never applies") {
    assert(d.getTruncateQuery("db.t", Some(true)) == "TRUNCATE TABLE db.t")
    assert(d.isCascadingTruncateTable().contains(false))
  }

  test("delete builder emits the reference's ALTER TABLE … DELETE WHERE form") {
    // database/database.go:463-472: ALTER TABLE %s.%s DELETE %s
    assert(d.deleteWhereStatement("db.events", "toYYYYMMDD(ts)", 20240101) ==
      "ALTER TABLE db.events DELETE WHERE `toYYYYMMDD(ts)` = 20240101")
    assert(d.deleteWhereStatement("db.t", "part", null) ==
      "ALTER TABLE db.t DELETE WHERE `part` IS NULL")
  }

  test("delete builder escapes string partition values (no SQL splicing)") {
    assert(d.deleteWhereStatement("db.t", "k", "it's") ==
      """ALTER TABLE db.t DELETE WHERE `k` = 'it\'s'""")
    assert(d.deleteWhereStatement("db.t", "k", """back\slash""") ==
      """ALTER TABLE db.t DELETE WHERE `k` = 'back\\slash'""")
  }

  test("delete builder renders temporal values as CH literals") {
    assert(d.deleteWhereStatement("db.t", "d", java.sql.Date.valueOf("2024-06-01")) ==
      "ALTER TABLE db.t DELETE WHERE `d` = toDate('2024-06-01')")
    val ts = java.sql.Timestamp.valueOf("2024-06-01 10:30:00.123")
    assert(d.deleteWhereStatement("db.t", "ts", ts) ==
      "ALTER TABLE db.t DELETE WHERE `ts` = toDateTime64('2024-06-01 10:30:00.123', 6)")
  }

  test("deletePartition dispatches statement form on the URL (CH mutation vs ANSI DELETE)") {
    val ch = ClickHouseJdbc.Conn(host = "h", database = "db", table = "t")
    assert(ClickHouseJdbc.deleteStatementSql(ch, "grp", 3L) ==
      "ALTER TABLE db.t DELETE WHERE `grp` = 3")
    val derby = ch.copy(urlOverride = Some("jdbc:derby:memory:x"))
    assert(ClickHouseJdbc.deleteStatementSql(derby, "grp", 3L) ==
      "DELETE FROM db.t WHERE grp = ?") // bind parameter, not a literal
    assert(ClickHouseJdbc.deleteStatementSql(derby, "grp", null) ==
      "DELETE FROM db.t WHERE grp IS NULL")
  }
}
