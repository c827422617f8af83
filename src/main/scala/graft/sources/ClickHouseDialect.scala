package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** A real Spark [[JdbcDialect]] for ClickHouse (SURVEY §2A A2/A19).
  *
  * Spark's generic JDBC dialect mis-maps exactly the vocabulary the
  * reference's cast matrix speaks
  * (`/root/reference/database/sidefunctions.go:112-192`): unsigned ints
  * (`UInt8..UInt64`), `DateTime64`, `LowCardinality(String)`,
  * `Array(String)`, `IPv4/IPv6/UUID/JSON`. This dialect maps them both
  * directions:
  *
  *  - '''read''' ([[getCatalystType]]): the clickhouse-jdbc driver reports
  *    the native type name verbatim (possibly wrapped in `Nullable(…)` /
  *    `LowCardinality(…)`); we parse that name, because the generic
  *    `sqlType` int collapses e.g. `UInt64` to `BIGINT` and overflows half
  *    the range. Each unsigned width widens to the next signed Catalyst
  *    type; `UInt64` → `Decimal(20,0)` (the only lossless container).
  *  - '''write''' ([[getJDBCType]]): Catalyst types → ClickHouse DDL for
  *    `CREATE TABLE` through Spark's JDBC sink. Nullability is the writer's
  *    concern (Spark wraps via the field's nullable flag — ClickHouse needs
  *    it *inside* the type, so [[createTableColumnTypes]]-style callers use
  *    [[ClickHouseDialect.ddlType]]).
  *
  * Identifier quoting is backticks (ClickHouse follows MySQL here, not the
  * ANSI double quote the generic dialect emits). Partition deletes are
  * ClickHouse mutations — `ALTER TABLE db.t DELETE WHERE …`
  * (`/root/reference/database/database.go:463-472`), not ANSI `DELETE FROM`;
  * [[deleteWhereStatement]] builds that form and
  * [[ClickHouseJdbc.deletePartition]] dispatches on [[canHandle]].
  */
object ClickHouseDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:clickhouse:")

  /** Strip `Nullable(…)` / `LowCardinality(…)` wrappers (composable:
    * `Nullable(LowCardinality(String))` is legal CH). Returns
    * (bareType, wasNullable). */
  private[sources] def unwrap(typeName: String): (String, Boolean) = {
    val t = typeName.trim
    if (t.startsWith("Nullable(") && t.endsWith(")")) {
      val (inner, _) = unwrap(t.substring("Nullable(".length, t.length - 1))
      (inner, true)
    } else if (t.startsWith("LowCardinality(") && t.endsWith(")")) {
      val (inner, n) = unwrap(t.substring("LowCardinality(".length, t.length - 1))
      (inner, n)
    } else (t, false)
  }

  private val DecimalRe = """Decimal\((\d+),\s*(\d+)\)""".r
  private val DateTime64Re = """DateTime64\((\d+)(?:,\s*'[^']*')?\)""".r
  private val DateTimeTzRe = """DateTime\('[^']*'\)""".r
  private val FixedStringRe = """FixedString\((\d+)\)""".r
  private val ArrayRe = """Array\((.+)\)""".r
  private val EnumRe = """Enum(?:8|16)\(.*\)""".r

  /** Native CH type name → Catalyst type. Array element nullability follows
    * the element's own `Nullable(…)` wrapper. */
  private[sources] def catalystFor(bare: String): Option[DataType] = bare match {
    // unsigned widths widen to the next signed container; UInt64 has no
    // signed 64-bit container → Decimal(20,0) (max UInt64 = 1.8e19, 20 digits)
    case "UInt8" => Some(ShortType)
    case "UInt16" => Some(IntegerType)
    case "UInt32" => Some(LongType)
    case "UInt64" => Some(DecimalType(20, 0))
    case "UInt128" | "UInt256" | "Int128" | "Int256" => Some(DecimalType(38, 0))
    case "Int8" => Some(ByteType)
    case "Int16" => Some(ShortType)
    case "Int32" => Some(IntegerType)
    case "Int64" => Some(LongType)
    case "Float32" => Some(FloatType)
    case "Float64" => Some(DoubleType)
    case "Bool" => Some(BooleanType)
    case "String" => Some(StringType)
    case FixedStringRe(_) => Some(StringType)
    case "UUID" | "IPv4" | "IPv6" | "JSON" | "Object('json')" => Some(StringType)
    case EnumRe() => Some(StringType)
    case "Date" | "Date32" => Some(DateType)
    case "DateTime" => Some(TimestampType)
    case DateTimeTzRe() => Some(TimestampType)
    case DateTime64Re(_) => Some(TimestampType)
    case DecimalRe(p, s) => Some(DecimalType(p.toInt, s.toInt))
    case ArrayRe(el) =>
      val (bareEl, elNullable) = unwrap(el)
      catalystFor(bareEl).map(dt => ArrayType(dt, containsNull = elNullable))
    case _ => None
  }

  override def getCatalystType(
      sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = {
    val (bare, _) = unwrap(typeName)
    catalystFor(bare)
  }

  /** Catalyst → ClickHouse DDL type (CREATE TABLE column types). The
    * `jdbcNullType` is what Spark's writer passes to `setNull`. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case ByteType => Some(JdbcType("Int8", Types.TINYINT))
    case ShortType => Some(JdbcType("Int16", Types.SMALLINT))
    case IntegerType => Some(JdbcType("Int32", Types.INTEGER))
    case LongType => Some(JdbcType("Int64", Types.BIGINT))
    case FloatType => Some(JdbcType("Float32", Types.FLOAT))
    case DoubleType => Some(JdbcType("Float64", Types.DOUBLE))
    case BooleanType => Some(JdbcType("Bool", Types.BOOLEAN))
    case StringType => Some(JdbcType("String", Types.VARCHAR))
    // CH has no BLOB; String is byte-transparent (the driver writes bytes)
    case BinaryType => Some(JdbcType("String", Types.BINARY))
    case DateType => Some(JdbcType("Date32", Types.DATE))
    // micros precision = Catalyst's TimestampType resolution
    case TimestampType => Some(JdbcType("DateTime64(6)", Types.TIMESTAMP))
    case t: DecimalType =>
      Some(JdbcType(s"Decimal(${t.precision},${t.scale})", Types.DECIMAL))
    case ArrayType(el, containsNull) =>
      getJDBCType(el).map { inner =>
        val elDdl = if (containsNull) s"Nullable(${inner.databaseTypeDefinition})"
                    else inner.databaseTypeDefinition
        JdbcType(s"Array($elDdl)", Types.ARRAY)
      }
    case _ => None
  }

  /** Full DDL type for a field, with ClickHouse-style nullability INSIDE
    * the type (`Nullable(Int64)`, never `Int64 NULL`). Arrays cannot be
    * `Nullable` at the top level in CH — nullability pushes to the element
    * (already handled in [[getJDBCType]]). */
  def ddlType(field: StructField): String = {
    val base = getJDBCType(field.dataType)
      .map(_.databaseTypeDefinition)
      .getOrElse(throw new IllegalArgumentException(
        s"no ClickHouse type for Catalyst ${field.dataType.catalogString}"))
    field.dataType match {
      case _: ArrayType => base
      case _ if field.nullable => s"Nullable($base)"
      case _ => base
    }
  }

  /** ClickHouse quotes identifiers with backticks (MySQL-style). */
  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  override def getTableExistsQuery(table: String): String =
    s"SELECT 1 FROM $table WHERE 1=0"

  override def getSchemaQuery(table: String): String =
    s"SELECT * FROM $table WHERE 1=0"

  /** TRUNCATE is native in CH; the generic DELETE FROM fallback is a
    * full-table mutation (slow, async). */
  override def getTruncateQuery(
      table: String, cascade: Option[Boolean]): String =
    s"TRUNCATE TABLE $table"

  /** CH never cascades truncates (no FK machinery at all). */
  override def isCascadingTruncateTable(): Option[Boolean] = Some(false)

  /** SQL literal for a partition value in a mutation WHERE. Strings escape
    * by doubling quotes AND backslashes (CH string literals are
    * backslash-escaping, unlike ANSI); temporal values render as CH
    * literals. Partition values come from data — they must never splice
    * into SQL text unescaped. */
  private[sources] def literal(value: Any): String = value match {
    case null => "NULL"
    case s: String =>
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case d: java.sql.Date => s"toDate('$d')"
    case t: java.sql.Timestamp =>
      // CH DateTime64 literal: 'YYYY-MM-DD hh:mm:ss.ffffff'
      val s = t.toString // java renders exactly this shape
      s"toDateTime64('$s', 6)"
    case b: Boolean => if (b) "true" else "false"
    case n: Number => n.toString
    case other => throw new IllegalArgumentException(
      s"unsupported partition literal type: ${other.getClass.getName}")
  }

  /** The reference's partition delete, verbatim shape:
    * `ALTER TABLE db.t DELETE WHERE col = value`
    * (`/root/reference/database/database.go:463-472` formats
    * `ALTER TABLE %s.%s DELETE %s` with a `GenerateWhere` clause). CH
    * mutations do not accept bind parameters in older driver/server
    * combinations, so the value is compiled to an escaped literal. */
  def deleteWhereStatement(dbtable: String, column: String, value: Any): String = {
    val where =
      if (value == null) s"${quoteIdentifier(column)} IS NULL"
      else s"${quoteIdentifier(column)} = ${literal(value)}"
    s"ALTER TABLE $dbtable DELETE WHERE $where"
  }

  /** Idempotent global registration: after this, every `spark.read.jdbc`
    * against a `jdbc:clickhouse:` URL resolves this dialect. Spark keeps a
    * list (latest registration wins on ties), so re-registering the same
    * singleton is harmless but we still guard for clarity. */
  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) {
      JdbcDialects.registerDialect(this)
      registered = true
    }
  }
}
