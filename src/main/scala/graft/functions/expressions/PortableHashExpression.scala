package graft.functions.expressions

import java.math.RoundingMode
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused oracle-portable 60-bit row hash — the native form of
  * [[graft.fp.Fingerprint.portableRowHash]]'s builtin chain
  * `conv(substring(md5(concat_ws(, canonical(cols)…)), 1, 15), 16, 10)`.
  *
  * The builtin chain is correct but its cost is dominated by per-column
  * Catalyst casts (decimal → string renders through UTF8String, timestamps
  * through unix_micros + cast) plus the materialised concat_ws row string,
  * the md5 hex STRING, and conv's string parse — five string
  * allocations per row before any hashing. This expression streams each
  * column's canonical bytes straight into one reused MessageDigest and
  * reads the leading 60 bits off the raw digest bytes; the only per-row
  * allocations left are the digest output and the numeric render.
  *
  * Byte-for-byte the same canonical form as
  * [[graft.fp.Fingerprint.portableCanonical]] (property-tested against the
  * builtin chain, which stays as the executable spec and the DuckDB-mirror
  * reference — see graft.queries.PortableSql):
  *  - null (any type)      → 0x00 sentinel byte
  *  - string               → its UTF-8 bytes
  *  - integral / boolean   → ASCII of the Spark string cast
  *  - decimal              → Spark's `Decimal.toString` (= BigDecimal.toString)
  *  - timestamp / ntz      → epoch MICROS as ASCII digits (UTC session)
  *  - date                 → ISO yyyy-MM-dd
  *  - double / float       → try_cast → DECIMAL(38,6) rendering, HALF_UP,
  *                           overflow → null sentinel (Spark `Decimal(d)`
  *                           goes through BigDecimal.valueOf, replicated)
  * Columns are separated by 0x01 (concat_ws's separator; nulls never reach
  * concat_ws in the builtin chain because coalesce runs first).
  *
  * CodegenFallback is the right trade here, unlike the scalar-only variant
  * (see Dedup.portableHash's note): this expression REPLACES the whole
  * canonicalization projection rather than sitting at the end of one, so
  * nothing codegen-worthy is forced into interpreted mode around it.
  */
case class PortableRowHash60(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.nonEmpty, "portable row hash needs at least one column")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "portable_row_hash60"

  private val Sep = 1.toByte
  private val NullSentinel = 0.toByte

  @transient private lazy val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  @inline private def ascii(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8)

  override def eval(input: InternalRow): Any = {
    val d = md5.get()
    d.reset()
    var i = 0
    while (i < children.length) {
      if (i > 0) d.update(Sep)
      val c = children(i)
      val v = c.eval(input)
      if (v == null) d.update(NullSentinel)
      else c.dataType match {
        case StringType =>
          d.update(v.asInstanceOf[UTF8String].getBytes)
        case LongType | IntegerType | ShortType | ByteType |
            TimestampType | TimestampNTZType =>
          // timestamps eval to epoch micros (Long) — exactly unix_micros
          d.update(ascii(v.toString))
        case _: DecimalType =>
          d.update(ascii(v.asInstanceOf[Decimal].toString))
        case DoubleType =>
          updateDoubleAsDecimal(d, v.asInstanceOf[Double])
        case FloatType =>
          updateDoubleAsDecimal(d, v.asInstanceOf[Float].toDouble)
        case BooleanType =>
          d.update(ascii(if (v.asInstanceOf[Boolean]) "true" else "false"))
        case DateType =>
          d.update(ascii(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong).toString))
        case dt =>
          throw new IllegalStateException(
            s"portable_row_hash60: unsupported column type $dt — " +
              "extend the canonicalization (and its PortableSql mirror) first")
      }
      i += 1
    }
    val h = d.digest()
    // first 15 hex chars of the md5 == leading 60 bits of the digest
    var out = 0L
    var j = 0
    while (j < 15) {
      val nib = (h(j >> 1) >> (if ((j & 1) == 0) 4 else 0)) & 0xf
      out = (out << 4) | nib
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** Spark's `try_cast(DOUBLE AS DECIMAL(38,6)) CAST VARCHAR`: through
    * BigDecimal.valueOf (shortest-double-string semantics, like Spark's
    * Decimal(d)), HALF_UP to scale 6, null sentinel past precision 38. */
  private def updateDoubleAsDecimal(d: java.security.MessageDigest, x: Double): Unit = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) {
      d.update(NullSentinel)
    } else {
      val bd = java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
      if (bd.precision > 38) d.update(NullSentinel)
      else d.update(ascii(bd.toString))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PortableRowHash60 = copy(children = newChildren)
}

object PortableHashExpression {
  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
  /** Fused portable row hash over RAW (un-canonicalized) columns. */
  def portableRowHash60(cols: Seq[Column]): Column =
    toColumn(PortableRowHash60(cols.map(toExpr)))
}
