package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions the reference applies during schema-mapped copy — the
  * ClickHouse cast vocabulary of `ReturnDestValues`
  * (`/root/reference/database/sidefunctions.go:112-192`) re-expressed as
  * *composed Spark builtins* so every one of them stays inside whole-stage
  * codegen (no UDF / no codegen fence in the 100 TB hot path).
  */
object Functions {

  private val UuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
  val ZeroUuid = "00000000-0000-0000-0000-000000000000"

  /** ClickHouse `toUUIDOrZero` (`/root/reference/database/sidefunctions.go:131-132`):
    * invalid input yields the zero UUID, never an error. Output lowercased
    * (canonical form). Null input → zero UUID, matching the OrZero contract. */
  def uuidOrZero(c: Column): Column =
    when(c.isNotNull && c.rlike(UuidRe), lower(c)).otherwise(lit(ZeroUuid))

  private val Ipv4Re = "^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$"

  /** ClickHouse `toIPv4` (`/root/reference/database/sidefunctions.go:127-128`)
    * stores dotted-quad as UInt32; we expose the numeric form as a signed
    * Long (0..2^32-1 fits losslessly). Invalid / out-of-range octet → null
    * (Spark idiom; an `OrZero` variant is `coalesce(ipv4ToLong(c), lit(0L))`). */
  def ipv4ToLong(c: Column): Column = {
    val o = (i: Int) => regexp_extract(c, Ipv4Re, i).cast("long")
    val valid = c.isNotNull && c.rlike(Ipv4Re) &&
      o(1) <= 255 && o(2) <= 255 && o(3) <= 255 && o(4) <= 255
    when(valid, o(1) * 16777216L + o(2) * 65536L + o(3) * 256L + o(4))
  }

  /** Inverse of [[ipv4ToLong]]: canonical dotted-quad from a numeric IPv4.
    * Null-in → null-out (concat_ws alone would collapse nulls to ""). */
  def longToIpv4(c: Column): Column =
    when(c.isNotNull, concat_ws(".",
      (c / 16777216L).cast("long") % 256L,
      (c / 65536L).cast("long") % 256L,
      (c / 256L).cast("long") % 256L,
      c.cast("long") % 256L))

  /** Canonical dotted-quad (parse + re-emit), null when invalid — the
    * round-trip ClickHouse `toIPv4` gives when re-rendered. */
  def ipv4Canonical(c: Column): Column = longToIpv4(ipv4ToLong(c))

  /** ClickHouse `toIPv6` (`/root/reference/database/sidefunctions.go:129-130`).
    * Canonicalisation (RFC 5952 zero-compression) needs real parsing — this
    * is the one cast kept as a UDF (cold path: only used when a column's
    * declared types differ across sides). Invalid → null. */
  val ipv6Canonical: Column => Column = {
    val f = udf { (s: String) =>
      if (s == null) None
      else {
        // Guard with a charset check so InetAddress never does a DNS lookup.
        val ok = s.nonEmpty && s.forall(ch => ch == ':' || ch == '.' ||
          (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')) &&
          s.contains(':')
        if (!ok) None
        else
          try {
            val addr = java.net.InetAddress.getByName(s)
            addr match {
              case v6: java.net.Inet6Address =>
                // RFC 5952: lowercase hex, longest zero-run compressed.
                val bs = v6.getAddress
                val groups = (0 until 8).map(i => ((bs(2 * i) & 0xff) << 8) | (bs(2 * i + 1) & 0xff))
                // find longest run of zero groups (len >= 2)
                var bestStart = -1; var bestLen = 0; var i = 0
                while (i < 8) {
                  if (groups(i) == 0) {
                    var j = i; while (j < 8 && groups(j) == 0) j += 1
                    if (j - i > bestLen) { bestLen = j - i; bestStart = i }
                    i = j
                  } else i += 1
                }
                val hex = groups.map(g => Integer.toHexString(g))
                val out =
                  if (bestLen >= 2) {
                    val pre = hex.take(bestStart).mkString(":")
                    val post = hex.drop(bestStart + bestLen).mkString(":")
                    s"$pre::$post"
                  } else hex.mkString(":")
                Some(out)
              case v4: java.net.Inet4Address =>
                // "::ffff:a.b.c.d" style input parsed down to v4
                Some("::ffff:" + v4.getHostAddress)
              case _ => None
            }
          } catch { case _: Exception => None }
      }
    }
    (c: Column) => f(c)
  }

  /** ClickHouse `toJSONString` (`/root/reference/database/sidefunctions.go:133-134,176-178`):
    * serialise any column to its BARE JSON text — `toJSONString([1,2])` is
    * `[1,2]`, `toJSONString('a')` is `"a"`, exactly what a ClickHouse-written
    * destination string column would contain (fingerprint parity on the B18
    * source-cast side). Implemented as `to_json` of a one-field struct with
    * the `{"v":` wrapper stripped, which JSON-escapes every type uniformly;
    * `ignoreNullFields=false` keeps nulls as the literal `null`. */
  def toJsonString(c: Column): Column = {
    val wrapped = to_json(struct(c.as("v")),
      java.util.Map.of("ignoreNullFields", "false"))
    // `{"v":X}` → X: positions 6 .. len-1
    wrapped.substr(lit(6), length(wrapped) - 6)
  }

  /** ClickHouse `formatReadableSize` (`/root/reference/database/database.go:400,405`):
    * human-readable 1024-based size with two decimals, e.g. "1.00 MiB".
    * Pure builtins (when-chain + format_string) → codegen-friendly and
    * mirrorable in ANSI SQL for the oracle. */
  def formatReadableSize(c: Column): Column = {
    val b = c.cast("double")
    def fmt(div: Double, unit: String) =
      format_string(s"%.2f $unit", b / lit(div))
    when(b < 1024d, fmt(1d, "B"))
      .when(b < 1024d * 1024, fmt(1024d, "KiB"))
      .when(b < 1024d * 1024 * 1024, fmt(1024d * 1024, "MiB"))
      .when(b < 1024d * 1024 * 1024 * 1024, fmt(1024d * 1024 * 1024, "GiB"))
      .otherwise(fmt(1024d * 1024 * 1024 * 1024, "TiB"))
  }
}
