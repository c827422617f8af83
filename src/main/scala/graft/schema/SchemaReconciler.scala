package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functions

/** Schema reconciliation: the analysis phase of the reference's copy.
  *
  *  - Column intersection by name, in SOURCE order (outer loop is the source
  *    describe, `/root/reference/database/sidefunctions.go:78-97`).
  *  - Cast planning: for each common column whose types differ, pick a
  *    conversion expression from a total matrix
  *    (`/root/reference/database/sidefunctions.go:112-192`).
  *
  * Divergence from the reference (intentional, SURVEY §1.3): unknown type
  * pairs there are *silently dropped* from the projection
  * (`sidefunctions.go:153-154` etc.); our default raises
  * [[UnsupportedCastException]], with `CastPolicy.DropUnknown` available to
  * reproduce reference behaviour.
  *
  * All planning is pure `StructType` → `Seq[Column]` — zero Spark jobs; the
  * resulting projection is planned once and reused for every partition, as
  * the reference plans `destinationValues` once (`/root/reference/copy/copy.go:191-192`).
  */
object SchemaReconciler {

  final case class UnsupportedCastException(col: String, from: DataType, to: DataType)
    extends RuntimeException(s"no cast rule for column '$col': ${from.simpleString} -> ${to.simpleString}")

  sealed trait CastPolicy
  object CastPolicy {
    /** Engine default: unknown pair is an error. */
    case object Strict extends CastPolicy
    /** Reference-compatible: unknown pair drops the column (logged). */
    case object DropUnknown extends CastPolicy
  }

  /** Ordered name-intersection of two schemas (source order), pairing the
    * source field with the destination field it must become. */
  def intersect(src: StructType, dst: StructType): Seq[(StructField, StructField)] = {
    val byName = dst.fields.map(f => f.name -> f).toMap
    src.fields.toSeq.flatMap(s => byName.get(s.name).map(d => (s, d)))
  }

  /** Plan the copy projection: for each common column, a `Column` that reads
    * the source value and produces the destination type. This is the Spark
    * analogue of the reference's `destinationValues` cast-expression list;
    * the plain-name list (`values`) is just `plan.map(_._1)`.
    *
    * @return (columnName, castExpression) pairs in source order.
    */
  def castPlan(
      src: StructType,
      dst: StructType,
      policy: CastPolicy = CastPolicy.Strict): Seq[(String, Column)] =
    intersect(src, dst).flatMap { case (s, d) =>
      castRule(s.name, s.dataType, d.dataType) match {
        case Some(c) => Some(s.name -> c.as(s.name))
        case None => policy match {
          case CastPolicy.Strict => throw UnsupportedCastException(s.name, s.dataType, d.dataType)
          case CastPolicy.DropUnknown => None
        }
      }
    }

  /** ClickHouse wide-integer target mappings (`toUInt64`/`toInt128`/
    * `toInt256`, `/root/reference/database/sidefunctions.go:143-146`): Spark
    * has no unsigned or 128/256-bit integers, so
    *   - UInt64  → [[UInt64Type]] Decimal(20,0) — EXACT (max 1.8e19 is 20
    *     digits); round-trips the full unsigned range including values above
    *     2^63 that LongType cannot hold
    *   - Int128/Int256 → [[WideIntType]] Decimal(38,0) — LOSSY above 38
    *     digits (Spark's decimal ceiling; documented divergence, SURVEY §1.3)
    * Both are reached through the generic NumericType arm of [[castRule]];
    * the names exist so callers mapping a ClickHouse schema pick the
    * documented target. */
  val UInt64Type: DecimalType = DecimalType(20, 0)
  val WideIntType: DecimalType = DecimalType(38, 0)

  /** The cast matrix (SURVEY §1.3). Returns None for an unknown pair. */
  def castRule(name: String, from: DataType, to: DataType): Option[Column] = {
    val c = col(name)
    if (from == to) return Some(c)
    (from, to) match {
      // ---- numeric widenings / narrowings (toInt8/16/32/64, toUInt8/16/32:
      //      sidefunctions.go:136-146,165-170). Spark `cast` implements the
      //      same truncating semantics; unsigned targets widen to the next
      //      signed type (no unsigned types in Spark — SURVEY §1.3).
      case (_: NumericType, t: NumericType) => Some(c.cast(t))
      // ---- String → numeric / temporal (sidefunctions.go:125-150)
      case (StringType, t: NumericType) => Some(c.cast(t))
      case (StringType, DateType) => Some(to_date(c))
      case (StringType, TimestampType) => Some(to_timestamp(c))
      // TIMESTAMP_NTZ: what Spark 4 infers for parquet timestamps written
      // without UTC adjustment (the fixture tables) — ClickHouse DateTime is
      // likewise zone-naive, so NTZ is the faithful mapping.
      case (StringType, TimestampNTZType) => Some(to_timestamp_ntz(c))
      case (TimestampNTZType, StringType) => Some(date_format(c, "yyyy-MM-dd HH:mm:ss"))
      case (TimestampNTZType, DateType) => Some(c.cast(DateType))
      case (DateType, TimestampNTZType) => Some(c.cast(TimestampNTZType))
      case (TimestampNTZType, TimestampType) => Some(c.cast(TimestampType))
      case (TimestampType, TimestampNTZType) => Some(c.cast(TimestampNTZType))
      // ---- numeric/temporal → String: ClickHouse toString-equivalent
      case (_: NumericType, StringType) => Some(c.cast(StringType))
      case (DateType, StringType) => Some(date_format(c, "yyyy-MM-dd"))
      case (TimestampType, StringType) => Some(date_format(c, "yyyy-MM-dd HH:mm:ss"))
      // ---- temporal conversions (toDate/toDateTime, sidefunctions.go:147-150)
      case (TimestampType, DateType) => Some(c.cast(DateType))
      case (DateType, TimestampType) => Some(c.cast(TimestampType))
      case (LongType, TimestampType) => Some(timestamp_seconds(c)) // epoch secs
      case (TimestampType, LongType) => Some(unix_timestamp(c))
      // ---- boolean bridges
      case (BooleanType, _: NumericType) => Some(c.cast(to))
      case (_: NumericType, BooleanType) => Some(c.cast(BooleanType))
      // ---- binary/string
      case (BinaryType, StringType) => Some(c.cast(StringType))
      case (StringType, BinaryType) => Some(c.cast(BinaryType))
      // ---- arrays: element-wise recursion via transform (covers
      //      Array(String)→Array(LowCardinality(String)) passthrough class,
      //      sidefunctions.go:156-162, and any castable element pair)
      case (ArrayType(fe, _), ArrayType(te, _)) if fe == te => Some(c)
      case (ArrayType(_, _), ArrayType(te, _)) => Some(c.cast(ArrayType(te)))
      // ---- anything → String as JSON (toJSONString arm incl. default→JSON,
      //      sidefunctions.go:133-134,176-178)
      case (_: StructType | _: MapType | _: ArrayType, StringType) =>
        Some(Functions.toJsonString(c))
      case _ => None
    }
  }
}
