package graft.pred

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-partition predicate construction — the reference's `GenerateWhere`
  * (`/root/reference/database/sidefunctions.go:194-236`) as a pure
  * `PartitionInfo => Column` function.
  *
  * Reference semantics reproduced:
  *  - DateTime/Date partition keys with known bounds → closed range
  *    `ts >= min AND ts <= max` (`sidefunctions.go:215-218`).
  *  - Epoch-sentinel bounds (the reference checks the literal string
  *    `'1970-01-01 03:00:00'` — epoch rendered in UTC+3! `sidefunctions.go:216`)
  *    disable range mode. We model "no bounds" as `None` instead of a magic
  *    timestamp — the intended semantics without the timezone landmine.
  *  - Other keys → equality `key = value` (`sidefunctions.go:219,222`),
  *    functional keys compared on the raw expression (`expr(raw) === v`).
  *  - Conjunction with AND (`sidefunctions.go:227-232`) — where the reference
  *    has a `tmp = +1` typo and nondeterministic Go-map ordering, `reduce`
  *    over an ordered Seq is correct by construction.
  *
  * Predicates built here land on partition/sort columns, so Catalyst turns
  * them into parquet row-group + partition pruning — at 100 TB each verify
  * or repair touches only the files of the partition in question.
  */
object PartitionPredicate {

  sealed trait KeyPred
  /** `expr(key) === value` */
  final case class Equals(key: String, value: Any) extends KeyPred
  /** `col(ts) between [min, max]`; either bound None → that side unbounded. */
  final case class TimeRange(key: String, min: Option[Timestamp], max: Option[Timestamp]) extends KeyPred

  /** Build the conjunction for one partition. Empty list → `lit(true)`
    * (whole-table, the reference's no-partition-key degenerate case). */
  def build(preds: Seq[KeyPred]): Column =
    preds.map(one).reduceOption(_ && _).getOrElse(lit(true))

  def one(p: KeyPred): Column = p match {
    case Equals(key, value) => expr(key) === lit(value)
    case TimeRange(key, min, max) =>
      val lo = min.map(col(key) >= lit(_))
      val hi = max.map(col(key) <= lit(_))
      (lo.toSeq ++ hi.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** The `use_virtual_column` mode (`/root/reference/copy/copy.go:207-211`,
    * `WHERE _part='name'`): Spark's per-file analogue is the metadata file
    * path. */
  def byFile(path: String): Column = col("_metadata.file_path") === lit(path)
}
