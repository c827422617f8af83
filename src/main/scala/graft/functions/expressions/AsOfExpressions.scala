package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native support for the broadcast as-of join's per-row pick.
  *
  * [[graft.operators.AsOfJoin.broadcastBackward]] holds each key's right
  * side as ONE ts-ascending array of structs and, per left row, needs "the
  * last element with ts <= leftTs". The composable formulation —
  * `element_at(filter(arr, e -> e.ts <= lt), size(filter(...)))` — is a
  * scale trap twice over: `filter` is a higher-order function (interpreted
  * lambda, no whole-stage codegen) that MATERIALISES a fresh candidate
  * array per left row, and every field reference re-evaluates it. That is
  * O(|history|) work and allocation per row — measured at the x10 scale
  * trend as a 55x blowup for 10x data (10x rows × 10x history per key).
  *
  * [[SortedAsOfPick]] replaces it with an O(log |history|) binary search
  * over the unmodified array, evaluated once, allocating nothing. Codegen
  * follows the compiled-method pattern of
  * [[TextHashExpressions.SimHash64]]: the generated projection stays in
  * whole-stage codegen and makes one primitive-typed call into the JIT'd
  * search — no boxing, no interpreted boundary, no giant generated Java.
  * 100 TB shape: per-left-row cost grows with log(history) — a reference
  * table whose keys accumulate years of ticks costs about the same as a
  * fresh one.
  */
object AsOfExpressions {

  /** `sorted_asof_pick(arr, ts)` — the LAST element of `arr` (an array of
    * structs, ascending by FIRST struct field) whose first field is
    * `<= ts`; null when none qualifies.
    *
    * Tie handling mirrors the sorted-array semantics: among equal
    * timestamps the array's later element (max payload under `sort_array`
    * struct ordering) wins — the same deterministic tiebreak the filter
    * formulation had. Elements whose first field is NULL sort first under
    * `sort_array` and never qualify (a null ts can't be "at or before" —
    * exactly how `<=` filtered them before); the search treats them as
    * -infinity and steps past them on the way back.
    */
  case class SortedAsOfPick(left: Expression, right: Expression)
      extends BinaryExpression {

    private def elemStruct: StructType =
      left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

    override def dataType: DataType = elemStruct
    override def nullable: Boolean = true
    override def prettyName: String = "sorted_asof_pick"

    override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
      case ArrayType(s: StructType, _) if s.nonEmpty =>
        val tsType = s.fields(0).dataType
        val orderable = tsType match {
          case TimestampType | TimestampNTZType | DateType | LongType |
               IntegerType | ShortType | ByteType | DoubleType | FloatType => true
          case _ => false
        }
        if (!orderable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: first struct field must be a primitive orderable " +
              s"type, got ${tsType.sql}")
        else if (right.dataType != tsType)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: ts argument type ${right.dataType.sql} must match " +
              s"the first struct field type ${tsType.sql}")
        else TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<struct<...>> input, got ${other.sql}")
    }

    private def tsType: DataType = elemStruct.fields(0).dataType

    /** every supported ts type compares as long or double */
    private def isFloating: Boolean = tsType match {
      case DoubleType | FloatType => true
      case _ => false
    }

    @transient private lazy val nF = elemStruct.size
    @transient private lazy val longAt: InternalRow => Long = tsType match {
      case IntegerType | DateType => r => r.getInt(0).toLong
      case ShortType => r => r.getShort(0).toLong
      case ByteType => r => r.getByte(0).toLong
      case _ => r => r.getLong(0) // long, timestamp(_ntz)
    }
    @transient private lazy val doubleAt: InternalRow => Double = tsType match {
      case FloatType => r => r.getFloat(0).toDouble
      case _ => r => r.getDouble(0)
    }

    /** called from generated code — integral/timestamp ts */
    def pickLong(arr: ArrayData, t: Long): InternalRow =
      pickImpl(arr, i => {
        val row = arr.getStruct(i, nF)
        row.isNullAt(0) || longAt(row) <= t
      })

    /** called from generated code — floating ts */
    def pickDouble(arr: ArrayData, t: Double): InternalRow =
      pickImpl(arr, i => {
        val row = arr.getStruct(i, nF)
        row.isNullAt(0) || doubleAt(row) <= t
      })

    /** binary search for the last qualifying index; null-element / null-ts
      * rows sort first (treated as -infinity) and are stepped past */
    private def pickImpl(arr: ArrayData, le: Int => Boolean): InternalRow = {
      var lo = 0
      var hi = arr.numElements() - 1
      var hit = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr.isNullAt(mid) || le(mid)) { hit = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      while (hit >= 0 &&
        (arr.isNullAt(hit) || arr.getStruct(hit, nF).isNullAt(0))) hit -= 1
      if (hit < 0) null else arr.getStruct(hit, nF)
    }

    override def nullSafeEval(arrAny: Any, tsAny: Any): Any = {
      val arr = arrAny.asInstanceOf[ArrayData]
      if (isFloating) pickDouble(arr, tsAny match {
        case f: java.lang.Float => f.toDouble
        case n => n.asInstanceOf[Number].doubleValue()
      })
      else pickLong(arr, tsAny.asInstanceOf[Number].longValue())
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (arr, ts) => {
        val ref = ctx.addReferenceObj("asofPick", this)
        val (method, cast) =
          if (isFloating) ("pickDouble", "(double)") else ("pickLong", "(long)")
        s"""
           |${ev.value} = $ref.$method($arr, $cast $ts);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Column-API wrapper. `arr` must be ascending by first struct field
    * (e.g. built with `sort_array(collect_list(struct(ts, ...)))`). */
  def sortedAsOfPick(arr: Column, ts: Column): Column =
    GraftColumnBridge.column(SortedAsOfPick(
      GraftColumnBridge.expression(arr), GraftColumnBridge.expression(ts)))
}
