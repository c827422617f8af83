package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn (mod-10) checksum validation — the arbiter between "a 16-digit
  * number" and "a credit-card PAN" in PII detection. A digit-run regex
  * alone false-positives on order ids, tracking numbers, and timestamps;
  * every real PII pipeline (and PCI-DSS scanning generally) gates the
  * regex hit on the Luhn check, which random digit runs pass only ~10% of
  * the time.
  *
  * Native Catalyst expression, codegen'd as one static call (the
  * [[TextHashExpressions.SimHash64]] pattern): the projection it sits in
  * stays inside whole-stage codegen, and the per-row cost is a single
  * branch-free pass over the candidate's bytes — no UDF, no boxing.
  *
  * DuckDB oracle mirror (the q132 gate): the identical sum expressed with
  * list_transform/list_sum over the digit positions — integer arithmetic
  * on both sides, no portability hazard.
  */
object LuhnExpressions {

  /** True iff `s` is a non-empty all-digit string whose Luhn checksum is
    * 0 (doubling every second digit from the right, summing digits). */
  def luhnCompute(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return false
    var sum = 0
    var i = n - 1
    var double = false
    while (i >= 0) {
      val b = bytes(i)
      if (b < '0' || b > '9') return false
      var d = b - '0'
      if (double) {
        d *= 2
        if (d > 9) d -= 9
      }
      sum += d
      double = !double
      i -= 1
    }
    sum % 10 == 0
  }

  case class LuhnCheck(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "luhn_check"

    override def nullSafeEval(input: Any): Any =
      luhnCompute(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.expressions.LuhnExpressions.luhnCompute($c)")

    override protected def withNewChildInternal(c: Expression): LuhnCheck =
      copy(c)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}

  def luhnCheck(c: Column): Column = toColumn(LuhnCheck(toExpr(c)))
}
