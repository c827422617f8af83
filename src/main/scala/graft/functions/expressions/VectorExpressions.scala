package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over float/double-array embeddings.
  *
  * Bit-identical to the HOF formulation in [[graft.sim.Similarity]] (and to
  * the DuckDB oracle): every term is widened to double and accumulated in
  * index order, so dot/(|a||b|) reproduces the exact same IEEE result. One
  * fused pass computes dot product and both norms, inside whole-stage
  * codegen (this sits in the inner loop of every ANN query).
  *
  * Null semantics match the HOF form exactly (property-tested in
  * VectorExpressionsSpec):
  *  - unequal lengths → null (zip_with null-pads the shorter array, so the
  *    HOF dot product is null)
  *  - any null element → null (null poisons the HOF sum)
  *  - zero norm (incl. empty arrays) → null (Spark's double division by
  *    zero yields null outside ANSI mode)
  */
object VectorExpressions {

  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"
    // null even for non-null inputs (ragged/zero-norm) — see scaladoc
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      val (aIsFloat, bIsFloat) = (elemType(left) == FloatType, elemType(right) == FloatType)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val denom = ctx.freshName("denom")
        val getA = CodeGenerator.getValue(a, elemType(left), i)
        val getB = CodeGenerator.getValue(b, elemType(right), i)
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    final double $x = (double) $getA;
           |    final double $y = (double) $getB;
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |  if (!${ev.isNull}) {
           |    final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |    if ($denom == 0.0) { ${ev.isNull} = true; }
           |    else { ${ev.value} = $dot / $denom; }
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
  def cosine(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpr(a), toExpr(b)))
}
