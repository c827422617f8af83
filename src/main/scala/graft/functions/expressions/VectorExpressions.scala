package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over float-array embeddings.
  *
  * Bit-identical to the HOF formulation in [[graft.sim.Similarity]] (and to
  * the DuckDB oracle): every term is widened to double and accumulated in
  * index order, so dot/(|a||b|) reproduces the exact same IEEE result. One
  * fused pass computes dot product and both norms.
  */
object VectorExpressions {

  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      // include any tail of the longer vector in its own norm, matching the
      // HOF version (norm is over the full array; zip_with stops at min len)
      var j = n
      while (j < a.numElements()) { val x = a.getFloat(j).toDouble; na += x * x; j += 1 }
      j = n
      while (j < b.numElements()) { val y = b.getFloat(j).toDouble; nb += y * y; j += 1 }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
  def cosine(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpr(a), toExpr(b)))
}
