package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, CodegenFallback, ExprCode}
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

  /** Sign-bit random-hyperplane LSH signature, bit-identical to the HOF
    * formulation in [[graft.sim.Similarity.lshSignatureHof]] (parity
    * property-tested): component j of plane p weighs
    * `xxhash64(p, j) / Long.MaxValue`, the dot product accumulates in
    * index order as double, bit p is set when the projection is >= 0.
    * One imperative pass replaces planes × dim interpreted HOF lambda
    * invocations per row — this is the corpus-side inner loop of every
    * LSH ANN/dedup query. HOF edge semantics preserved: any null element
    * nulls every projection (→ signature 0), empty vectors → 0. */
  case class RandomHyperplaneSignature(child: Expression, planes: Int)
      extends UnaryExpression with CodegenFallback {
    require(planes >= 1 && planes <= 64, s"planes must be in [1, 64], got $planes")
    override def dataType: DataType = LongType
    override def prettyName: String = "lsh_signature"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${other.sql}")
    }

    // xxhash64's fold state after hashing plane index p with the fixed seed
    private lazy val planeSeeds: Array[Long] =
      Array.tabulate(planes)(p => XxHash64Function.hash(p, IntegerType, 42L))
    private lazy val isFloat =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    // plane weights depend only on (p, j) — cache the matrix instead of
    // re-hashing planes × dim per ROW (that would be most of the per-row
    // cost). Grown to the largest dimension seen; whole-outer-array swap
    // through the volatile for safe publication across tasks.
    @transient @volatile private var weightCache: Array[Array[Double]] = _
    private def weightRow(p: Int, dim: Int): Array[Double] = {
      val c0 = weightCache
      if (c0 != null && c0(p).length >= dim) return c0(p)
      synchronized {
        val c1 =
          if (weightCache == null) Array.fill(planes)(Array.emptyDoubleArray)
          else weightCache.clone()
        if (c1(p).length < dim)
          c1(p) = Array.tabulate(dim)(j =>
            XxHash64Function.hash(j, IntegerType, planeSeeds(p)).toDouble /
              Long.MaxValue.toDouble)
        weightCache = c1
        c1(p)
      }
    }

    // HOF parity for null input: a NULL vector yields null projections,
    // and when(null >= 0, m).otherwise(0) ORs to 0 — never SQL NULL
    override def nullable: Boolean = false
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) 0L else nullSafeEval(v)
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (n == 0) return 0L // HOF: null-padded zip -> null projections -> 0
      var sig = 0L
      var p = 0
      while (p < planes) {
        val w = weightRow(p, n)
        var dot = 0.0
        var j = 0
        var poisoned = false
        while (j < n && !poisoned) {
          if (arr.isNullAt(j)) poisoned = true
          else {
            val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
            dot += x * w(j)
          }
          j += 1
        }
        // Spark's double ordering treats NaN as larger than any value, so
        // the HOF's `proj >= 0` is TRUE for a NaN projection — mirror it
        if (!poisoned && (dot >= 0 || java.lang.Double.isNaN(dot))) sig |= 1L << p
        p += 1
      }
      sig
    }

    override protected def withNewChildInternal(c: Expression): RandomHyperplaneSignature =
      copy(child = c)
  }

  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
  def cosine(a: Column, b: Column): Column =
    toColumn(CosineSimilarity(toExpr(a), toExpr(b)))
  def lshSignature(vec: Column, planes: Int): Column =
    toColumn(RandomHyperplaneSignature(toExpr(vec), planes))
}
