package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Top-`topN` nearest centroids for one vector, in a single bounded pass —
  * the IVF assignment kernel of [[graft.sim.Similarity]].
  *
  * Replaces the HOF formulation (`transform` scoring every centroid into a
  * struct + `array_sort` with an interpreted comparator + `slice`): that
  * shape allocates C structs and pays O(C log C) comparator lambda
  * invocations PER CORPUS ROW, which is free at the C≤256 of the gate
  * queries but becomes the assignment bottleneck at the C≈10k-65k a 100 TB
  * IVF index wants. Here each row does one fused C × dim multiply loop with
  * an insertion-bounded selection of size topN (topN=1, the corpus
  * assignment case, degenerates to a running argmax) — no per-centroid
  * struct allocation, no sort.
  *
  * Ordering parity with the HOF comparator: similarity DESC with
  * `java.lang.Double.compare` semantics (NaN sorts as the LARGEST
  * similarity, exactly like Catalyst's double ordering in the `when`
  * comparator), ties broken by centroid id ASC via the id type's
  * interpreted ordering. Null similarities (ragged/null/zero-norm vectors —
  * the [[VectorExpressions.CosineSimilarity]] null cases) sort LAST, among
  * themselves by id ASC; a null input vector nulls every similarity, so the
  * result is the topN smallest centroid ids with null sims (the HOF form's
  * behavior, which also reduces to pure id ordering). A null centroid
  * array returns null.
  *
  * Output: `array<struct<sim: double, centroid_id: id-type>>`, length
  * min(topN, C) — the exact shape the HOF `slice` produced, so callers
  * explode it unchanged.
  */
case class NearestCentroids(left: Expression, right: Expression, topN: Int)
    extends BinaryExpression with CodegenFallback {
  require(topN >= 1, s"topN must be >= 1, got $topN")

  override def prettyName: String = "nearest_centroids"

  private def centsStruct: StructType = right.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val idField = centsStruct.fieldIndex("centroid_id")
  private lazy val vecField = centsStruct.fieldIndex("centroid_vec")
  private lazy val idType = centsStruct(idField).dataType
  private lazy val centElemFloat = centsStruct(vecField).dataType
    .asInstanceOf[ArrayType].elementType == FloatType
  private lazy val vecElemFloat = left.dataType
    .asInstanceOf[ArrayType].elementType == FloatType
  private lazy val idOrdering = TypeUtils.getInterpretedOrdering(idType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sim", DoubleType, nullable = true),
    StructField("centroid_id", idType,
      nullable = centsStruct(idField).nullable))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    right.dataType match {
      case ArrayType(s: StructType, _)
          if s.fieldNames.contains("centroid_id") &&
             s.fieldNames.contains("centroid_vec") &&
             vecOk(s(s.fieldIndex("centroid_vec")).dataType) =>
        if (vecOk(left.dataType)) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float|double> vector, got ${left.dataType.sql}")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<struct<centroid_id, centroid_vec: array<float|double>>> " +
          s"centroids, got ${other.sql}")
    }
  }

  // vec=null is NOT short-circuited (it means "all sims null"); cents=null is
  override def nullable: Boolean = right.nullable
  override def eval(input: InternalRow): Any = {
    val cents = right.eval(input)
    if (cents == null) null
    else select(left.eval(input).asInstanceOf[ArrayData], cents.asInstanceOf[ArrayData])
  }

  /** Fused cosine, null on ragged length / null element / zero norm —
    * the [[VectorExpressions.CosineSimilarity]] contract. Returns NaN-able
    * primitive with a boxed-null channel via `Double.NaN` sentinel being
    * impossible: genuine NaN sims are legal, so nulls are signalled by the
    * parallel `simNull` flag instead. */
  private def cosineOrNull(vec: ArrayData, cvec: ArrayData): java.lang.Double = {
    if (vec == null || cvec == null) return null
    val n = vec.numElements()
    if (n != cvec.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i) || cvec.isNullAt(i)) return null
      val x = if (vecElemFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      val y = if (centElemFloat) cvec.getFloat(i).toDouble else cvec.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  /** a strictly better than b? sim DESC (null last, NaN first — Double
    * .compare semantics), then id ASC. */
  private def better(simA: java.lang.Double, idA: Any,
                     simB: java.lang.Double, idB: Any): Boolean = {
    val bySim =
      if (simA == null && simB == null) 0
      else if (simA == null) 1 // null sim sorts last
      else if (simB == null) -1
      else -java.lang.Double.compare(simA, simB) // DESC, NaN largest-first
    if (bySim != 0) bySim < 0
    else idOrdering.compare(idA.asInstanceOf[AnyRef], idB.asInstanceOf[AnyRef]) < 0
  }

  private def select(vec: ArrayData, cents: ArrayData): GenericArrayData = {
    val c = cents.numElements()
    val k = math.min(topN, c)
    // insertion-bounded selection: tiny k (1 for assignment, nProbe for
    // queries), so shift-on-insert beats any heap; the common case is a
    // single compare against the current worst and no insert at all
    val sims = new Array[java.lang.Double](k)
    val ids = new Array[Any](k)
    var filled = 0
    var ci = 0
    while (ci < c) {
      // array-of-struct entries are never null here (collect_list output)
      val row = cents.getStruct(ci, centsStruct.length)
      val cvec = if (row.isNullAt(vecField)) null
                 else row.getArray(vecField)
      val sim = cosineOrNull(vec, cvec)
      val id = InternalRow.copyValue(row.get(idField, idType))
      if (filled < k || better(sim, id, sims(filled - 1), ids(filled - 1))) {
        var pos = if (filled < k) filled else k - 1
        while (pos > 0 && better(sim, id, sims(pos - 1), ids(pos - 1))) {
          sims(pos) = sims(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
        }
        sims(pos) = sim; ids(pos) = id
        if (filled < k) filled += 1
      }
      ci += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = new GenericInternalRow(Array[Any](sims(i), ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NearestCentroids {
  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
  def apply(vec: Column, cents: Column, topN: Int): Column =
    toColumn(NearestCentroids(toExpr(vec), toExpr(cents), topN))
}
