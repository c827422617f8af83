package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum aggregate over `array<long>` — the primitive
  * under embedding mean-pooling, per-class centroid accumulation, and
  * token-histogram merging.
  *
  * Without it, pooling a vector column needs `posexplode` + groupBy
  * (component, key): the shuffle carries |rows|·dim exploded rows. This
  * aggregate keeps ONE dim-length long array per group per task and
  * partial-aggregates map-side (ObjectHashAggregate), so the shuffle
  * carries one array per (task × group) — at 100 TB the volume is
  * O(tasks × groups × dim), independent of row count.
  *
  * Semantics (property-tested against the posexplode formulation):
  *  - exact integer addition, overflow = loud `ArithmeticException`
  *    (callers sum quantised doubles or counts; silent wraparound would
  *    poison a whole pool) — `Math.addExact`;
  *  - null array input rows are skipped (like `sum`), null ELEMENTS add 0;
  *  - ragged inputs: the buffer grows to the longest seen vector, shorter
  *    vectors are zero-padded (union-style pooling);
  *  - no non-null input → null result (like `sum` over an empty set).
  */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  // Array.empty = "no input seen": distinguishes a dead group (null result)
  // from a real all-zero sum of 0-length vectors (can't occur: growing to
  // the longest vector makes any real input non-empty unless ALL inputs
  // are zero-length arrays, which legitimately pools to an empty vector —
  // accepted corner: that also evals to null, documented above).
  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  private def grown(buffer: Array[Long], n: Int): Array[Long] =
    if (n <= buffer.length) buffer
    else java.util.Arrays.copyOf(buffer, n)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = grown(buffer, n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) b(i) = Math.addExact(b(i), arr.getLong(i))
        i += 1
      }
      b
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    val b = grown(buffer, other.length)
    var i = 0
    while (i < other.length) { b(i) = Math.addExact(b(i), other(i)); i += 1 }
    b
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(buffer.map(java.lang.Long.valueOf(_): Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint>, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
}

object VectorAggregates {
  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}

  /** Element-wise exact sum of an `array<long>` column per group. */
  def vectorSum(vec: Column): Column =
    toColumn(VectorSumAgg(toExpr(vec)).toAggregateExpression())
}
