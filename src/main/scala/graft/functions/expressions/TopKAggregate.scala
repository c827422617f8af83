package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k partial aggregate — the scale-correct replacement for
  * `row_number().over(Window.partitionBy(queryId))` top-k.
  *
  * A window top-k shuffles EVERY input row into #groups partitions (with 8
  * ANN queries that is 8 reducers swallowing the whole scored corpus). This
  * aggregate instead keeps a k-bounded heap per group per task, so partial
  * aggregation (ObjectHashAggregate) sends at most k rows per (task × group)
  * across the shuffle, and the final merge keeps the global k. At 100 TB the
  * shuffle volume is O(tasks × k), independent of corpus size.
  *
  * Input is a struct whose FIRST field is the score (double or long); the
  * result array is sorted score-DESC, remaining fields ASC (the usual
  * `desc(score), id` tiebreak) — so `posexplode` + `pos+1` reproduces
  * `row_number()` exactly. For double scores NaN sorts above all values
  * and -0.0 below 0.0, matching Spark's sort semantics. Long scores
  * compare as integers — quantised-score rankers (BM25's `score_u`)
  * sort on the long DIRECTLY: routing a long through a double key silently
  * collapses distinct values above 2^53 (a df=1 BM25 term's quantised
  * odds-idf is ~2.2e6·N, crossing 2^53 near N≈4e9 docs — within the 100 TB
  * design envelope), which would tie-break by doc_id differently than an
  * integer-ordered oracle.
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
    with UnaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  private lazy val childType = child.dataType.asInstanceOf[StructType]
  private lazy val fieldTypes = childType.fields.map(_.dataType).toSeq
  // Ascending natural ordering over the whole struct; only consulted when
  // the scores compare equal under Double.compare, so field 0 is a no-op
  // there and the remaining fields break the tie ascending.
  private lazy val tieOrdering = RowOrdering.createNaturalAscendingOrdering(fieldTypes)

  private lazy val scoreIsLong = childType.head.dataType == LongType

  /** Negative iff `a` ranks before (better than) `b`: score DESC, rest ASC. */
  private def rank(a: InternalRow, b: InternalRow): Int = {
    val c0 =
      if (scoreIsLong) java.lang.Long.compare(b.getLong(0), a.getLong(0))
      else java.lang.Double.compare(b.getDouble(0), a.getDouble(0))
    if (c0 != 0) c0 else tieOrdering.compare(a, b)
  }

  // PriorityQueue dequeues its GREATEST element; make "greatest" = "worst
  // kept row" so the head is the eviction candidate.
  private lazy val worstFirst: Ordering[InternalRow] = (a, b) => rank(a, b)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buffer: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input).asInstanceOf[InternalRow]
    if (v != null) {
      if (buffer.size < k) buffer.enqueue(v.copy())
      else if (rank(v, buffer.head) < 0) { buffer.dequeue(); buffer.enqueue(v.copy()) }
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { v =>
      if (buffer.size < k) buffer.enqueue(v)
      else if (rank(v, buffer.head) < 0) { buffer.dequeue(); buffer.enqueue(v) }
    }
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[InternalRow]): Any =
    // dequeueAll yields worst-first; reverse for rank order 1..k
    new GenericArrayData(buffer.dequeueAll.reverse.toArray[Any])

  private lazy val rowProjection = UnsafeProjection.create(fieldTypes.toArray)

  override def serialize(buffer: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { row =>
      val unsafe = rowProjection(row)
      out.writeInt(unsafe.getSizeInBytes)
      out.write(unsafe.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val q = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val rowBytes = new Array[Byte](size)
      in.readFully(rowBytes)
      val row = new UnsafeRow(fieldTypes.length)
      row.pointTo(rowBytes, size)
      q.enqueue(row)
      i += 1
    }
    q
  }

  override def dataType: DataType = ArrayType(childType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType if s.nonEmpty &&
          (s.head.dataType == DoubleType || s.head.dataType == LongType) &&
          RowOrdering.isOrderable(s) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a struct with a leading double or long score, got ${other.sql}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopK =
    copy(child = newChild)
}

object TopKAggregate {
  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}

  /** Aggregate a group's rows into its top-k array: `sortStruct` must put
    * the (double) score first; result sorts score DESC then remaining
    * fields ASC. */
  def topK(sortStruct: Column, k: Int): Column =
    toColumn(BoundedTopK(toExpr(sortStruct), k).toAggregateExpression())
}
