package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Capped exact-distinct state — the ClickHouse `uniqUpTo(N)` combinator
  * pair (`uniqUpToState` / merge): exact distinct count while the
  * cardinality is ≤ N, the sentinel N+1 once it exceeds N. The state is
  * the distinct-value SET, capped at N+1 elements — once saturated,
  * nothing else is retained, so the state is O(N) however large the
  * corpus grows, and the COUNT is deterministic whatever
  * partition/merge order fed it (below the cap every value is kept;
  * at the cap the size pins to N+1 either way).
  *
  * This is the EXACT complement to the store's HLL state: dashboards
  * asking "distinct buyers, exact while small, '>1000' beyond" (the CH
  * use case) get a hard answer the 2%-error sketch cannot give, at a
  * bounded price the unbounded exact set cannot give. Same two-mode
  * shape as [[QuantileSketchAgg]]: fold mode takes raw values (long or
  * string), merge mode unions serialized states; N rides in the bytes
  * and a mismatch fails loudly (states of different caps do not merge
  * meaningfully). */
case class UniqUpToAgg(
    child: Expression,
    n: Int,
    isMerge: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashSet[Any]]
    with UnaryLike[Expression] {

  require(n >= 1, s"uniqUpTo needs N >= 1, got $n")

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  private def add(buffer: mutable.HashSet[Any], v: Any): Unit =
    if (buffer.size <= n) buffer.add(v) // cap at n+1 elements

  override def update(buffer: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) merge(buffer,
        UniqUpToAggregate.fromBytes(v.asInstanceOf[Array[Byte]], n))
      // normalise to JVM types with stable equality for the set
      else add(buffer, v match {
        case s: UTF8String => s.toString
        case x => x
      })
    }
    buffer
  }

  override def merge(buffer: mutable.HashSet[Any], other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.HashSet[Any]): Any =
    UniqUpToAggregate.toBytes(buffer, n)

  override def serialize(buffer: mutable.HashSet[Any]): Array[Byte] =
    UniqUpToAggregate.toBytes(buffer, n)

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] =
    UniqUpToAggregate.fromBytes(bytes, n)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (isMerge) "uniq_upto_merge" else "uniq_upto"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if isMerge => TypeCheckResult.TypeCheckSuccess
    case LongType | StringType if !isMerge => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ${if (isMerge) "binary state" else "bigint or string"} " +
        s"input, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): UniqUpToAgg =
    copy(child = newChild)
}

object UniqUpToAggregate {

  def toBytes(set: mutable.HashSet[Any], n: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    out.writeInt(set.size)
    set.foreach {
      case l: java.lang.Long => out.writeByte(0); out.writeLong(l)
      case l: Long => out.writeByte(0); out.writeLong(l)
      case s: String =>
        // length-prefixed raw UTF-8, not writeUTF: distinct values come
        // from arbitrary user columns and writeUTF throws past 64 KB
        val sb = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeByte(1); out.writeInt(sb.length); out.write(sb)
      case other => throw new IllegalStateException(
        s"uniqUpTo state holds unexpected ${other.getClass}")
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte], expectN: Int): mutable.HashSet[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    require(n == expectN,
      s"uniqUpTo cap mismatch: state has N=$n, aggregate expects N=$expectN " +
        "— states of different caps do not merge meaningfully")
    val buffer = mutable.HashSet.empty[Any]
    var k = in.readInt()
    while (k > 0) {
      in.readByte() match {
        case 0 => buffer.add(in.readLong())
        case 1 =>
          val sb = new Array[Byte](in.readInt())
          in.readFully(sb)
          buffer.add(new String(sb, java.nio.charset.StandardCharsets.UTF_8))
      }
      k -= 1
    }
    buffer
  }

  /** `uniqUpToState(n)`: fold raw values into one serialized capped set. */
  def state(c: Column, n: Int): Column =
    toColumn(UniqUpToAgg(toExpr(c), n, isMerge = false).toAggregateExpression())

  /** Union serialized states (same cap) into one. */
  def mergeStates(c: Column, n: Int): Column =
    toColumn(UniqUpToAgg(toExpr(c), n, isMerge = true).toAggregateExpression())

  /** Finish a state to the count: exact distinct while ≤ n, n+1 beyond. */
  def count(state: Column): Column =
    toColumn(UniqUpToCount(toExpr(state)))
}

/** Scalar finisher: serialized capped set → its size (the uniqUpTo
  * answer). Read-time only — one call per group row. */
case class UniqUpToCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "uniq_upto_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary state, got ${other.sql}")
  }

  override def nullSafeEval(bytes: Any): Any = {
    val in = new DataInputStream(
      new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
    in.readInt() // cap
    in.readInt().toLong // size was capped at n+1 during fold/merge
  }

  override protected def withNewChildInternal(newChild: Expression): UniqUpToCount =
    copy(child = newChild)
}
