package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.PercentileDigest
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.types._

/** Mergeable quantile-sketch STATE — the ClickHouse `quantileState` /
  * `quantileMerge` combinator pair (the AggregatingMergeTree state the
  * rollup store was still missing next to count/sum/min/max/uniq/argMax).
  *
  * Spark-first: the sketch IS Spark's own Greenwald-Khanna summary
  * (`QuantileSummaries`, the engine behind `percentile_approx`), so the
  * estimate contract is the proven one — a query at probability `p`
  * returns a value whose true rank is within `eps · N` of `p · N` — and
  * merging partials preserves it (the GK merge theorem the built-in
  * aggregate itself relies on across partitions). What Spark does NOT
  * expose is the state: `percentile_approx` always finishes to a value,
  * so an incremental store would have to re-scan raw history on every
  * ingest. [[QuantileSketchAgg]] splits the aggregate into the
  * CH-combinator shape instead:
  *
  *  - fold mode (`isMerge = false`): doubles in, serialized sketch out —
  *    `quantileState`, run once per ingest shard over its raw rows;
  *  - merge mode (`isMerge = true`): serialized sketches in, merged
  *    sketch out — `quantileMerge`'s state half, run at read/compact
  *    over O(states) rows, never O(raw rows);
  *  - [[QuantileSketchAggregate.estimate]] finishes a sketch to values —
  *    `quantileMerge`'s finish half.
  *
  * The on-wire bytes are this file's own format (eps, count, and the
  * (value, g, delta) tuple array — the full GK state), so persisted
  * stores do not depend on Spark's internal buffer encoding staying
  * stable across versions.
  *
  * Determinism note (mirrors the HLL state's contract, not the exact
  * states'): GK summaries are order-sensitive, so the merged sketch's
  * BYTES may differ run to run with shuffle arrival order — but every
  * outcome honours the same eps rank bound, which is what q164 gates.
  * 100 TB shape: a sketch is O(1/eps · log(eps·N)) ≈ KBs at eps 1e-4;
  * shard states stay constant-size however large the corpus grows. */
case class QuantileSketchAgg(
    child: Expression,
    eps: Double,
    isMerge: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PercentileDigest]
    with UnaryLike[Expression] {

  require(eps > 0 && eps < 1, s"relative error must be in (0, 1), got $eps")

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(eps)

  override def update(buffer: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) {
      if (isMerge) buffer.merge(
        QuantileSketchAggregate.fromBytes(v.asInstanceOf[Array[Byte]]))
      else buffer.add(v.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: PercentileDigest, other: PercentileDigest): PercentileDigest = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: PercentileDigest): Any =
    QuantileSketchAggregate.toBytes(buffer)

  override def serialize(buffer: PercentileDigest): Array[Byte] =
    QuantileSketchAggregate.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    QuantileSketchAggregate.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String =
    if (isMerge) "quantile_sketch_merge" else "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if isMerge => TypeCheckResult.TypeCheckSuccess
    case DoubleType if !isMerge => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ${if (isMerge) "binary sketch" else "double"} " +
        s"input, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

object QuantileSketchAggregate {

  /** `percentile_approx`'s default accuracy (10000) as a relative error. */
  val DefaultEps: Double = 1e-4

  /** Serialize a digest: eps, compressThreshold, count, then the GK
    * (value, g, delta) tuples — compressed first, as Spark's own
    * serializer does, so the state size honours the GK bound. */
  def toBytes(d: PercentileDigest): Array[Byte] = {
    val s0 = d.quantileSummaries
    val s = if (s0.compressed) s0 else s0.compress()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(s.relativeError)
    out.writeInt(s.compressThreshold)
    out.writeLong(s.count)
    val stats = s.sampled
    out.writeInt(stats.length)
    stats.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): PercentileDigest = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val eps = in.readDouble()
    val threshold = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val stats = Array.fill(n) {
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong())
    }
    new PercentileDigest(
      new QuantileSummaries(threshold, eps, stats, count, true))
  }

  /** `quantileState`: fold raw doubles into one serialized sketch. */
  def sketch(c: Column, eps: Double = DefaultEps): Column =
    toColumn(QuantileSketchAgg(toExpr(c), eps, isMerge = false).toAggregateExpression())

  /** The state half of `quantileMerge`: union serialized sketches. */
  def mergeSketches(c: Column, eps: Double = DefaultEps): Column =
    toColumn(QuantileSketchAgg(toExpr(c), eps, isMerge = true).toAggregateExpression())

  /** The finish half of `quantileMerge`: estimates at `ps`, as an
    * array<double> aligned with `ps`; null for an empty sketch. */
  def estimate(state: Column, ps: Seq[Double]): Column =
    toColumn(QuantileFromSketch(toExpr(state), ps))
}

/** Scalar finisher: serialized sketch → estimates at fixed probabilities.
  * Off the hot path by construction (one call per GROUP at read time, not
  * per corpus row), so CodegenFallback costs nothing measurable. */
case class QuantileFromSketch(child: Expression, ps: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
    s"probabilities must be in [0, 1], got $ps")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantile_from_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary sketch, got ${other.sql}")
  }

  override def nullSafeEval(bytes: Any): Any = {
    val d = QuantileSketchAggregate.fromBytes(bytes.asInstanceOf[Array[Byte]])
    if (d.quantileSummaries.count == 0L) null
    else new GenericArrayData(d.getPercentiles(ps.toArray).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): QuantileFromSketch =
    copy(child = newChild)
}
