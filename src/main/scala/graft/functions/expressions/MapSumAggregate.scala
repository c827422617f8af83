package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Key-wise map sum — the ClickHouse `sumMap` / `sumMapState` aggregate
  * (the map-typed AggregatingMergeTree state: per group, a map whose
  * values are the per-key sums of the inputs' values). One class serves
  * both the CH combinator halves because key-wise long addition is
  * associative and commutative on maps: folding per-row single-entry
  * maps IS merging already-folded state maps, so the rollup store uses
  * the same aggregate at ingest (raw rows → shard state) and at
  * read/compact (shard states → merged map) — exactly like its
  * sum/min/max columns, unlike the HLL/GK sketches which need distinct
  * fold and merge modes.
  *
  * Values are expected in integer micro-units (the store's exact-sum
  * discipline — long addition is order-independent where double addition
  * is not), making the merged map bit-identical to a from-raw GROUP BY
  * however shards and partitions arrive. Null map VALUES are skipped
  * (they carry no mass); map keys are non-null by Spark's map contract —
  * callers building per-row entries from a nullable column must filter
  * or coalesce first. The result map is KEY-SORTED, so downstream
  * hashing/compare is deterministic.
  *
  * 100 TB shape: the state per group is O(distinct keys in the group)
  * — bounded by the key domain (event types, languages, status codes),
  * never by the row count; partial aggregation combines map-side, so the
  * shuffle carries one map per (task × group). */
case class MapSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def addAll(buffer: mutable.HashMap[String, Long], m: MapData): Unit = {
    val ks = m.keyArray()
    val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      if (!vs.isNullAt(i)) {
        val k = ks.getUTF8String(i).toString
        buffer.update(k, buffer.getOrElse(k, 0L) + vs.getLong(i))
      }
      i += 1
    }
  }

  override def update(
      buffer: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) addAll(buffer, v.asInstanceOf[MapData])
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, v) => buffer.update(k, buffer.getOrElse(k, 0L) + v) }
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(sorted.map(e => e._2: Any)))
  }

  // length-prefixed raw UTF-8, not writeUTF: map keys come from arbitrary
  // user columns and writeUTF throws past 64 KB of modified-UTF-8 — a
  // crash that would land mid-ingest, after the shard output committed
  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, v) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buffer = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buffer.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      n -= 1
    }
    buffer
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "map_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs map<string, bigint> input, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MapSumAgg =
    copy(child = newChild)
}

object MapSumAggregate {
  /** Key-wise sum of `map<string, bigint>` inputs (result key-sorted). */
  def sumMap(c: Column): Column =
    toColumn(MapSumAgg(toExpr(c)).toAggregateExpression())
}
