package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a bounded-state aggregate —
  * the token-frequency operator that survives 100 TB vocabulary
  * cardinality. An exact `groupBy(token).count()` must shuffle and
  * hold one row per DISTINCT token; a web-scale corpus has billions
  * (typos, urls, code identifiers), so the exact form's state is
  * unbounded. A Misra-Gries summary of `capacity` counters guarantees
  * every item's estimate is within N/capacity of its true count
  * (N = stream length) in O(capacity) memory, and summaries MERGE
  * with additive error (Agarwal et al., "Mergeable Summaries",
  * PODS'12) — exactly the shape Spark's partial aggregation needs:
  * map-side partials ship `capacity` counters per partition, never
  * the token stream.
  *
  * Estimates are LOWER bounds (counts may be under- but never
  * over-reported). When `capacity` ≥ the true distinct count no
  * decrement ever fires and the summary IS the exact count table —
  * the regime the DuckDB oracle checks (q56); the approximation
  * contract under adversarial cardinality is pinned by
  * FreqItemsSpec, including that any item with true count >
  * N/capacity is guaranteed present. In the approximate regime the
  * kept SET may depend on merge order (Spark's partial-merge order is
  * nondeterministic), but the bounds hold for every order — callers
  * wanting run-identical output must stay in the exact regime or
  * re-count the survivors exactly (the standard two-pass pattern).
  *
  * Output: `array<struct<item:string, count:bigint>>` sorted by
  * (count DESC, item ASC).
  */
case class FreqItemsAgg(
    itemChild: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqItemsBuffer] with ImplicitCastInputTypes {

  require(capacity >= 1, "capacity must be >= 1")

  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.AbstractType] =
    Seq(StringType)

  override def children: Seq[Expression] = Seq(itemChild)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_freq_items"

  override def createAggregationBuffer(): FreqItemsBuffer =
    new FreqItemsBuffer(capacity)

  override def update(buffer: FreqItemsBuffer, input: InternalRow): FreqItemsBuffer = {
    val v = itemChild.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: FreqItemsBuffer, other: FreqItemsBuffer): FreqItemsBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: FreqItemsBuffer): Any = {
    val entries = buffer.sortedEntries
    val out = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      out(i) = InternalRow(UTF8String.fromString(entries(i)._1), entries(i)._2)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: FreqItemsBuffer): Array[Byte] = {
    val entries = buffer.sortedEntries
    var bytes = 4
    val encoded = entries.map { case (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8); bytes += 4 + b.length + 8; (b, c)
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(encoded.length)
    encoded.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqItemsBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(itemChild = newChildren(0))
}

object FreqItemsAgg {
  import org.apache.spark.sql.graftbridge.{toColumn, toExpression}

  /** Aggregate Column: Misra-Gries summary of `item`, `capacity`
    * counters, sorted (count DESC, item ASC). */
  def freqItems(item: org.apache.spark.sql.Column, capacity: Int): org.apache.spark.sql.Column =
    toColumn(FreqItemsAgg(toExpression(item), capacity).toAggregateExpression())
}

/** Misra-Gries counter table. `add` handles both single increments
  * and weighted inserts (deserialized partials); overflow past
  * `capacity` distinct keys triggers the decrement step: subtract
  * the minimum surviving value so at least one key drops out —
  * the generalized (weighted) Misra-Gries reduction used for merges
  * in "Mergeable Summaries" §3.2, which preserves the
  * per-item error bound Σdecrements ≤ N/capacity. */
final class FreqItemsBuffer(val capacity: Int) {
  private val counts = new java.util.HashMap[String, java.lang.Long]()

  def add(item: String, weight: Long): Unit = {
    if (weight <= 0) return
    val cur = counts.get(item)
    if (cur != null) counts.put(item, java.lang.Long.valueOf(cur.longValue() + weight))
    else {
      counts.put(item, java.lang.Long.valueOf(weight))
      if (counts.size() > capacity) trim()
    }
  }

  def mergeFrom(other: FreqItemsBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey, e.getValue)
    }
  }

  /** Subtract the (capacity+1)-th largest count from every counter and
    * drop non-positive ones — leaves ≤ capacity keys in one pass. */
  private def trim(): Unit = {
    val values = new Array[Long](counts.size())
    var i = 0
    val vit = counts.values().iterator()
    while (vit.hasNext) { values(i) = vit.next(); i += 1 }
    java.util.Arrays.sort(values)
    // (capacity+1)-th largest = values[size - capacity - 1]
    val dec = values(values.length - capacity - 1)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue.longValue() - dec
      if (nv <= 0) it.remove() else e.setValue(java.lang.Long.valueOf(nv))
    }
  }

  def size: Int = counts.size()

  def get(item: String): Long = {
    val v = counts.get(item)
    if (v == null) 0L else v.longValue()
  }

  def sortedEntries: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size())
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }
}
