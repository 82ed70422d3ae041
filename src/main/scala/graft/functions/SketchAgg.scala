package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Space-Saving heavy hitters (Metwally et al. 2005) as ONE typed
  * aggregate: the fixed-memory answer to "top keys by frequency" when
  * the key domain is unbounded — at most `capacity` (item, count,
  * error) counters regardless of input size. A tracked item increments
  * its counter; an untracked item evicts the minimum counter and
  * inherits its count as its ERROR bound. Guarantees (SketchSpec pins
  * them): est ≥ true, est − true ≤ err ≤ n/capacity, and every item
  * with true count > n/capacity is present in the summary.
  *
  * Distribution: TypedImperativeAggregate gives map-side partial
  * summaries per partition; merge unions the counter sets (shared
  * items sum; one-sided items take the absent FULL summary's min
  * counter as count and error — the mergeable-summaries rule, see
  * merge()) and truncates back to `capacity` by descending count, so
  * the shuffle carries ≤ capacity triples per partition, never the
  * key domain. Eviction scans the counter table for the minimum —
  * O(capacity) per untracked arrival; a production variant would keep
  * a min-heap, but capacity here is small enough that the scan is
  * cache-resident.
  *
  * eval emits the summary sorted (count desc, err asc, item asc) as
  * array<struct<item, est, err>>; when capacity ≥ distinct keys the
  * sketch never evicts, every err is 0 and the summary IS the exact
  * frequency table — the regime the oracle-checked driver key runs in.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Array[Long]]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def prettyName: String = "space_saving"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  type Buf = scala.collection.mutable.LongMap[Array[Long]] // item -> [count, err]

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.LongMap.empty[Array[Long]]

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      buf.get(item) match {
        case Some(ce) => ce(0) += 1
        case None =>
          if (buf.size < capacity) buf.update(item, Array(1L, 0L))
          else {
            // evict the minimum counter (ties: smallest item, so the
            // single-partition path is deterministic end to end)
            var minItem = 0L; var minCount = Long.MaxValue
            buf.foreach { case (it, c) =>
              if (c(0) < minCount || (c(0) == minCount && it < minItem)) {
                minCount = c(0); minItem = it
              }
            }
            buf.remove(minItem)
            buf.update(item, Array(minCount + 1L, minCount))
          }
      }
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    // The mergeable-summaries rule (Agarwal et al.): an item UNTRACKED
    // by a summary may still have occurred up to that summary's MIN
    // counter times (eviction absorbs small items into the min), so a
    // one-sided item takes the absent side's min as both count and
    // error. An under-capacity summary tracks everything it saw — its
    // absent-side contribution is 0. A plain zero-fill sum (the naive
    // merge) UNDERESTIMATES — caught by the PropertySpec random-stream
    // invariants before this rule was added.
    val minBuf =
      if (buf.size < capacity || buf.isEmpty) 0L
      else buf.values.map(_(0)).min
    val minOther =
      if (other.size < capacity || other.isEmpty) 0L
      else other.values.map(_(0)).min
    buf.foreach { case (item, mine) =>
      if (!other.contains(item)) { mine(0) += minOther; mine(1) += minOther }
    }
    other.foreach { case (item, ce) =>
      buf.get(item) match {
        case Some(mine) => mine(0) += ce(0); mine(1) += ce(1)
        case None => buf.update(item, Array(ce(0) + minBuf, ce(1) + minBuf))
      }
    }
    if (buf.size <= capacity) buf
    else {
      // truncate to the top-capacity counters (count desc, item asc)
      val keep = buf.toArray.sortBy { case (it, c) => (-c(0), it) }.take(capacity)
      val out = scala.collection.mutable.LongMap.empty[Array[Long]]
      keep.foreach { case (it, c) => out.update(it, c) }
      out
    }
  }

  override def eval(buf: Buf): Any = {
    val sorted = buf.toArray.sortBy { case (it, c) => (-c(0), c(1), it) }
    new GenericArrayData(sorted.map { case (it, c) =>
      new GenericInternalRow(Array[Any](it, c(0), c(1)))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 24 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (it, c) => bb.putLong(it); bb.putLong(c(0)); bb.putLong(c(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = scala.collection.mutable.LongMap.empty[Array[Long]]
    var i = 0
    while (i < n) {
      val it = bb.getLong(); val c = bb.getLong(); val e = bb.getLong()
      out.update(it, Array(c, e))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SketchFunctions {
  def spaceSaving(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingAgg(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
