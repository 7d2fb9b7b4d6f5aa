package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap "top k rows per group" aggregate.
  *
  * The declarative alternative — window `row_number()` + filter —
  * must shuffle and sort EVERY row of a group; this aggregate's
  * partial (map-side) state is a k-element heap, so the shuffle
  * carries at most k rows per group per input partition and the merge
  * is k·log k. At 100 TB "top 3 per key" that is the difference
  * between a full-data sort and a near-map-only job.
  *
  * Ranking contract: rows with larger `ord` win; ties prefer the
  * smaller `id` (total order ⇒ deterministic result). Input is
  * `struct(ord: double, id: long)`; output is the array of winners,
  * best first.
  *
  * `kExpr` must be an integer literal: keeping k as a *child* (rather
  * than a constructor scalar) makes the aggregate print as
  * `topk_rows(struct(…), k)`, so SqlGen round-trips it through the
  * registered SQL function.
  */
case class TopKRows(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  val k: Int = kExpr match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"topk_rows: k must be an integer literal, got $other")
  }
  require(k >= 1, "k must be positive")

  // min-heap on the ranking order: the head is the currently-worst
  // kept row, evicted when something better arrives
  private def heapOrdering: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (ord, id) => (-ord, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrdering)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else {
      val worst = buf.head
      // better = larger ord, or same ord with smaller id
      if (e._1 > worst._1 || (e._1 == worst._1 && e._2 < worst._2)) {
        buf.dequeue(); buf.enqueue(e)
      }
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    // null ord/id are skipped like every SQL aggregate skips nulls —
    // getDouble on a null slot would silently rank the row at 0.0
    if (row != null && !row.isNullAt(0) && !row.isNullAt(1))
      offer(buf, (row.getDouble(0), row.getLong(1)))
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (ord, id) => (-ord, id) }
    new GenericArrayData(sorted.map { case (ord, id) =>
      InternalRow(ord, id)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (ord, id) => bb.putDouble(ord); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType, nullable = false),
                   StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "topk_rows"
}

object TopK {
  import org.apache.spark.sql.functions._

  /** `topk(struct(ord, id), k)` aggregate column. */
  def topk(ord: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKRows(GraftBridge.expression(struct(ord.cast("double").as("ord"),
                                             id.cast("long").as("id"))),
               org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
