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
  * `struct(ord: double|long, id: long)`; output is the array of
  * winners, best first, with `ord` keeping the input's type. The LONG
  * ordinal mode exists for integer-exact scores (BM25's 6-decimal-
  * scaled contribution sums): a long ord compares with
  * `Long.compare`, never a double cast, so ranking stays exact past
  * 2^53 — the regime a 1e9-doc corpus's rare-term idf sums reach.
  *
  * `kExpr` must be an integer literal: keeping k as a *child* (rather
  * than a constructor scalar) makes the aggregate print as
  * `topk_rows(struct(…), k)`, so SqlGen round-trips it through the
  * registered SQL function — both ordinal modes share the one name
  * (the mode is the struct field's type, which the printed cast
  * preserves).
  */
case class TopKRows(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  val k: Int = kExpr match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"topk_rows: k must be an integer literal, got $other")
  }
  require(k >= 1, "k must be positive")

  // lazy: children are unresolved when the SQL registry constructs the
  // node; dataType is only legal to ask after analysis binds them
  private lazy val ordIsLong: Boolean =
    child.dataType.asInstanceOf[StructType].fields(0).dataType == LongType

  /** ONE total order for heap, eviction test, and final sort — best
    * first. Double mode: larger ord wins with `java.lang.Double
    * .compare` semantics (NaN ranks above every finite double, exactly
    * like Spark's DESC sort, so results cannot depend on which
    * partition a NaN row arrived from); the ord travels as raw bits
    * and is compared after `longBitsToDouble`. Long mode: plain
    * `Long.compare`, exact at any magnitude. Ties prefer the smaller
    * id in both modes. A primitive `>` here would silently drop or
    * keep NaN rows by arrival order.
    */
  private lazy val rankOrdering: Ordering[(Long, Long)] =
    if (ordIsLong)
      new Ordering[(Long, Long)] {
        def compare(a: (Long, Long), b: (Long, Long)): Int = {
          val c = java.lang.Long.compare(b._1, a._1) // desc by ord
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
    else
      new Ordering[(Long, Long)] {
        def compare(a: (Long, Long), b: (Long, Long)): Int = {
          val c = java.lang.Double.compare(
            java.lang.Double.longBitsToDouble(b._1),
            java.lang.Double.longBitsToDouble(a._1)) // desc by ord
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }

  // the priority queue dequeues its MAX per the given ordering; in
  // rankOrdering best-first means best = smallest, so the max (head)
  // is exactly the currently-worst kept row
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(rankOrdering)

  private def offer(buf: mutable.PriorityQueue[(Long, Long)], e: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (rankOrdering.compare(e, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(e)
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Long, Long)], input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    // null ord/id are skipped like every SQL aggregate skips nulls —
    // getDouble/getLong on a null slot would silently rank the row at 0
    if (row != null && !row.isNullAt(0) && !row.isNullAt(1)) {
      val ordBits = if (ordIsLong) row.getLong(0) else {
        val o = row.getDouble(0)
        // normalize -0.0 to 0.0: Spark compares them equal, Double
        // .compare does not — without this a -0.0/0.0 tie breaks
        // differently here than in the row_number() oracle
        java.lang.Double.doubleToLongBits(if (o == 0.0d) 0.0d else o)
      }
      offer(buf, (ordBits, row.getLong(1)))
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Long, Long)],
      b: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sorted(rankOrdering)
    new GenericArrayData(sorted.map { case (ordBits, id) =>
      val ord: Any =
        if (ordIsLong) ordBits else java.lang.Double.longBitsToDouble(ordBits)
      InternalRow(ord, id)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (ordBits, id) => bb.putLong(ordBits); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", if (ordIsLong) LongType else DoubleType,
        nullable = false),
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

  /** `topk(struct(ord, id), k)` aggregate column — double ordinal. */
  def topk(ord: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKRows(GraftBridge.expression(struct(ord.cast("double").as("ord"),
                                             id.cast("long").as("id"))),
               org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())

  /** Long-ordinal variant: ranking compares the raw longs, so scores
    * that are exact integers (scaled-long sums) rank exactly at any
    * magnitude — no 2^53 double-precision cliff.
    */
  def topkLong(ord: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKRows(GraftBridge.expression(struct(ord.cast("long").as("ord"),
                                             id.cast("long").as("id"))),
               org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
