package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k: `topk_pairs(value, payload, k)` keeps the k
  * largest (value, payload) pairs per group in a size-k min-heap —
  * O(n log k) per partition, k-sized partial state, associative merge.
  *
  * This is the scale-correct form of "top k rows per key": the window
  * alternative (`row_number() OVER (PARTITION BY key ORDER BY v DESC) <= k`)
  * sorts every group in full — O(n log n) and whole-group state — while
  * this aggregate's partial buffers are map-side-combined like any other
  * agg, so a 100 TB group never materializes anywhere. (Spark's global
  * TakeOrderedAndProject does the same trick for ungrouped LIMIT+ORDER;
  * this is the grouped version it lacks.)
  *
  * Ties order by payload (both components compared), so results are
  * deterministic for distinct payloads. Returns
  * `array<struct<v: double, id: long>>` sorted descending.
  */
case class TopKPairs(
    valueExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // natural: bigger (value, payload) = better. The queue dequeues its
  // maximum per its ordering, so a REVERSED ordering makes `head`/`dequeue`
  // the smallest retained pair — the eviction candidate of a min-heap.
  private val natural: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](natural.reverse)

  private def offer(
      buf: mutable.PriorityQueue[(Double, Long)],
      pair: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(pair)
    else if (natural.gt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = valueExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (v != null && p != null) offer(buf, (v.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(natural.reverse) // descending
    new GenericArrayData(sorted.map { case (v, p) =>
      new GenericInternalRow(Array[Any](v, p))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, p) => out.writeDouble(v); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(valueExpr, payloadExpr)
  override def prettyName: String = "topk_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(valueExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKAgg {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column API: `topkPairs($"price", $"orderkey", 3)` → sorted
    * `array<struct<v,id>>` of the k largest pairs per group. */
  def topkPairs(value: Column, payload: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKPairs(
        GraftColumnBridge.expression(value.cast("double")),
        GraftColumnBridge.expression(payload.cast("long")),
        k).toAggregateExpression())
}
